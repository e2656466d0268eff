"""scaffold / add-stage authoring verbs (reference: src/cli/
scaffold.rs, src/cli/add_stage.rs; its tests/cli_commands_test.rs
asserts scaffold output parses — ours additionally RUNS)."""

from __future__ import annotations

import pytest

from conveyor_spark.cli import main as cli_main
from conveyor_spark.config.spec import load_spec
from conveyor_spark.errors import ConfigError
from conveyor_spark.scaffold import add_stage, edit_stage, remove_stage, scaffold_pipeline


def test_scaffold_parses_and_runs(spark, tmp_path, capsys):
    out = tmp_path / "p.toml"
    paths = scaffold_pipeline(str(out))
    assert [p for p in paths if p.endswith(".toml")]
    spec = load_spec(str(out))
    assert spec.name == "my_pipeline" and len(spec.stages) == 3

    from conveyor_spark.compiler import run_pipeline

    result = run_pipeline(spark, spec)
    assert not result.errors
    captured = capsys.readouterr().out
    assert "Alice" in captured and "Bob" not in captured  # filter applied


def test_scaffold_refuses_overwrite(tmp_path):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out))
    with pytest.raises(ConfigError, match="--force"):
        scaffold_pipeline(str(out))
    scaffold_pipeline(str(out), name="other", force=True)
    assert load_spec(str(out)).name == "other"


def test_add_stage_appends_and_validates(tmp_path):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out))
    add_stage(str(out), "save", "json.write", ["filter_active"],
              [f"path={tmp_path}/out.jsonl", "format=jsonl"])
    spec = load_spec(str(out))
    ids = [s.id for s in spec.stages]
    assert ids[-1] == "save"
    save = spec.stage_map()["save"]
    assert save.function == "json.write" and save.config["format"] == "jsonl"


def test_add_stage_rejects_bad_append(tmp_path):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out))
    before = out.read_text()
    with pytest.raises(Exception):  # unknown function: registry error
        add_stage(str(out), "x", "nope.apply", [])
    assert out.read_text() == before
    with pytest.raises(Exception):  # duplicate id: spec validation, file restored
        add_stage(str(out), "load_data", "json.read", [])
    assert out.read_text() == before
    with pytest.raises(Exception):  # missing input stage
        add_stage(str(out), "y", "filter.apply", ["ghost"], ["column=a", "value=1"])
    assert out.read_text() == before


def test_add_stage_config_value_parsing(tmp_path):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out))
    add_stage(str(out), "lim", "limit.apply", ["filter_active"], ["n=5"])
    spec = load_spec(str(out))
    assert spec.stage_map()["lim"].config["n"] == 5  # JSON int, not "5"


def test_cli_verbs(tmp_path, capsys):
    out = tmp_path / "cli.toml"
    assert cli_main(["scaffold", str(out), "--name", "clidemo"]) == 0
    assert "wrote" in capsys.readouterr().out
    assert cli_main(["validate", str(out)]) == 0
    assert cli_main(["add-stage", str(out), "--id", "lim", "--function", "limit.apply",
                     "--input", "filter_active", "--config", "n=2"]) == 0
    assert cli_main(["validate", str(out)]) == 0
    assert cli_main(["scaffold", str(out)]) == 2  # refuses overwrite


def test_edit_stage_set_unset_and_function(tmp_path):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out), "editdemo")
    edit_stage(str(out), "filter_active", set_pairs=["value=inactive"])
    spec = load_spec(str(out))
    stage = spec.stage_map()["filter_active"]
    assert stage.config["value"] == "inactive"
    assert stage.config["column"] == "status"  # untouched keys survive

    edit_stage(str(out), "filter_active", unset_keys=["value", "column", "operator"],
               set_pairs=["expr=score > 70"], function="filter.apply")
    stage = load_spec(str(out)).stage_map()["filter_active"]
    assert stage.config == {"expr": "score > 70"}


def test_edit_stage_rejects_unknown(tmp_path):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out), "editdemo2")
    before = out.read_text()
    with pytest.raises(ConfigError):
        edit_stage(str(out), "nope", set_pairs=["a=1"])
    from conveyor_spark.errors import ConveyorError
    with pytest.raises(ConveyorError):
        edit_stage(str(out), "filter_active", function="not.a.function")
    # bad input rewiring (cycle) restores the original file
    with pytest.raises(Exception):
        edit_stage(str(out), "load_data", inputs=["print_results"])
    assert load_spec(str(out)).stage_map().keys() == load_spec(str(out)).stage_map().keys()
    assert "filter_active" in out.read_text()
    # the earlier successful state was never clobbered by failures
    assert out.read_text() == before


def test_remove_stage_guards_dependents(tmp_path):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out), "rmdemo")
    with pytest.raises(ConfigError):
        remove_stage(str(out), "filter_active")  # print_results consumes it
    edit_stage(str(out), "print_results", inputs=["load_data"])
    remove_stage(str(out), "filter_active")
    spec = load_spec(str(out))
    assert "filter_active" not in spec.stage_map()
    with pytest.raises(ConfigError):
        remove_stage(str(out), "filter_active")  # already gone


def test_cli_edit_remove_plugins(tmp_path, capsys):
    out = tmp_path / "p.toml"
    assert cli_main(["scaffold", str(out), "--name", "clidemo2"]) == 0
    capsys.readouterr()
    assert cli_main(["edit", str(out), "--id", "filter_active",
                     "--set", "value=inactive"]) == 0
    assert cli_main(["edit", str(out), "--id", "nope", "--set", "a=1"]) == 2
    assert cli_main(["remove-stage", str(out), "--id", "filter_active"]) == 2  # dependent
    assert cli_main(["edit", str(out), "--id", "print_results",
                     "--input", "load_data"]) == 0
    assert cli_main(["remove-stage", str(out), "--id", "filter_active"]) == 0
    assert cli_main(["validate", str(out)]) == 0
    assert cli_main(["plugins", str(out)]) == 0
    assert "no plugin modules" in capsys.readouterr().out


def test_cli_plugins_reports_registered_ops(tmp_path, capsys, monkeypatch):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out), "plugdemo")
    plug = tmp_path / "my_plug.py"
    plug.write_text(
        "from conveyor_spark.registry import register\n"
        "@register('my.noopx', kind='transform', doc='test plugin op')\n"
        "def noopx(ctx, inputs, config):\n"
        "    return inputs[0]\n"
    )
    monkeypatch.syspath_prepend(str(tmp_path))
    txt = out.read_text().replace(
        "[global]", "[global]\nplugins = [\"my_plug\"]", 1
    )
    out.write_text(txt)
    assert cli_main(["plugins", str(out)]) == 0
    got = capsys.readouterr().out
    assert "my_plug" in got and "my.noopx" in got


def test_cli_explain_and_build_only(tmp_path, capsys, spark):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out), "explaindemo")
    assert cli_main(["explain", str(out)]) == 0
    txt = capsys.readouterr().out
    assert "== stage filter_active ==" in txt
    assert "Physical Plan" in txt
    assert cli_main(["explain", str(out), "--stage", "load_data", "--mode", "simple"]) == 0
    assert "== stage load_data ==" in capsys.readouterr().out
    assert cli_main(["explain", str(out), "--stage", "nope"]) == 2

    # compile-only mode must NOT run sink actions
    from conveyor_spark.compiler import compile_pipeline
    from conveyor_spark.config.spec import load_spec

    result = compile_pipeline(spark, load_spec(str(out)), run_sinks=False)
    assert "print_results" in result.skipped
    assert "filter_active" in result.outputs and not result.errors


def test_add_stage_object_and_dotted_config(tmp_path):
    """Dict config values become inline tables (not Python reprs) and
    dotted keys are quoted (not silently nested)."""
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out))
    add_stage(str(out), "split", "split.assign", ["filter_active"],
              ["id_column=id", 'fractions={"train": 0.9, "test": 0.1}',
               'some.dotted.key=v'])
    spec = load_spec(str(out))
    cfg = spec.stage_map()["split"].config
    assert cfg["fractions"] == {"train": 0.9, "test": 0.1}
    assert cfg["some.dotted.key"] == "v"


def test_add_stage_rejects_null_config(tmp_path):
    out = tmp_path / "p.toml"
    scaffold_pipeline(str(out))
    before = out.read_text()
    with pytest.raises(Exception, match="null"):
        add_stage(str(out), "s2", "filter.apply", ["filter_active"],
                  ["column=null"])
    assert out.read_text() == before  # file untouched


def test_list_plugins_reports_ops_for_cached_modules(tmp_path):
    """import_module is a no-op for an already-imported plugin; the
    report must still attribute its registered ops."""
    import sys

    from conveyor_spark.scaffold import list_plugins

    plug = tmp_path / "cached_plug_mod.py"
    plug.write_text(
        "from conveyor_spark.registry import register, OpContext\n"
        "@register('cached.noop', kind='transform')\n"
        "def noop(ctx, inputs, config):\n"
        "    return inputs[0]\n"
    )
    sys.path.insert(0, str(tmp_path))
    try:
        import importlib
        importlib.import_module("cached_plug_mod")  # pre-cache it
        p = tmp_path / "p.toml"
        p.write_text(
            '[pipeline]\nname = "x"\n\n[global]\n'
            'plugins = ["cached_plug_mod"]\n\n'
            '[[stages]]\nid = "s"\nfunction = "cached.noop"\n'
        )
        report = dict(list_plugins(str(p)))
        assert report["cached_plug_mod"] == ["cached.noop"]
    finally:
        sys.path.remove(str(tmp_path))
        sys.modules.pop("cached_plug_mod", None)
        from conveyor_spark.registry import REGISTRY
        REGISTRY.pop("cached.noop", None)
