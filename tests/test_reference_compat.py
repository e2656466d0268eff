"""A pipeline written against the REFERENCE's documented config keys
(docs/builtin-functions.md) must run unchanged here — drop-in parity:
csv has_headers, sort by/per-column descending, distinct subset,
validate.schema unique, aggregate.stream column, file.watch
poll_interval_ms, stdin.read json default."""

from __future__ import annotations

import io

from tests.conftest import run_op


def test_csv_has_headers_alias(ctx, tmp_path):
    f = tmp_path / "in.csv"
    f.write_text("id;name\n1;a\n2;b\n")
    df = run_op(ctx, "csv.read", [], path=str(f), has_headers=True, delimiter=";")
    assert df.columns == ["id", "name"] and df.count() == 2
    out = tmp_path / "out.csv"
    run_op(ctx, "csv.write", [df], path=str(out), has_headers=False, delimiter=";")
    assert out.read_text().splitlines()[0].startswith(("1;", "2;"))


def test_sort_by_alias_with_per_column_descending(ctx, spark):
    df = spark.createDataFrame(
        [("a", 3), ("b", 1), ("a", 1), ("b", 2)], "cat string, price int"
    )
    out = run_op(ctx, "sort.apply", [df], by=["cat", "price"], descending=[False, True])
    assert [(r["cat"], r["price"]) for r in out.collect()] == [
        ("a", 3), ("a", 1), ("b", 2), ("b", 1)
    ]


def test_distinct_subset_alias(ctx, spark):
    df = spark.createDataFrame([("x", 1), ("x", 2), ("y", 3)], "email string, n int")
    out = run_op(ctx, "distinct.apply", [df], subset=["email"])
    assert out.select("email").distinct().count() == 2
    assert out.count() == 2


def test_validate_unique_alias(ctx, spark):
    import pytest

    from conveyor_spark.errors import ValidationError

    df = spark.createDataFrame([(1,), (1,)], "id int")
    with pytest.raises(ValidationError, match="duplicate"):
        run_op(ctx, "validate.schema", [df], unique=["id"]).collect()


def test_aggregate_stream_column_alias(ctx, spark):
    df = spark.createDataFrame([("a", 2.0), ("a", 3.0)], "k string, v double")
    out = run_op(ctx, "aggregate.stream", [df], operation="sum",
                 column="v", group_by=["k"])
    assert out.collect()[0]["sum_v"] == 5.0


def test_stdin_default_is_json_array(ctx):
    out = run_op(ctx, "stdin.read", [], _text='[{"x": 1}, {"x": 2}]')
    assert out.count() == 2


import os

import pytest

_REF = "/root/reference/examples"


@pytest.mark.skipif(not os.path.isdir(_REF), reason="reference repo not mounted")
def test_reference_examples_run_verbatim(tmp_path):
    """The reference's own examples/dag-pipeline-example.toml and
    simple_pipeline.toml run UNCHANGED — same stages, config keys,
    [global]/[error_handling] sections, relative data paths — the
    drop-in-replacement proof. Runs via subprocess because the spec's
    relative paths resolve against the process working directory
    (same as the reference CLI)."""
    import json
    import shutil
    import subprocess
    import sys

    (tmp_path / "data").mkdir()
    shutil.copy(f"{_REF}/users.json", tmp_path / "data" / "users.json")
    (tmp_path / "data" / "sales.csv").write_text(
        "id,date,amount,customer_id\n"
        "1,2024-01-01,1500.0,10\n2,2024-01-02,800.0,11\n3,2024-01-03,2000.0,12\n"
    )
    (tmp_path / "examples").mkdir()
    shutil.copy(f"{_REF}/users-sensitive.json", tmp_path / "examples" / "users-sensitive.json")
    shutil.copy(f"{_REF}/dag-pipeline-example.toml", tmp_path / "dag.toml")
    shutil.copy(f"{_REF}/simple_pipeline.toml", tmp_path / "simple.toml")
    shutil.copy(f"{_REF}/function-based-pipeline.toml", tmp_path / "fn.toml")
    shutil.copy(f"{_REF}/encryption-example.toml", tmp_path / "enc.toml")
    shutil.copy(f"{_REF}/encryption-algorithms-example.toml", tmp_path / "encalgos.toml")
    env = {**os.environ, "PYTHONPATH": "/root/repo", "SPARK_GRAFT_CPUS": "8"}
    outputs = {}
    for spec in ("dag.toml", "simple.toml", "fn.toml", "enc.toml", "encalgos.toml"):
        proc = subprocess.run(
            [sys.executable, "-m", "conveyor_spark", "run", spec],
            cwd=tmp_path, env=env, capture_output=True, text=True, timeout=300,
        )
        assert proc.returncode == 0, f"{spec}: {proc.stderr[-2000:]}"
        outputs[spec] = proc.stdout

    out = json.loads((tmp_path / "output" / "active_users.json").read_text())
    src = json.loads((tmp_path / "data" / "users.json").read_text())
    assert out == [u for u in src if u["status"] == "active"]

    rows = json.loads((tmp_path / "output" / "processed_sales.json").read_text())
    assert [r["id"] for r in rows] == [1, 3]  # amount >= 1000 only
    assert rows[0]["amount_with_tax"] == pytest.approx(1650.0)
    assert (tmp_path / "output" / "high_value_sales.csv").read_text().startswith("id,")

    # encryption example: encrypt -> decrypt roundtrip printed as table
    assert "email_decrypted" in outputs["enc.toml"]


def test_file_watch_poll_interval_ms(ctx, tmp_path):
    # reemit path validates the knob parse without starting the poller
    f = tmp_path / "w.json"
    f.write_text('{"x": 1}\n')
    df = run_op(ctx, "file.watch", [], path=str(f), format="jsonl",
                schema="x INT", reemit_on_modify=True, poll_interval_ms=50,
                _no_poller_thread=True)
    assert df.isStreaming
