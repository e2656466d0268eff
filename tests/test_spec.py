"""Pipeline spec parsing/validation (reference: src/core/config.rs tests)."""

from __future__ import annotations

import pytest

from conveyor_spark.config.spec import load_spec, parse_spec
from conveyor_spark.errors import ConfigError


def _spec(stages, variables=None):
    return {
        "pipeline": {"name": "t"},
        "global": {"variables": variables or {}},
        "stages": stages,
    }


def test_parse_minimal():
    spec = parse_spec(_spec([{"id": "a", "function": "csv.read", "config": {"path": "x"}}]))
    assert spec.stages[0].id == "a"
    assert spec.topo_order() == ["a"]


def test_duplicate_ids_rejected():
    with pytest.raises(ConfigError, match="duplicate"):
        parse_spec(_spec([
            {"id": "a", "function": "csv.read"},
            {"id": "a", "function": "csv.read"},
        ]))


def test_unknown_input_rejected():
    with pytest.raises(ConfigError, match="unknown input"):
        parse_spec(_spec([{"id": "a", "function": "f", "inputs": ["nope"]}]))


def test_cycle_rejected():
    # reference: dag cycle detection test (dag_pipeline_test.rs:149-182)
    with pytest.raises(ConfigError, match="cycle"):
        parse_spec(_spec([
            {"id": "a", "function": "f", "inputs": ["b"]},
            {"id": "b", "function": "f", "inputs": ["a"]},
        ]))


def test_empty_pipeline_rejected():
    with pytest.raises(ConfigError, match="at least one"):
        parse_spec(_spec([]))


def test_variable_interpolation():
    spec = parse_spec(_spec(
        [{"id": "a", "function": "csv.read", "config": {"path": "{{ base }}/f.csv"}}],
        variables={"base": "/data"},
    ))
    assert spec.stages[0].config["path"] == "/data/f.csv"


def test_undefined_variable_left_for_row_templating():
    # {{ x }} not in [global].variables is a per-row Handlebars
    # template (http.fetch urls, mongodb queries) — it must survive
    # spec parsing untouched, not raise
    spec = parse_spec(
        _spec([{"id": "a", "function": "f", "config": {"p": "u/{{ user_id }}"}}])
    )
    assert spec.stages[0].config["p"] == "u/{{ user_id }}"


def test_env_resolution(monkeypatch):
    data = _spec(
        [{"id": "a", "function": "f", "config": {"p": "{{ home }}"}}],
        variables={"home": "${CONVEYOR_TEST_HOME}"},
    )
    spec = parse_spec(data, env={"CONVEYOR_TEST_HOME": "/h"})
    assert spec.stages[0].config["p"] == "/h"
    with pytest.raises(ConfigError, match="not set"):
        parse_spec(data, env={})


def test_load_toml(tmp_path):
    p = tmp_path / "p.toml"
    p.write_text(
        """
[pipeline]
name = "demo"

[[stages]]
id = "src"
function = "csv.read"
[stages.config]
path = "/tmp/in.csv"

[[stages]]
id = "out"
function = "stdout.write"
inputs = ["src"]
"""
    )
    spec = load_spec(str(p))
    assert [s.id for s in spec.stages] == ["src", "out"]
    assert spec.name == "demo"
