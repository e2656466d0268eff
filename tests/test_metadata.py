"""Structured stage metadata (reference parity: docs/metadata-system.md
+ Commands::Info / cli::show_function_help in src/main.rs).

Every registry entry must declare parameter metadata; the `info` and
`describe` verbs render it; OPERATORS.md generates from it; `validate`
uses it for config warnings.
"""

from __future__ import annotations

import json

import pytest

from conveyor_spark.metadata import describe_json, generate_operators_md, render_info
from conveyor_spark.registry import REGISTRY, P, _ensure_loaded, get_function, validate_config

_VALID_TYPES = {"string", "integer", "float", "boolean", "array", "object", "any"}


@pytest.fixture(scope="module", autouse=True)
def _loaded():
    _ensure_loaded()


def _first_party():
    """Registry minus ops registered by test plugin modules (other
    tests in the session load plugins that add entries without
    metadata — those are user code, not our surface)."""
    return {
        n: op for n, op in REGISTRY.items()
        if (op.fn.__module__ or "").startswith("conveyor_spark")
    }


def test_every_op_declares_params():
    missing = [n for n, op in _first_party().items() if op.params is None]
    assert not missing, f"ops without parameter metadata: {missing}"


def test_param_fields_are_well_formed():
    for name, op in _first_party().items():
        seen = set()
        for p in op.params:
            assert p.name and p.name not in seen, f"{name}: dup/empty param {p.name!r}"
            seen.add(p.name)
            assert p.type in _VALID_TYPES, f"{name}.{p.name}: bad type {p.type!r}"
            assert p.desc, f"{name}.{p.name}: missing description"
            if p.required:
                assert p.default is None, f"{name}.{p.name}: required with default"


def test_every_op_has_doc_and_most_have_examples():
    ops = _first_party()
    for name, op in ops.items():
        assert op.doc, f"{name}: missing doc"
    with_params = [op for op in ops.values() if op.params]
    no_example = [op.name for op in with_params if not op.example]
    assert not no_example, f"ops with params but no example config: {no_example}"


def test_example_configs_pass_their_own_validation():
    """The example shown in `info` must not trigger the validator."""
    for name, op in _first_party().items():
        if not op.example:
            continue
        warnings = validate_config(op, dict(op.example))
        # examples may omit optional params but must not use unknown
        # keys or disallowed values
        bad = [w for w in warnings if not w.startswith("missing required")]
        assert not bad, f"{name}: example config invalid: {bad}"
        missing = [w for w in warnings if w.startswith("missing required")]
        assert not missing, f"{name}: example omits required params: {missing}"


def test_render_info_sections():
    """info output carries the reference's documented fields
    (docs/builtin-functions.md shapes: name, category, description,
    required/optional params with types + defaults + allowed values)."""
    out = render_info("csv.read")
    assert "Function: csv.read" in out
    assert "Category: source" in out
    assert "PARAMETERS:" in out
    assert "Required:" in out and "Optional:" in out
    assert "path (string)" in out
    assert "[default:" in out
    out2 = render_info("json.read")
    assert "Allowed values: records, jsonl, dataframe" in out2
    out3 = render_info("filter.apply")
    assert "EXAMPLE:" in out3


def test_describe_json_shape():
    d = describe_json("join.apply")
    assert d["name"] == "join.apply"
    assert d["category"] == "transform"
    assert d["min_inputs"] == 2 and d["max_inputs"] == 2
    names = {p["name"] for p in d["parameters"]}
    assert {"on", "how", "broadcast"} <= names
    how = next(p for p in d["parameters"] if p["name"] == "how")
    assert how["default"] == "inner"
    assert "inner" in how["allowed_values"]
    json.dumps(d)  # serializable


def test_unknown_function_raises():
    from conveyor_spark.errors import FunctionNotFound

    with pytest.raises(FunctionNotFound):
        render_info("no.such.op")


def test_validate_config_warnings():
    op = get_function("json.read")
    assert validate_config(op, {"path": "x"}) == []
    w = validate_config(op, {"path": "x", "formt": "records"})
    assert any("unknown parameter 'formt'" in x for x in w)
    w = validate_config(op, {"format": "records"})
    assert any("missing required parameter 'path'" in x for x in w)
    w = validate_config(op, {"path": "x", "format": "xml"})
    assert any("not in allowed values" in x for x in w)
    op2 = get_function("approx.count_distinct")
    w = validate_config(op2, {"column": "c", "rsd": 5.0})
    assert any("> max" in x for x in w)
    # underscore test hooks never warn
    assert validate_config(op, {"path": "x", "_hook": 1}) == []


def test_generate_operators_md():
    md = generate_operators_md()
    assert f"{len(REGISTRY)} registered functions" in md
    assert "### `csv.read`" in md
    assert "### `dedup.minhash`" in md
    assert "| parameter | type | required | default | description |" in md


def test_P_helper_normalizes():
    p = P("x", allowed=["a", "b"])
    assert p.allowed == ("a", "b")


def test_ops_reading_second_input_declare_it():
    """An op whose body reads inputs[1] (or branches on a second
    input) must register max_inputs >= 2 — run_op bypasses the
    compiler's arity check, so only this scan catches the mismatch
    before a real pipeline TOML does (dedup.ngram_jaccard shipped
    broken this way)."""
    import inspect

    from conveyor_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    gaps = []
    for name, op in sorted(REGISTRY.items()):
        if not op.fn.__module__.startswith("conveyor_spark"):
            continue
        try:
            src = inspect.getsource(op.fn)
        except (OSError, TypeError):
            continue
        uses_second = "inputs[1]" in src or "len(inputs) > 1" in src
        if uses_second and op.max_inputs is not None and op.max_inputs < 2:
            gaps.append(name)
    assert not gaps, f"ops reading a second input but declaring max_inputs<2: {gaps}"
