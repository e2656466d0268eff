"""Hypothesis fuzz of the spec parser/validator/config checker.

The round-6 jaccard max_inputs gap was a spec-surface bug found by
hand; this suite makes the machine hunt that class. Contract under
test: for ANY TOML-representable input (tomllib can only produce
str/int/float/bool/datetime/list/dict — so that is the fuzz space),
the spec layer either returns a PipelineSpec or raises ConveyorError.
A KeyError/TypeError/AttributeError escaping parse_spec is a bug:
`run` would show a stack trace instead of naming the bad key.

No SparkSession needed — everything here is driver-side metadata.
"""

from __future__ import annotations

import datetime

import pytest
from hypothesis import given, settings, strategies as st

from conveyor_spark.config.spec import (
    parse_spec,
    unresolved_template_refs,
    validate_spec,
)
from conveyor_spark.errors import ConveyorError
from conveyor_spark.registry import REGISTRY, _ensure_loaded, validate_config

_ensure_loaded()  # strategies sample from the full built-in registry

# ---------------------------------------------------------------- strategies

# exactly the leaf types tomllib can emit
toml_scalar = st.one_of(
    st.text(max_size=12),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.booleans(),
    st.datetimes(
        min_value=datetime.datetime(1990, 1, 1),
        max_value=datetime.datetime(2100, 1, 1),
    ),
)

toml_value = st.recursive(
    toml_scalar,
    lambda children: st.one_of(
        st.lists(children, max_size=3),
        st.dictionaries(st.text(max_size=8), children, max_size=3),
    ),
    max_leaves=10,
)

key_name = st.one_of(
    # plausible spec keys so the fuzzer spends its budget inside the
    # parser's branches, not on ignored unknown keys
    st.sampled_from(
        ["id", "function", "inputs", "config", "error_strategy",
         "variables", "plugins", "timeout_seconds", "error_handling",
         "name", "version", "description"]
    ),
    st.text(max_size=8),
)

stage_like = st.dictionaries(key_name, toml_value, max_size=5)

spec_like = st.fixed_dictionaries(
    {},
    optional={
        "pipeline": toml_value,
        "global": toml_value,
        "stages": st.one_of(toml_value, st.lists(stage_like, max_size=4)),
        "error_handling": toml_value,
    },
)

ident = st.text(
    alphabet="abcdefgh_", min_size=1, max_size=6
)


@st.composite
def valid_dags(draw):
    """Structurally valid specs: unique ids, inputs only reference
    EARLIER stages (acyclic by construction), registered functions."""
    n = draw(st.integers(min_value=1, max_value=6))
    ids = [f"s{i}_{draw(ident)}" for i in range(n)]
    fns = sorted(REGISTRY)
    stages = []
    for i, sid in enumerate(ids):
        n_inputs = draw(st.integers(min_value=0, max_value=min(i, 2)))
        inputs = draw(
            st.lists(
                st.sampled_from(ids[:i]) if i else st.nothing(),
                min_size=n_inputs, max_size=n_inputs, unique=True,
            )
        ) if n_inputs else []
        stages.append({
            "id": sid,
            "function": draw(st.sampled_from(fns)),
            "inputs": inputs,
            "config": draw(
                st.dictionaries(st.text(max_size=6), toml_scalar, max_size=3)
            ),
        })
    return {"pipeline": {"name": draw(ident)}, "stages": stages}


# ------------------------------------------------------------------- parser


@settings(max_examples=300, deadline=None)
@given(spec_like)
def test_parse_spec_never_crashes_ungracefully(data):
    try:
        spec = parse_spec(data, env={})
    except ConveyorError:
        return
    # success: the spec must be internally consistent
    assert spec.stages
    validate_spec(spec)


@settings(max_examples=150, deadline=None)
@given(valid_dags())
def test_valid_dags_always_parse(data):
    spec = parse_spec(data, env={})
    assert [s.id for s in spec.stages] == [s["id"] for s in data["stages"]]
    order = spec.topo_order()
    pos = {sid: i for i, sid in enumerate(order)}
    for s in spec.stages:
        for inp in s.inputs:
            assert pos[inp] < pos[s.id], "topo order violates an edge"


@settings(max_examples=150, deadline=None)
@given(valid_dags(), st.data())
def test_single_defect_always_rejected(data, rng):
    """Inject exactly one structural defect into a valid spec; the
    parser must refuse with ConveyorError (never accept, never
    crash with anything else)."""
    stages = data["stages"]
    defect = rng.draw(st.sampled_from(
        ["dup_id", "unknown_input", "cycle", "drop_function", "empty",
         "bad_inputs_type", "bad_stages_type", "bad_timeout",
         "falsy_config", "falsy_error_handling"]
    ))
    if defect == "dup_id" and len(stages) >= 2:
        stages[-1]["id"] = stages[0]["id"]
    elif defect == "unknown_input":
        stages[-1]["inputs"] = ["__nonexistent__"]
    elif defect == "cycle" and len(stages) >= 2:
        # close a back-edge: first stage consumes the last
        stages[0]["inputs"] = [stages[-1]["id"]]
        stages[-1]["inputs"] = list(
            set(stages[-1]["inputs"]) | {stages[0]["id"]}
        ) or [stages[0]["id"]]
    elif defect == "drop_function":
        del stages[-1]["function"]
    elif defect == "empty":
        data["stages"] = []
    elif defect == "bad_inputs_type":
        stages[-1]["inputs"] = rng.draw(
            st.one_of(st.integers(), st.booleans(),
                      st.lists(st.integers(), min_size=1, max_size=2))
        )
    elif defect == "bad_stages_type":
        data["stages"] = rng.draw(
            st.one_of(st.integers(), st.text(max_size=5), st.booleans())
        )
    elif defect == "falsy_config":
        # present-but-falsy wrong types must die, not default to {}
        stages[-1]["config"] = rng.draw(
            st.sampled_from([False, 0, "", 0.0]))
    elif defect == "falsy_error_handling":
        data["error_handling"] = rng.draw(
            st.sampled_from([False, 0, "", True, 7]))
    elif defect == "bad_timeout":
        data["global"] = {"timeout_seconds": rng.draw(
            st.one_of(st.just(0), st.integers(max_value=0), st.text(max_size=4),
                      st.booleans())
        )}
    else:
        return  # defect not injectable at this size
    with pytest.raises(ConveyorError):
        parse_spec(data, env={})


@settings(max_examples=100, deadline=None)
@given(spec_like)
def test_env_resolution_graceful(data):
    """With a nonempty env, ${VAR} in variables either resolves or
    raises ConveyorError (unset name) — nothing else."""
    try:
        parse_spec(data, env={"HOME": "/home/x", "A": "1"})
    except ConveyorError:
        pass


# ----------------------------------------------------- template-ref scanner


@settings(max_examples=100, deadline=None)
@given(valid_dags(), st.data())
def test_unresolved_template_refs_graceful(data, rng):
    """Scatter {{holes}} (typo'd and declared) through stage configs;
    the scanner must return (stage, fn, name) triples, never raise."""
    for s in data["stages"]:
        key = rng.draw(st.text(max_size=5))
        s["config"][key] = rng.draw(st.sampled_from(
            ["{{ missing }}", "x{{hole}}y", "{{a}}{{b}}", "plain", "{{}}"]
        ))
    spec = parse_spec(data, env={})
    refs = unresolved_template_refs(spec)
    known_ids = {s.id for s in spec.stages}
    for sid, fn, name in refs:
        assert sid in known_ids
        assert isinstance(fn, str) and isinstance(name, str) and name


# ------------------------------------------------------- config validation


@settings(max_examples=200, deadline=None)
@given(st.data())
def test_validate_config_never_raises(rng):
    """validate_config over every registered op with adversarial
    configs: declared keys with wrong-typed values, unknown keys,
    missing requireds. Must always return a list of strings."""
    name = rng.draw(st.sampled_from(sorted(REGISTRY)))
    op = REGISTRY[name]
    declared = [p.name for p in (op.params or ())]
    keys = st.one_of(st.sampled_from(declared), st.text(max_size=8)) \
        if declared else st.text(max_size=8)
    config = rng.draw(st.dictionaries(keys, toml_value, max_size=5))
    warnings = validate_config(op, config)
    assert isinstance(warnings, list)
    assert all(isinstance(w, str) for w in warnings)


@settings(max_examples=60, deadline=None)
@given(st.data())
def test_validate_config_clean_on_example(rng):
    """Every op's registered example config passes its own metadata
    check (the examples-execute suite runs them; this pins the
    metadata side under fuzz-chosen ops)."""
    name = rng.draw(st.sampled_from(
        sorted(n for n, o in REGISTRY.items() if o.example)
    ))
    op = REGISTRY[name]
    warnings = validate_config(op, dict(op.example))
    assert warnings == [], f"{name} example fails own metadata: {warnings}"
