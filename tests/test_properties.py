"""Property-based tests (hypothesis) — spec parsing invariants and
the map.apply reference-grammar semantics. The reference has no
randomized testing at all (SURVEY §5); these harden the layers that
parse user input."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from conveyor_spark.config.spec import parse_spec  # noqa: E402
from conveyor_spark.errors import ConfigError  # noqa: E402

IDENT = st.from_regex(r"[A-Za-z_][A-Za-z0-9_]{0,10}", fullmatch=True)


@given(ids=st.lists(IDENT, min_size=1, max_size=8, unique=True), data=st.data())
@settings(max_examples=50, deadline=None)
def test_linear_pipelines_always_parse_and_topo_sort(ids, data):
    stages = []
    for i, sid in enumerate(ids):
        inputs = [ids[i - 1]] if i > 0 else []
        stages.append({"id": sid, "function": "filter.apply", "inputs": inputs})
    spec = parse_spec({"pipeline": {"name": "p"}, "stages": stages})
    order = spec.topo_order()
    assert order == ids  # linear chain must sort in chain order
    assert len(set(order)) == len(ids)


@given(ids=st.lists(IDENT, min_size=2, max_size=6, unique=True))
@settings(max_examples=30, deadline=None)
def test_any_cycle_is_rejected(ids):
    # ring: each stage depends on the previous, first depends on last
    stages = [
        {"id": sid, "function": "f", "inputs": [ids[i - 1]]}
        for i, sid in enumerate(ids)
    ]
    with pytest.raises(ConfigError, match="cycle"):
        parse_spec({"pipeline": {"name": "p"}, "stages": stages})


@given(
    var=IDENT,
    value=st.text(
        alphabet=st.characters(blacklist_characters="{}$", blacklist_categories=("Cs",)),
        max_size=30,
    ),
)
@settings(max_examples=50, deadline=None)
def test_interpolation_roundtrip(var, value):
    spec = parse_spec(
        {
            "pipeline": {"name": "p"},
            "global": {"variables": {var: value}},
            "stages": [
                {"id": "s", "function": "f", "config": {"p": f"pre {{{{ {var} }}}} post"}}
            ],
        }
    )
    assert spec.stages[0].config["p"] == f"pre {value} post"


@pytest.mark.usefixtures("spark")
class TestMapGrammar:
    """The reference's toy `col OP const` grammar coerces to double
    (map.rs:129-227) — property: Spark result equals Python float op."""

    @given(
        vals=st.lists(
            st.integers(min_value=-10**6, max_value=10**6), min_size=1, max_size=5
        ),
        const=st.integers(min_value=1, max_value=999),
        op=st.sampled_from(["+", "-", "*", "/"]),
    )
    @settings(max_examples=15, deadline=None, suppress_health_check=list(HealthCheck))
    def test_arith_matches_python(self, spark, ctx, vals, const, op):
        from tests.conftest import run_op

        df = spark.createDataFrame([(v,) for v in vals], "x BIGINT")
        out = run_op(ctx, "map.apply", [df], expression=f"x {op} {const}", output_column="y")
        got = {r["x"]: r["y"] for r in out.collect()}
        for v in vals:
            expect = {"+": v + const, "-": v - const, "*": v * const, "/": v / const}[op]
            assert got[v] == pytest.approx(float(expect))
            assert isinstance(got[v], float)  # reference Float64 coercion
