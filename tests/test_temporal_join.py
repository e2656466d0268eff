"""Tests for join.asof / join.range (transforms/temporal_join.py)
and the groupby.apply rollup/cube extension."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


@pytest.fixture(scope="module")
def probe(spark):
    return spark.createDataFrame(
        [(1, 10, "p1"), (1, 20, "p2"), (2, 7, "p3"), (3, 5, "p4")], ["k", "t", "pv"]
    )


@pytest.fixture(scope="module")
def build(spark):
    return spark.createDataFrame(
        [(1, 5, "x"), (1, 15, "y"), (1, 20, "z"), (2, 9, "w")], ["k", "t", "bv"]
    )


def _rows(df):
    return {tuple(r) for r in df.collect()}


# -- join.asof --------------------------------------------------------------

def test_asof_backward_left(ctx, probe, build):
    out = run_op(ctx, "join.asof", [probe, build], on="t", by="k")
    assert _rows(out.select("k", "t", "r_t", "r_bv")) == {
        (1, 10, 5, "x"), (1, 20, 20, "z"),  # equal ts matches (<=)
        (2, 7, None, None), (3, 5, None, None),
    }


def test_asof_forward_inner(ctx, probe, build):
    out = run_op(ctx, "join.asof", [probe, build], on="t", by="k",
                 direction="forward", how="inner")
    assert _rows(out.select("k", "t", "r_t")) == {(1, 10, 15), (1, 20, 20), (2, 7, 9)}


def test_asof_tolerance_nulls_far_matches(ctx, probe, build):
    out = run_op(ctx, "join.asof", [probe, build], on="t", by="k", tolerance=4)
    got = {(r["k"], r["t"]): r["r_t"] for r in out.collect()}
    assert got[(1, 10)] is None  # nearest prior is 5, gap 5 > 4
    assert got[(1, 20)] == 20


def test_asof_requires_key_or_optin(ctx, probe, build):
    with pytest.raises(ConfigError):
        run_op(ctx, "join.asof", [probe, build], on="t")
    out = run_op(ctx, "join.asof", [probe, build], on="t",
                 allow_unpartitioned=True, how="inner")
    assert out.count() > 0  # keyless works when acknowledged


def test_asof_single_shuffle_partitioned_window(ctx, probe, build):
    """Plan shape: exactly one Exchange for the window (hashpartitioning
    by key) on top of the union — no join operator at all."""
    out = run_op(ctx, "join.asof", [probe, build], on="t", by="k")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan
    assert plan.count("Exchange hashpartitioning") == 1


# -- join.range -------------------------------------------------------------

@pytest.fixture(scope="module")
def pts(spark):
    return spark.createDataFrame([(1, 10), (1, 25), (2, 10)], ["k", "v"])


@pytest.fixture(scope="module")
def iv(spark):
    return spark.createDataFrame(
        [(1, 5, 15, "a"), (1, 20, 30, "b"), (2, 50, 60, "c")], ["k", "lo", "hi", "tag"]
    )


def test_range_bucketed_inner(ctx, pts, iv):
    out = run_op(ctx, "join.range", [pts, iv], on="v", lower="lo", upper="hi",
                 by="k", bucket=7)
    assert _rows(out.select("k", "v", "r_tag")) == {(1, 10, "a"), (1, 25, "b")}
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "NestedLoop" not in plan  # bucket strategy = equi join


def test_range_bucketed_left(ctx, pts, iv):
    out = run_op(ctx, "join.range", [pts, iv], on="v", lower="lo", upper="hi",
                 by="k", bucket=7, how="left")
    assert _rows(out.select("k", "v", "r_tag")) == {
        (1, 10, "a"), (1, 25, "b"), (2, 10, None),
    }


def test_range_bounds_inclusive(ctx, spark):
    p = spark.createDataFrame([(1, 15)], ["k", "v"])
    i = spark.createDataFrame([(1, 5, 15, "a")], ["k", "lo", "hi", "tag"])
    halfopen = run_op(ctx, "join.range", [p, i], on="v", lower="lo", upper="hi",
                      by="k", bucket=7)
    assert halfopen.count() == 0  # default "[)" excludes hi
    closed = run_op(ctx, "join.range", [p, i], on="v", lower="lo", upper="hi",
                    by="k", bucket=7, bounds="[]")
    assert closed.count() == 1


def test_range_broadcast_requires_optin_when_keyless(ctx, pts, iv):
    with pytest.raises(ConfigError):
        run_op(ctx, "join.range", [pts, iv], on="v", lower="lo", upper="hi")
    out = run_op(ctx, "join.range", [pts, iv], on="v", lower="lo", upper="hi",
                 allow_broadcast=True)
    # keyless: (2,10) also falls in k=1's [5,15) interval
    assert _rows(out.select("k", "v", "r_tag")) == {
        (1, 10, "a"), (1, 25, "b"), (2, 10, "a"),
    }


# -- groupby rollup/cube ----------------------------------------------------

def test_groupby_rollup_levels(ctx, spark):
    df = spark.createDataFrame(
        [("a", "x", 1), ("a", "y", 2), ("b", "x", 4)], ["g1", "g2", "n"]
    )
    out = run_op(ctx, "groupby.apply", [df], by=["g1", "g2"], grouping="rollup",
                 aggregations=[{"column": "n", "operation": "sum", "output_column": "s"}])
    got = {(r["g1"], r["g2"]): r["s"] for r in out.collect()}
    assert got[("a", "x")] == 1 and got[("a", None)] == 3 and got[(None, None)] == 7
    assert len(got) == 6  # 3 leaves + 2 subtotals + grand total

    cube = run_op(ctx, "groupby.apply", [df], by=["g1", "g2"], grouping="cube",
                  aggregations=[{"column": "n", "operation": "sum", "output_column": "s"}])
    cgot = {(r["g1"], r["g2"]): r["s"] for r in cube.collect()}
    assert cgot[(None, "x")] == 5  # cube adds the g2-only slices


def test_groupby_rejects_bad_grouping(ctx, spark):
    df = spark.createDataFrame([("a", 1)], ["g", "n"])
    with pytest.raises(ConfigError):
        run_op(ctx, "groupby.apply", [df], by="g", grouping="slice",
               aggregations=[{"column": "n", "operation": "sum"}])


# -- property tests vs reference implementations ----------------------------

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

_ROWS = st.lists(
    st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=1, max_size=25
)


@given(probe_rows=_ROWS, build_rows=_ROWS)
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_asof_matches_pandas_merge_asof(ctx, spark, probe_rows, build_rows):
    """join.asof backward == pandas.merge_asof per key on random data
    (build rows deduped on (k,t) — with equal-time duplicates both
    engines tie-break arbitrarily, which is documented)."""
    import pandas as pd

    build_rows = list({(k, t): (k, t) for k, t in build_rows}.values())
    probe = spark.createDataFrame([(k, t, i) for i, (k, t) in enumerate(probe_rows)],
                                  ["k", "t", "pid"])
    build = spark.createDataFrame([(k, t, 100 + i) for i, (k, t) in enumerate(build_rows)],
                                  ["k", "t", "bid"])
    out = run_op(ctx, "join.asof", [probe, build], on="t", by="k")
    got = {r["pid"]: r["r_bid"] for r in out.collect()}

    pl = pd.DataFrame([(k, t, i) for i, (k, t) in enumerate(probe_rows)],
                      columns=["k", "t", "pid"]).sort_values("t", kind="stable")
    pr = pd.DataFrame([(k, t, 100 + i) for i, (k, t) in enumerate(build_rows)],
                      columns=["k", "t", "bid"]).sort_values("t", kind="stable")
    ref = pd.merge_asof(pl, pr, on="t", by="k", direction="backward")
    want = {int(r.pid): (None if pd.isna(r.bid) else int(r.bid))
            for r in ref.itertuples()}
    assert got == want


@given(pts_rows=_ROWS,
       iv_rows=st.lists(st.tuples(st.integers(0, 3), st.integers(0, 50),
                                  st.integers(0, 20)), min_size=1, max_size=15))
@settings(max_examples=20, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
def test_range_matches_bruteforce(ctx, spark, pts_rows, iv_rows):
    """join.range bucketed == brute-force point-in-interval filter."""
    pts = spark.createDataFrame([(k, v, i) for i, (k, v) in enumerate(pts_rows)],
                                ["k", "v", "pid"])
    iv = spark.createDataFrame(
        [(k, lo, lo + w, 100 + i) for i, (k, lo, w) in enumerate(iv_rows)],
        ["k", "lo", "hi", "iid"],
    )
    out = run_op(ctx, "join.range", [pts, iv], on="v", lower="lo", upper="hi",
                 by="k", bucket=7)
    got = {(r["pid"], r["r_iid"]) for r in out.collect()}
    want = {
        (i, 100 + j)
        for i, (k, v) in enumerate(pts_rows)
        for j, (ik, lo, w) in enumerate(iv_rows)
        if k == ik and lo <= v < lo + w
    }
    assert got == want
