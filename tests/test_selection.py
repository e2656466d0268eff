"""Tests for the selection/diagnostics ops (datapipe/selection.py):
topk.apply, sample.weighted, skew.analyze."""

from __future__ import annotations

import math

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


@pytest.fixture(scope="module")
def scored(spark):
    # (id, grp, score): grp 'a' has 6 rows incl. a score tie, 'b' has 2
    rows = [
        (1, "a", 10), (2, "a", 30), (3, "a", 30), (4, "a", 5),
        (5, "a", 50), (6, "a", 1), (7, "b", 7), (8, "b", 9),
    ]
    return spark.createDataFrame(rows, ["id", "grp", "score"])


# -- topk.apply -------------------------------------------------------------

def test_topk_basic(ctx, scored):
    out = run_op(ctx, "topk.apply", [scored], by="grp", k=3,
                 order_by=[{"column": "score", "direction": "desc"},
                           {"column": "id", "direction": "asc"}]).collect()
    got = sorted((r["grp"], r["id"]) for r in out)
    assert got == [("a", 2), ("a", 3), ("a", 5), ("b", 7), ("b", 8)]


def test_topk_salted_matches_plain(ctx, scored):
    plain = run_op(ctx, "topk.apply", [scored], by="grp", k=2,
                   order_by=[{"column": "score", "direction": "desc"},
                             {"column": "id", "direction": "asc"}]).collect()
    salted = run_op(ctx, "topk.apply", [scored], by="grp", k=2, salt=4,
                    order_by=[{"column": "score", "direction": "desc"},
                              {"column": "id", "direction": "asc"}]).collect()
    assert sorted(map(tuple, plain)) == sorted(map(tuple, salted))


def test_topk_rank_column(ctx, scored):
    out = run_op(ctx, "topk.apply", [scored], by="grp", k=1, rank_column="rk",
                 order_by=[{"column": "score", "direction": "desc"},
                           {"column": "id", "direction": "asc"}]).collect()
    assert {(r["grp"], r["id"], r["rk"]) for r in out} == {("a", 5, 1), ("b", 8, 1)}


def test_topk_requires_config(ctx, scored):
    with pytest.raises(ConfigError):
        run_op(ctx, "topk.apply", [scored], by="grp", k=0,
               order_by=["score"])
    with pytest.raises(ConfigError):
        run_op(ctx, "topk.apply", [scored], by="grp", order_by=["score"])


# -- sample.weighted --------------------------------------------------------

def test_weighted_sample_deterministic_and_partition_invariant(ctx, scored):
    a = run_op(ctx, "sample.weighted", [scored], weight_column="score",
               id_column="id", k=4, seed="s").collect()
    b = run_op(ctx, "sample.weighted", [scored.repartition(7)],
               weight_column="score", id_column="id", k=4, seed="s").collect()
    assert sorted(r["id"] for r in a) == sorted(r["id"] for r in b)
    assert len(a) == 4


def test_weighted_sample_excludes_nonpositive_weights(ctx, spark):
    df = spark.createDataFrame(
        [(1, 0), (2, -3), (3, None), (4, 10), (5, 2)], ["id", "w"])
    out = run_op(ctx, "sample.weighted", [df], weight_column="w",
                 id_column="id", k=10).collect()
    assert sorted(r["id"] for r in out) == [4, 5]


def test_weighted_sample_matches_reference_formula(ctx, scored):
    """The op's selection equals the A-Res priority order computed in
    plain Python from the same md5-derived uniforms."""
    import hashlib

    rows = scored.collect()
    def key(r):
        h = int(hashlib.md5(f"{r['id']}|w".encode()).hexdigest()[:15], 16)
        u = (h + 1) / float(1 << 60)
        return (-math.log(u) / r["score"], r["id"])
    expect = sorted(r["id"] for r in sorted(rows, key=key)[:3])
    out = run_op(ctx, "sample.weighted", [scored], weight_column="score",
                 id_column="id", k=3, seed="w").collect()
    assert sorted(r["id"] for r in out) == expect


def test_weighted_sample_heavier_rows_win_more(ctx, spark):
    """Statistical sanity across seeds: a 50x-weight row is selected
    far more often than a 1x row."""
    df = spark.createDataFrame(
        [(i, 50 if i == 0 else 1) for i in range(20)], ["id", "w"])
    hits0 = hits1 = 0
    for s in range(30):
        picked = {r["id"] for r in run_op(
            ctx, "sample.weighted", [df], weight_column="w",
            id_column="id", k=5, seed=f"s{s}").collect()}
        hits0 += 0 in picked
        hits1 += 1 in picked
    assert hits0 > hits1
    assert hits0 >= 25  # P(select) ~ 5*50/69, essentially always


# -- skew.analyze -----------------------------------------------------------

def test_skew_analyze_counts_and_rank(ctx, spark):
    df = spark.createDataFrame(
        [(i, "hot" if i % 10 < 8 else ("warm" if i % 10 < 9 else "cold"))
         for i in range(100)], ["id", "k"])
    out = {r["k"]: r for r in run_op(
        ctx, "skew.analyze", [df], by="k", top=3).collect()}
    assert out["hot"]["cnt"] == 80 and out["hot"]["rank"] == 1
    assert out["cold"]["cnt"] == 10 and out["cold"]["rank"] == 2  # tie -> key asc
    assert out["warm"]["cnt"] == 10 and out["warm"]["rank"] == 3
    assert out["hot"]["share"] == pytest.approx(0.8)
    assert out["hot"]["skew"] == pytest.approx(2.4)  # 0.8 * 3 groups


def test_skew_analyze_top_bounds_output(ctx, spark):
    df = spark.createDataFrame([(i, i % 7) for i in range(70)], ["id", "k"])
    out = run_op(ctx, "skew.analyze", [df], by="k", top=2).collect()
    assert len(out) == 2
    assert all(r["cnt"] == 10 for r in out)


def test_skew_analyze_requires_by(ctx, scored):
    with pytest.raises(ConfigError):
        run_op(ctx, "skew.analyze", [scored], top=3)


def test_sample_mixture_deterministic_weights(ctx, spark):
    a = spark.createDataFrame([(i, f"a{i}") for i in range(400)],
                              "doc_id LONG, text STRING")
    b = spark.createDataFrame([(i + 1000, f"b{i}") for i in range(400)],
                              "doc_id LONG, text STRING")
    out = run_op(ctx, "sample.mixture", [a, b], weights=[2.25, 0.5],
                 id_column="doc_id")
    rows = out.collect()
    by_src = {}
    for r in rows:
        by_src.setdefault(r["mix_source"], []).append(r)
    # source 0: 2 full epochs + ~quarter partial
    n0, n1 = len(by_src[0]), len(by_src[1])
    assert 2 * 400 + 40 <= n0 <= 2 * 400 + 160, n0
    assert 120 <= n1 <= 280, n1
    # bit-deterministic: second run identical
    out2 = run_op(ctx, "sample.mixture", [a, b], weights=[2.25, 0.5],
                  id_column="doc_id")
    key = lambda r: (r["mix_source"], r["mix_epoch"], r["doc_id"])
    assert sorted(map(key, rows)) == sorted(map(key, out2.collect()))
    # epochs labeled 0..2 for source 0
    assert {r["mix_epoch"] for r in by_src[0]} == {0, 1, 2}


def test_sample_mixture_validates(ctx, spark):
    a = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    b = spark.createDataFrame([(1,)], "doc_id LONG")
    with pytest.raises(ConfigError, match="weights"):
        run_op(ctx, "sample.mixture", [a, a], weights=[1.0],
               id_column="doc_id")
    with pytest.raises(ConfigError, match="schema"):
        run_op(ctx, "sample.mixture", [a, b], weights=[1.0, 1.0],
               id_column="doc_id")


def test_sample_mixture_null_ids_and_bad_weights(ctx, spark):
    """Review findings: NULL ids must be EXCLUDED from partial
    epochs (null-propagating key, matching the oracle), kept in full
    epochs; runaway weights and type-mismatched schemas refuse."""
    a = spark.createDataFrame(
        [(1, "x"), (None, "n1"), (None, "n2")], "doc_id LONG, text STRING")
    out = run_op(ctx, "sample.mixture", [a], weights=[1.5],
                 id_column="doc_id")
    rows = out.collect()
    full = [r for r in rows if r["mix_epoch"] == 0]
    partial = [r for r in rows if r["mix_epoch"] == 1]
    assert len(full) == 3                      # nulls ride full epochs
    assert all(r["doc_id"] is not None for r in partial)

    with pytest.raises(ConfigError, match="epochs"):
        run_op(ctx, "sample.mixture", [a], weights=[150000.0],
               id_column="doc_id")
    b = spark.createDataFrame([("1", "y")], "doc_id STRING, text STRING")
    with pytest.raises(ConfigError, match="types"):
        run_op(ctx, "sample.mixture", [a, b], weights=[1.0, 1.0],
               id_column="doc_id")
