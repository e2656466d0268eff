"""rank.rrf vs the textbook formula, incl. weights, missing items,
per-query fusion, and ties."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op

R1 = [(1, 1), (2, 2), (3, 3)]           # (doc, rank)
R2 = [(3, 1), (1, 2), (4, 3)]


def _rrf(rankings, weights=None, k=60):
    weights = weights or [1.0] * len(rankings)
    scores: dict[int, float] = {}
    for w, ranking in zip(weights, rankings):
        for doc, r in ranking:
            scores[doc] = scores.get(doc, 0.0) + w / (k + r)
    ranked = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))
    return [(d, round(s, 9), i + 1) for i, (d, s) in enumerate(ranked)]


@pytest.fixture(scope="module")
def rankings(spark):
    a = spark.createDataFrame(R1, "doc_id LONG, rank INT")
    b = spark.createDataFrame(R2, "doc_id LONG, rank INT")
    return a, b


def test_rrf_matches_formula(ctx, rankings):
    a, b = rankings
    out = run_op(ctx, "rank.rrf", [a, b], id_column="doc_id")
    got = sorted((r["doc_id"], r["rrf_score"], r["rrf_rank"])
                 for r in out.collect())
    exp = sorted(_rrf([R1, R2]))
    for g, e in zip(got, exp):
        assert g[0] == e[0] and g[2] == e[2]
        assert g[1] == pytest.approx(e[1], abs=1e-9)


def test_rrf_weights_and_topk(ctx, rankings):
    a, b = rankings
    out = run_op(ctx, "rank.rrf", [a, b], id_column="doc_id",
                 weights=[1.0, 3.0], top_k=2)
    got = [(r["doc_id"], r["rrf_rank"]) for r in
           sorted(out.collect(), key=lambda r: r["rrf_rank"])]
    exp = [(d, rk) for d, _, rk in _rrf([R1, R2], [1.0, 3.0])[:2]]
    assert got == exp


def test_rrf_per_query_and_ties(ctx, spark):
    # symmetric rankings: docs 1 and 2 tie -> lower id ranks first
    a = spark.createDataFrame(
        [(1, 1, 1), (1, 2, 2), (2, 9, 1)], "q LONG, doc_id LONG, rank INT")
    b = spark.createDataFrame(
        [(1, 2, 1), (1, 1, 2), (2, 8, 1)], "q LONG, doc_id LONG, rank INT")
    out = run_op(ctx, "rank.rrf", [a, b], id_column="doc_id",
                 query_id_column="q")
    got = {(r["q"], r["doc_id"]): r["rrf_rank"] for r in out.collect()}
    assert got[(1, 1)] == 1 and got[(1, 2)] == 2      # tie -> min id
    assert got[(2, 8)] == 1 and got[(2, 9)] == 2      # per-query fusion


def test_rrf_errors(ctx, rankings):
    a, b = rankings
    with pytest.raises(ConfigError, match="weights"):
        run_op(ctx, "rank.rrf", [a, b], id_column="doc_id", weights=[1.0])
    with pytest.raises(ConfigError, match="no column"):
        run_op(ctx, "rank.rrf", [a, b.drop("rank")], id_column="doc_id")


def test_rrf_null_and_negative_ranks_contribute_zero(ctx, spark):
    # review finding: a NULL rank NULLed the item's ENTIRE fused
    # score through fold_sum instead of contributing 0; negative
    # ranks are junk and drop pre-union the same way.
    a = spark.createDataFrame(
        [(1, 1), (2, None), (3, -2)], "doc_id LONG, rank INT")
    b = spark.createDataFrame(R2, "doc_id LONG, rank INT")
    out = run_op(ctx, "rank.rrf", [a, b], id_column="doc_id")
    got = {r["doc_id"]: r["rrf_score"] for r in out.collect()}
    # doc 2's NULL rank in A contributes nothing; doc 3's rank -2 ditto
    exp = _rrf([[(1, 1)], R2])
    assert set(got) == {d for d, _, _ in exp}
    for d, s, _ in exp:
        assert got[d] == pytest.approx(s, abs=1e-9)


def test_rrf_rank_zero_raises(ctx, spark):
    # ADVICE r9: silently dropping rank 0 erased a 0-based ranking's
    # TOP item with no diagnostic — now a named execution-time error
    a = spark.createDataFrame(
        [(1, 1), (3, 0)], "doc_id LONG, rank INT")
    b = spark.createDataFrame(R2, "doc_id LONG, rank INT")
    out = run_op(ctx, "rank.rrf", [a, b], id_column="doc_id")
    with pytest.raises(Exception, match="ranks are 1-based"):
        out.collect()
