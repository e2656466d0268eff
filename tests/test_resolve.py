"""dedup.resolve: transitive cluster resolution vs a brute-force
Python union-find, incl. the chain case the naive drop-id_b rule
gets wrong."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op

PAIRS = [(1, 2), (2, 3), (5, 6), (8, 1)]  # {1,2,3,8} and {5,6}
DOCS = [
    (1, 10.0), (2, 99.0), (3, 50.0), (5, None), (6, None),
    (8, 99.0), (9, 1.0),  # 9 is a singleton
]


def _uf():
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in PAIRS:
        parent[find(a)] = find(b)
    return {x: find(x) for x in parent}


@pytest.fixture(scope="module")
def pairs(spark):
    return spark.createDataFrame(PAIRS, "id_a LONG, id_b LONG")


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, score DOUBLE")


def test_resolve_min_id_transitive(ctx, pairs):
    out = {r["id"]: (r["component"], r["kept"])
           for r in run_op(ctx, "dedup.resolve", [pairs]).collect()}
    roots = _uf()
    clusters: dict[int, set] = {}
    for x, r in roots.items():
        clusters.setdefault(r, set()).add(x)
    for members in clusters.values():
        keep = min(members)
        for m in members:
            assert out[m] == (keep, m == keep), members
    # the naive drop-id_b rule would drop 2 AND 3 AND 1 (pair 8<1
    # has 1 on the b side) leaving only 8 — resolve keeps exactly one
    kept = {i for i, (_, k) in out.items() if k}
    assert kept == {1, 5}


def test_resolve_max_score_with_singletons(ctx, pairs, docs):
    out = {r["id"]: (r["component"], r["kept"])
           for r in run_op(ctx, "dedup.resolve", [pairs, docs],
                           policy="max_score", id_column="doc_id",
                           score_column="score").collect()}
    # cluster {1,2,3,8}: top score 99.0 tie between 2 and 8 -> min id 2
    assert [i for i in (1, 2, 3, 8) if out[i][1]] == [2]
    # cluster {5,6}: all-NULL scores -> min id 5 survives
    assert [i for i in (5, 6) if out[i][1]] == [5]
    # 9 never paired: kept singleton, its own component
    assert out[9] == (9, True)
    # min_score flips the first cluster to id 1 (score 10)
    out2 = {r["id"]: r["kept"]
            for r in run_op(ctx, "dedup.resolve", [pairs, docs],
                            policy="min_score", id_column="doc_id",
                            score_column="score").collect()}
    assert [i for i in (1, 2, 3, 8) if out2[i]] == [1]


def test_resolve_errors(ctx, pairs, docs):
    with pytest.raises(ConfigError, match="score policies"):
        run_op(ctx, "dedup.resolve", [pairs], policy="max_score")
    with pytest.raises(ConfigError, match="no column"):
        run_op(ctx, "dedup.resolve", [pairs, docs], policy="max_score",
               id_column="doc_id", score_column="quality")
    with pytest.raises(ConfigError, match="singletons"):
        run_op(ctx, "dedup.resolve", [pairs, docs])


def test_resolve_member_missing_from_docs_stays(ctx, spark, pairs):
    # review finding: the score path inner-joined docs, silently
    # dropping paired ids absent from the docs table — a downstream
    # keep-where-kept consumer would re-keep them
    partial = spark.createDataFrame(
        [(1, 5.0), (3, 9.0), (5, 1.0), (6, 2.0), (8, 7.0)],
        "doc_id LONG, score DOUBLE")  # id 2 missing
    out = {r["id"]: r["kept"]
           for r in run_op(ctx, "dedup.resolve", [pairs, partial],
                           policy="max_score", id_column="doc_id",
                           score_column="score").collect()}
    assert 2 in out and out[2] is False  # present, NULL-scored loser
    assert [i for i in (1, 2, 3, 8) if out[i]] == [3]


def test_resolve_nan_never_outranks_real_scores(ctx, spark, pairs):
    d = spark.createDataFrame(
        [(1, float("nan")), (2, 5.0), (3, 1.0), (5, 1.0), (6, 2.0),
         (8, 0.5), (9, 9.9)],
        "doc_id LONG, score DOUBLE")
    out = {r["id"]: r["kept"]
           for r in run_op(ctx, "dedup.resolve", [pairs, d],
                           policy="max_score", id_column="doc_id",
                           score_column="score").collect()}
    # NaN folds into the NULL bucket: 2 (score 5.0) wins, not 1
    assert [i for i in (1, 2, 3, 8) if out[i]] == [2]


def test_resolve_duplicate_doc_rows_do_not_inflate(ctx, spark, pairs):
    d = spark.createDataFrame(
        [(1, 1.0), (2, 9.0), (2, 3.0), (3, 2.0), (5, 1.0), (6, 2.0),
         (8, 0.0), (9, 1.0), (9, 1.0)],
        "doc_id LONG, score DOUBLE")
    rows = run_op(ctx, "dedup.resolve", [pairs, d], policy="max_score",
                  id_column="doc_id", score_column="score").collect()
    ids = [r["id"] for r in rows]
    assert sorted(ids) == sorted(set(ids))  # one row per id
    out = {r["id"]: r["kept"] for r in rows}
    assert out[2] is True  # max of the duplicate scores (9.0) wins


def test_resolve_min_id_docs_column_validated(ctx, pairs, docs):
    with pytest.raises(ConfigError, match="no column"):
        run_op(ctx, "dedup.resolve", [pairs, docs], id_column="docid")
