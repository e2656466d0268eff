"""rank.tfidf, text.readability, stats.ks_test against plain-Python
references."""

from __future__ import annotations

import bisect
import math
import re

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


# ---------------------------------------------------------------- tfidf

DOCS = [
    (1, "cat cat dog the the the"),
    (2, "dog bird the"),
    (3, "cat fish"),
    (4, None),
    (5, ""),
]


def tfidf_ref(top_k=2, max_df=1.0, min_df=1):
    toks = {i: [t for t in re.split(r"\s+", (x or "").lower()) if t]
            for i, x in DOCS}
    tf = {(i, t): ts.count(t) for i, ts in toks.items() for t in set(ts)}
    df = {}
    for (i, t) in tf:
        df[t] = df.get(t, 0) + 1
    n = len({i for i, _ in tf})
    out = {}
    for i in toks:
        cands = [
            (t, tf[(i, t)], df[t],
             tf[(i, t)] * (math.log((n + 1) / (df[t] + 1)) + 1))
            for t in set(toks[i])
            if df[t] >= min_df and df[t] / n <= max_df
        ]
        cands.sort(key=lambda c: (-c[3], c[0]))
        out[i] = cands[:top_k]
    return out


def test_tfidf_matches_reference(ctx, spark):
    df = spark.createDataFrame(DOCS, "doc_id LONG, text STRING")
    got = {}
    for r in run_op(ctx, "rank.tfidf", [df], column="text",
                    id_column="doc_id", top_k=2).collect():
        got.setdefault(r["doc_id"], []).append(
            (r["rank"], r["term"], r["tf"], r["df"], r["tfidf"]))
    ref = tfidf_ref(top_k=2)
    for i, cands in ref.items():
        rows = sorted(got.get(i, []))
        assert len(rows) == len(cands), i
        for (rank, term, tf, dfc, score), (t, f, d, s) in zip(rows, cands):
            assert (term, tf, dfc) == (t, f, d), i
            assert score == pytest.approx(round(s, 9), abs=1e-9), i
    # max_df prunes the universal term ('the' is in 2 of 4 docs = 0.5)
    pruned = run_op(ctx, "rank.tfidf", [df], column="text",
                    id_column="doc_id", top_k=3, max_df=0.4)
    assert "the" not in {r["term"] for r in pruned.collect()}
    # min_df drops singletons
    common = run_op(ctx, "rank.tfidf", [df], column="text",
                    id_column="doc_id", top_k=3, min_df=2)
    assert {r["term"] for r in common.collect()} <= {"cat", "dog", "the"}
    with pytest.raises(ConfigError, match="max_df"):
        run_op(ctx, "rank.tfidf", [df], column="text",
               id_column="doc_id", max_df=0.0)


# ---------------------------------------------------------- readability

def syllables_ref(w):
    groups = len(re.findall(r"[aeiouy]+", w))
    if w.endswith("e") and groups > 1:
        groups -= 1
    return max(groups, 1)


@pytest.mark.parametrize("text,words,sents", [
    ("The cat sat on the mat. It was happy!", 9, 2),
    ("no punctuation here", 3, 1),
    ("Wait... what?! Really?", 3, 3),
])
def test_readability_matches_reference(ctx, spark, text, words, sents):
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    row = run_op(ctx, "text.readability", [df], column="text").collect()[0]
    toks = [t for t in re.split(r"\s+", text.lower()) if t]
    syl = sum(syllables_ref(t) for t in toks)
    assert row["rd_words"] == words
    assert row["rd_sentences"] == sents
    assert row["rd_syllables"] == syl
    wps, spw = words / sents, syl / max(words, 1)
    assert row["flesch_ease"] == pytest.approx(
        206.835 - 1.015 * wps - 84.6 * spw)
    assert row["fk_grade"] == pytest.approx(
        0.39 * wps + 11.8 * spw - 15.59)


def test_readability_null_and_clash(ctx, spark):
    df = spark.createDataFrame([(1, None)], "doc_id LONG, text STRING")
    row = run_op(ctx, "text.readability", [df], column="text").collect()[0]
    assert row["rd_words"] is None
    assert row["rd_sentences"] is None
    assert row["flesch_ease"] is None
    df2 = spark.createDataFrame([(1, "t", 0.0)],
                                "doc_id LONG, text STRING, fk_grade DOUBLE")
    with pytest.raises(ConfigError, match="would overwrite"):
        run_op(ctx, "text.readability", [df2], column="text")


# ------------------------------------------------------------------- ks

def ks_ref(A, B):
    A, B = sorted(A), sorted(B)
    vals = sorted(set(A) | set(B))
    best = (-1.0, None)
    for v in vals:
        d = abs(bisect.bisect_right(A, v) / len(A)
                - bisect.bisect_right(B, v) / len(B))
        if d > best[0]:
            best = (d, v)
    return best


@pytest.mark.parametrize("buckets", [1, 4, 64])
def test_ks_matches_reference(ctx, spark, buckets):
    A = [float(x % 17) * 1.5 for x in range(200)]
    B = [float(x % 13) * 1.7 + 0.3 for x in range(150)]
    ref = spark.createDataFrame([(v,) for v in A] + [(None,)], "v DOUBLE")
    cur = spark.createDataFrame([(v,) for v in B], "v DOUBLE")
    row = run_op(ctx, "stats.ks_test", [ref, cur], column="v",
                 buckets=buckets).collect()[0]
    d, at = ks_ref(A, B)
    assert row["d_stat"] == d  # exact double equality, any bucketing
    assert row["at_value"] == at
    assert row["n_ref"] == 200 and row["n_cur"] == 150
    assert row["n_null_ref"] == 1 and row["n_null_cur"] == 0
    assert row["n_values"] == len(set(A) | set(B))


def test_ks_identical_and_constant(ctx, spark):
    A = [1.0, 2.0, 3.0] * 10
    ref = spark.createDataFrame([(v,) for v in A], "v DOUBLE")
    row = run_op(ctx, "stats.ks_test", [ref, ref], column="v").collect()[0]
    assert row["d_stat"] == 0.0
    # constant column exercises the lo == hi bucket branch
    const = spark.createDataFrame([(5.0,)] * 10, "v DOUBLE")
    row = run_op(ctx, "stats.ks_test", [const, const], column="v",
                 buckets=8).collect()[0]
    assert row["d_stat"] == 0.0 and row["n_values"] == 1


def test_ks_empty_side_raises(ctx, spark):
    ref = spark.createDataFrame([(1.0,)], "v DOUBLE")
    empty = spark.createDataFrame([(None,)], "v DOUBLE")
    with pytest.raises(Exception, match="no non-null values"):
        run_op(ctx, "stats.ks_test", [ref, empty],
               column="v").collect()
    with pytest.raises(ConfigError, match="reference has no column"):
        run_op(ctx, "stats.ks_test", [ref.drop("v"), ref], column="v")
    # ZERO-row side (not just all-NULL): the r13 one-pass count
    # restructure made this raise like the all-NULL case — before it
    # fell through to a silent NULL d_stat via NULL - 0 arithmetic,
    # contradicting the op's documented fail-loudly contract
    zero = spark.createDataFrame([], "v DOUBLE")
    with pytest.raises(Exception, match="no non-null values"):
        run_op(ctx, "stats.ks_test", [ref, zero], column="v").collect()


def test_ks_nan_counted_as_null(ctx, spark):
    ref = spark.createDataFrame(
        [(1.0,), (2.0,), (float("nan"),)], "v DOUBLE")
    cur = spark.createDataFrame([(1.0,), (2.0,)], "v DOUBLE")
    row = run_op(ctx, "stats.ks_test", [ref, cur], column="v").collect()[0]
    assert row["n_ref"] == 2 and row["n_null_ref"] == 1
    assert row["d_stat"] == 0.0
