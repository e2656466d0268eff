"""stats.jensen_shannon vs a literal-Python transcription of the
quantized contribution formula, plus the metric's defining
properties (symmetry, identity-of-indiscernibles, ln 2 bound)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op

_Q = float(1 << 30)


def _toks(docs):
    return [t for d in docs for t in d.lower().split() if t]


def _py_jsd(a_docs, b_docs):
    ca, cb = Counter(_toks(a_docs)), Counter(_toks(b_docs))
    na, nb = sum(ca.values()), sum(cb.values())
    if na == 0 or nb == 0:
        return None
    q = 0
    for t in set(ca) | set(cb):
        xa, xb = ca[t], cb[t]
        den = float(xa * nb + xb * na)
        ta = (xa / na) * math.log(2.0 * float(xa * nb) / den) if xa else 0.0
        tb = (xb / nb) * math.log(2.0 * float(xb * na) / den) if xb else 0.0
        q += math.floor((0.5 * (ta + tb)) * _Q)
    return q / _Q


A = ["the cat sat on the mat", "a cat and a dog", "the end"]
B = ["the dog ran far", "a dog and a dog barked", "the start"]


@pytest.fixture(scope="module")
def corpora(spark):
    a = spark.createDataFrame([(i, t) for i, t in enumerate(A)],
                              "doc_id LONG, text STRING")
    b = spark.createDataFrame([(i, t) for i, t in enumerate(B)],
                              "doc_id LONG, text STRING")
    return a, b


def test_jsd_matches_reference(ctx, corpora):
    a, b = corpora
    row = run_op(ctx, "stats.jensen_shannon", [a, b],
                 column="text").collect()[0]
    exp = _py_jsd(A, B)
    # python libm vs JVM log can differ 1 ulp at a floor boundary —
    # allow a few quantization buckets
    assert row["jsd"] == pytest.approx(exp, abs=5e-9)
    assert 0 <= row["jsd"] <= math.log(2)
    assert row["tokens_a"] == len(_toks(A))
    assert row["tokens_b"] == len(_toks(B))
    assert row["terms_union"] == len(set(_toks(A)) | set(_toks(B)))


def test_jsd_properties(ctx, spark, corpora):
    a, b = corpora
    # symmetry
    ab = run_op(ctx, "stats.jensen_shannon", [a, b], column="text") \
        .collect()[0]["jsd"]
    ba = run_op(ctx, "stats.jensen_shannon", [b, a], column="text") \
        .collect()[0]["jsd"]
    assert ab == pytest.approx(ba, abs=5e-9)
    # identical corpora -> 0 (quantization-exact: every contribution
    # is ln(1) = 0)
    aa = run_op(ctx, "stats.jensen_shannon", [a, a], column="text") \
        .collect()[0]["jsd"]
    assert aa == 0.0
    # disjoint vocabularies -> exactly ln 2 (up to quantization)
    x = spark.createDataFrame([(1, "aa bb cc")], "doc_id LONG, text STRING")
    y = spark.createDataFrame([(1, "dd ee ff")], "doc_id LONG, text STRING")
    xy = run_op(ctx, "stats.jensen_shannon", [x, y], column="text") \
        .collect()[0]["jsd"]
    assert xy == pytest.approx(math.log(2), abs=1e-8)


def test_jsd_empty_side_is_null(ctx, spark, corpora):
    a, _ = corpora
    empty = spark.createDataFrame([(1, "")], "doc_id LONG, text STRING")
    row = run_op(ctx, "stats.jensen_shannon", [a, empty],
                 column="text").collect()[0]
    assert row["jsd"] is None
    assert row["tokens_b"] == 0


def test_jsd_errors(ctx, corpora):
    a, b = corpora
    with pytest.raises(ConfigError, match="column"):
        run_op(ctx, "stats.jensen_shannon", [a, b])
    with pytest.raises(ConfigError, match="second input"):
        run_op(ctx, "stats.jensen_shannon", [a, b.select("doc_id")],
               column="text")


def _py_mi(rows, min_count=1):
    from collections import Counter
    tc: Counter = Counter()
    for cls, text in rows:
        if cls is None or text is None:
            continue
        for t in text.lower().split():
            if t:
                tc[(t, cls)] += 1
    ct: Counter = Counter()
    cc: Counter = Counter()
    for (t, c), n in tc.items():
        ct[t] += n
        cc[c] += n
    n_tot = sum(tc.values())
    q: dict[str, int] = {}
    cls_n: dict[str, int] = {}
    for (t, c), n in tc.items():
        contrib = (n / n_tot) * math.log((n_tot * n) / (ct[t] * cc[c]))
        q[t] = q.get(t, 0) + math.floor(contrib * (1 << 30))
        cls_n[t] = cls_n.get(t, 0) + 1
    return {t: (qq / (1 << 30), ct[t], cls_n[t])
            for t, qq in q.items() if ct[t] >= min_count}


MI_ROWS = [
    ("en", "the cat sat shared"),
    ("en", "the dog ran shared"),
    ("fr", "le chat shared"),
    ("fr", "le chien le shared"),
    (None, "ignored row"),
    ("en", None),
]


def test_mutual_information_matches_reference(ctx, spark):
    d = spark.createDataFrame(MI_ROWS, "lang STRING, text STRING")
    out = run_op(ctx, "stats.mutual_information", [d],
                 column="text", class_column="lang")
    got = {r["term"]: (r["mi"], r["count"], r["classes"])
           for r in out.collect()}
    exp = _py_mi(MI_ROWS)
    assert set(got) == set(exp)
    for t, (mi, cnt, ncls) in exp.items():
        assert got[t][1] == cnt and got[t][2] == ncls, t
        assert got[t][0] == pytest.approx(mi, abs=5e-9), t
    # class-exclusive terms rank above the perfectly shared one
    assert got["le"][0] > got["shared"][0]
    # near-zero but not exactly zero: class marginals are unequal
    # (7 vs 8 tokens), so the evenly-split term carries a sliver of MI
    assert 0 <= got["shared"][0] < 0.01


def test_mutual_information_topk_and_errors(ctx, spark):
    d = spark.createDataFrame(MI_ROWS, "lang STRING, text STRING")
    out = run_op(ctx, "stats.mutual_information", [d], column="text",
                 class_column="lang", top_k=3)
    ranks = [r["mi_rank"] for r in out.collect()]
    assert sorted(ranks) == [1, 2, 3]
    with pytest.raises(ConfigError, match="class_column"):
        run_op(ctx, "stats.mutual_information", [d], column="text")
