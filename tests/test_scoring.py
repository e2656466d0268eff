"""Model-based scoring ops (scoring.py): text.perplexity,
classify.linear, rank.bm25 — each checked against a plain-Python
reference implementation on a corpus small enough to verify by hand."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op

TOKS = {
    1: ["the", "cat", "sat", "on", "the", "mat"],
    2: ["the", "cat", "sat", "on", "the", "cat"],
    3: ["zebra", "qux", "flurble"],
    4: [],
    5: ["solo"],
}


@pytest.fixture(scope="module")
def docs(spark):
    rows = [(i, " ".join(t)) for i, t in TOKS.items()]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def _py_nll(cand_toks, ref_toks, n=2, k=1.0):
    uni = Counter(w for t in ref_toks for w in t)
    grams = Counter(
        " ".join(t[i:i + n]) for t in ref_toks for i in range(len(t) - n + 1)
    )
    if n == 1:
        ctx = None
        total = sum(uni.values())
    else:
        ctx = Counter(
            " ".join(t[i:i + n - 1])
            for t in ref_toks for i in range(len(t) - n + 2)
        )
    v = len(uni)
    lps = []
    for i in range(len(cand_toks) - n + 1):
        g = " ".join(cand_toks[i:i + n])
        c = total if n == 1 else ctx[" ".join(cand_toks[i:i + n - 1])]
        lps.append(math.log((grams[g] + k) / (c + k * v)))
    if not lps:
        return None, 0
    return round(-sum(lps) / len(lps), 9), len(lps)


def test_perplexity_self_scored_bigram(ctx, docs):
    out = run_op(ctx, "text.perplexity", [docs],
                 column="text", id_column="doc_id", order=2)
    got = {r["doc_id"]: (r["nll"], r["lm_ngrams"]) for r in out.collect()}
    ref = list(TOKS.values())
    for i, t in TOKS.items():
        nll, n = _py_nll(t, ref, n=2)
        assert got[i][1] == n
        if nll is None:
            assert got[i][0] is None
        else:
            assert got[i][0] == pytest.approx(nll, abs=1e-9), i


def test_perplexity_reference_mode_and_orders(ctx, spark, docs):
    # LM trained on docs 1-2 only; OOV-heavy doc 3 must score worse
    # than fluent doc 1
    ref = docs.filter("doc_id <= 2")
    out = run_op(ctx, "text.perplexity", [docs, ref],
                 column="text", id_column="doc_id", order=2)
    got = {r["doc_id"]: r["nll"] for r in out.collect()}
    ref_toks = [TOKS[1], TOKS[2]]
    for i in (1, 2, 3):
        exp, _ = _py_nll(TOKS[i], ref_toks, n=2)
        assert got[i] == pytest.approx(exp, abs=1e-9), i
    assert got[3] > got[1]

    # unigram + trigram orders against the python reference
    for order in (1, 3):
        out_n = run_op(ctx, "text.perplexity", [docs],
                       column="text", id_column="doc_id", order=order)
        got_n = {r["doc_id"]: (r["nll"], r["lm_ngrams"])
                 for r in out_n.collect()}
        for i, t in TOKS.items():
            exp, cnt = _py_nll(t, list(TOKS.values()), n=order)
            assert got_n[i][1] == cnt, (order, i)
            if exp is None:
                assert got_n[i][0] is None, (order, i)
            else:
                assert got_n[i][0] == pytest.approx(exp, abs=1e-9), (order, i)


def test_perplexity_config_errors(ctx, docs):
    with pytest.raises(ConfigError, match="column"):
        run_op(ctx, "text.perplexity", [docs], id_column="doc_id")
    with pytest.raises(ConfigError, match="order"):
        run_op(ctx, "text.perplexity", [docs], column="text",
               id_column="doc_id", order=9)
    with pytest.raises(ConfigError, match="'k'"):
        run_op(ctx, "text.perplexity", [docs], column="text",
               id_column="doc_id", k=0)


WEIGHTS = [("cat", 2.0), ("zebra", -5.0), ("the", 0.25)]


@pytest.fixture(scope="module")
def weights(spark):
    return spark.createDataFrame(WEIGHTS, "term STRING, weight DOUBLE")


def test_classify_linear_modes(ctx, docs, weights):
    wmap = dict(WEIGHTS)

    def py_logit(toks, mode, bias):
        tf = Counter(toks)
        dot = sum(
            (1 if mode == "binary" else c) * wmap[t]
            for t, c in tf.items() if t in wmap
        )
        if mode == "mean":
            dot = dot / len(toks) if toks else 0.0
        return round(dot + bias, 9)

    for mode in ("mean", "sum", "binary"):
        out = run_op(ctx, "classify.linear", [docs, weights],
                     column="text", id_column="doc_id",
                     mode=mode, bias=0.1)
        got = {r["doc_id"]: (r["logit"], r["predicted"])
               for r in out.collect()}
        for i, t in TOKS.items():
            exp = py_logit(t, mode, 0.1)
            assert got[i][0] == pytest.approx(exp, abs=1e-9), (mode, i)
            assert got[i][1] == (exp > 0), (mode, i)


def test_classify_linear_errors_and_columns(ctx, spark, docs, weights):
    with pytest.raises(ConfigError, match="weights table"):
        run_op(ctx, "classify.linear", [docs, docs.select("doc_id")],
               column="text", id_column="doc_id")
    with pytest.raises(ConfigError, match="mode"):
        run_op(ctx, "classify.linear", [docs, weights],
               column="text", id_column="doc_id", mode="softmax")
    # custom weights-table column names
    w2 = spark.createDataFrame(WEIGHTS, "tok STRING, coef DOUBLE")
    out = run_op(ctx, "classify.linear", [docs, w2],
                 column="text", id_column="doc_id",
                 term_column="tok", weight_column="coef", mode="sum")
    got = {r["doc_id"]: r["logit"] for r in out.collect()}
    assert got[1] == pytest.approx(2.0 + 2 * 0.25, abs=1e-9)


def _py_bm25(query_toks, k1=1.2, b=0.75):
    docs_t = {i: t for i, t in TOKS.items() if t}
    n = len(TOKS)  # docs with zero tokens still count toward N? no:
    # the op derives N from postings-bearing docs; doc 4 has no tokens
    n = len(docs_t)
    avgdl = sum(len(t) for t in docs_t.values()) / n
    df = Counter()
    for t in docs_t.values():
        for w in set(t):
            df[w] += 1
    scores = {}
    for i, t in docs_t.items():
        tf = Counter(t)
        s = 0.0
        for w in sorted(set(query_toks)):
            if tf[w] == 0:
                continue
            idf = math.log(1 + (n - df[w] + 0.5) / (df[w] + 0.5))
            s += idf * tf[w] * (k1 + 1) / (
                tf[w] + k1 * (1 - b + b * len(t) / avgdl))
        if s:
            scores[i] = round(s, 9)
    return scores


def test_bm25_scores_match_python(ctx, spark, docs):
    q = spark.createDataFrame(
        [(1, "cat mat"), (2, "zebra"), (3, "absent")],
        "query_id LONG, query STRING")
    out = run_op(ctx, "rank.bm25", [docs, q],
                 column="text", id_column="doc_id")
    got = {(r["query_id"], r["doc_id"]): r["score"] for r in out.collect()}
    exp1 = _py_bm25(["cat", "mat"])
    exp2 = _py_bm25(["zebra"])
    assert set(got) == {(1, 1), (1, 2), (2, 3)}  # query 3 matches nothing
    assert got[(1, 1)] == pytest.approx(exp1[1], abs=1e-9)
    assert got[(1, 2)] == pytest.approx(exp1[2], abs=1e-9)
    assert got[(2, 3)] == pytest.approx(exp2[3], abs=1e-9)


def test_scoring_partitioning_invariance(ctx, spark, docs, weights):
    """The fixed-order fold claim: per-doc double totals must not
    move with partitioning (a partition-order SUM would)."""
    exp_nll = {r["doc_id"]: r["nll"] for r in run_op(
        ctx, "text.perplexity", [docs.repartition(1)],
        column="text", id_column="doc_id").collect()}
    got_nll = {r["doc_id"]: r["nll"] for r in run_op(
        ctx, "text.perplexity", [docs.repartition(5)],
        column="text", id_column="doc_id").collect()}
    assert got_nll == exp_nll

    exp_lg = {r["doc_id"]: r["logit"] for r in run_op(
        ctx, "classify.linear", [docs.repartition(1), weights],
        column="text", id_column="doc_id").collect()}
    got_lg = {r["doc_id"]: r["logit"] for r in run_op(
        ctx, "classify.linear", [docs.repartition(5), weights],
        column="text", id_column="doc_id").collect()}
    assert got_lg == exp_lg


def test_bm25_top_k_and_max_df(ctx, spark, docs):
    q = spark.createDataFrame([(1, "the cat")], "query_id LONG, query STRING")
    out = run_op(ctx, "rank.bm25", [docs, q],
                 column="text", id_column="doc_id", top_k=1)
    rows = out.collect()
    assert len(rows) == 1 and rows[0]["rank"] == 1
    # 'the' appears in 2 of the 4 token-bearing docs, 'solo' in 1;
    # max_df=0.3 (threshold 1.2 docs) prunes 'the', keeps 'solo'
    q2 = spark.createDataFrame([(1, "the solo")],
                               "query_id LONG, query STRING")
    out2 = run_op(ctx, "rank.bm25", [docs, q2],
                  column="text", id_column="doc_id", max_df=0.3)
    got2 = {(r["query_id"], r["doc_id"]): r["score"] for r in out2.collect()}
    exp = _py_bm25(["solo"])
    assert set(got2) == {(1, 5)}
    assert got2[(1, 5)] == pytest.approx(exp[5], abs=1e-9)
    with pytest.raises(ConfigError, match="max_df"):
        run_op(ctx, "rank.bm25", [docs, q],
               column="text", id_column="doc_id", max_df=0.0)
    with pytest.raises(ConfigError, match="queries table"):
        run_op(ctx, "rank.bm25", [docs, docs.select("doc_id")],
               column="text", id_column="doc_id")


MC_WEIGHTS = [
    ("cat", "animal", 2.0), ("mat", "animal", 0.5),
    ("cat", "furniture", -1.0), ("mat", "furniture", 3.0),
    ("zebra", "animal", 4.0), ("the", "filler", 1.0),
]


@pytest.fixture(scope="module")
def mc_weights(spark):
    return spark.createDataFrame(
        MC_WEIGHTS, "term STRING, class STRING, weight DOUBLE")


def _py_multiclass(toks, mode, biases):
    tf = Counter(toks)
    classes = sorted({c for _, c, _ in MC_WEIGHTS} | set(biases))
    scores = {}
    for cls in classes:
        wmap = {t: w for t, c, w in MC_WEIGHTS if c == cls}
        dot = sum(
            (1 if mode == "binary" else n) * wmap[t]
            for t, n in tf.items() if t in wmap
        )
        if mode == "mean":
            dot = dot / len(toks) if toks else 0.0
        scores[cls] = round(dot + biases.get(cls, 0.0), 9)
    # total tie-break: max score, then lexicographically SMALLEST class
    top = max(scores.values())
    best = min(c for c in classes if scores[c] == top)
    return best, top


def test_classify_multiclass_modes_and_fallback(ctx, docs, mc_weights):
    biases = {"other": -0.05}
    for mode in ("mean", "sum", "binary"):
        out = run_op(ctx, "classify.multiclass", [docs, mc_weights],
                     column="text", id_column="doc_id",
                     mode=mode, biases=biases)
        got = {r["doc_id"]: (r["predicted"], r["score"])
               for r in out.collect()}
        for i, t in TOKS.items():
            cls, sc = _py_multiclass(t, mode, biases)
            assert got[i][0] == cls, (mode, i, got[i])
            assert got[i][1] == pytest.approx(sc, abs=1e-9), (mode, i)


def test_classify_multiclass_all_oov_takes_prior(ctx, spark, mc_weights):
    # tokens matching NO weights: the best bias (here a positive
    # 'other' prior) must win over every 0-scoring weighted class...
    d = spark.createDataFrame([(1, "qux flurble")], "doc_id LONG, text STRING")
    out = run_op(ctx, "classify.multiclass", [d, mc_weights],
                 column="text", id_column="doc_id",
                 biases={"other": 0.5})
    row = out.collect()[0]
    assert (row["predicted"], row["score"]) == ("other", 0.5)
    # ...and with no biases, the tie over 0.0 picks the smallest class
    out2 = run_op(ctx, "classify.multiclass", [d, mc_weights],
                  column="text", id_column="doc_id")
    assert out2.collect()[0]["predicted"] == "animal"


def test_classify_multiclass_negative_match_falls_back(ctx, spark, mc_weights):
    # a doc whose ONLY matched class scores negative must lose to an
    # unmatched zero-scoring class (the docs x classes frame, not just
    # matched pairs)
    d = spark.createDataFrame(
        [(1, "mat mat")], "doc_id LONG, text STRING")
    w = spark.createDataFrame(
        [("mat", "bad", -2.0)], "term STRING, class STRING, weight DOUBLE")
    out = run_op(ctx, "classify.multiclass", [d, w],
                 column="text", id_column="doc_id",
                 biases={"neutral": 0.0})
    assert out.collect()[0]["predicted"] == "neutral"


def test_classify_multiclass_errors(ctx, spark, docs, mc_weights):
    with pytest.raises(ConfigError, match="weights table"):
        run_op(ctx, "classify.multiclass", [docs, docs.select("doc_id")],
               column="text", id_column="doc_id")
    with pytest.raises(ConfigError, match="biases"):
        run_op(ctx, "classify.multiclass", [docs, mc_weights],
               column="text", id_column="doc_id", biases=[1, 2])
    with pytest.raises(ConfigError, match="overwrite"):
        run_op(ctx, "classify.multiclass", [docs, mc_weights],
               column="text", id_column="doc_id", output_column="text")
    # custom weights-table column names work
    w2 = spark.createDataFrame(
        [(t, c, w) for t, c, w in MC_WEIGHTS],
        "tok STRING, lbl STRING, coef DOUBLE")
    out = run_op(ctx, "classify.multiclass", [docs, w2],
                 column="text", id_column="doc_id", term_column="tok",
                 class_column="lbl", weight_column="coef", mode="sum")
    assert out.filter("doc_id = 3").collect()[0]["predicted"] == "animal"


def test_classify_multiclass_same_output_names_refused(ctx, docs, mc_weights):
    with pytest.raises(ConfigError, match="must\n.*differ|differ"):
        run_op(ctx, "classify.multiclass", [docs, mc_weights],
               column="text", id_column="doc_id",
               output_column="p", score_column="p")


def _py_stupid_backoff(cand_toks, ref_toks, n=2, alpha=0.4):
    grams: dict[int, Counter] = {}
    for m in range(1, n + 1):
        grams[m] = Counter(
            " ".join(t[i:i + m])
            for t in ref_toks for i in range(len(t) - m + 1))
    big_n = sum(grams[1].values())
    v = len(grams[1])
    lps = []
    for i in range(len(cand_toks) - n + 1):
        w = cand_toks[i:i + n]
        lp = None
        for m in range(n, 0, -1):
            g = " ".join(w[n - m:])
            if grams[m][g] > 0:
                den = big_n if m == 1 else grams[m - 1][" ".join(w[n - m:-1])]
                lp = (n - m) * math.log(alpha) + math.log(grams[m][g] / den)
                break
        if lp is None:
            lp = (n - 1) * math.log(alpha) - math.log(v)
        lps.append(lp)
    if not lps:
        return None, 0
    return round(-sum(lps) / len(lps), 9), len(lps)


@pytest.mark.parametrize("order", [1, 2, 3])
def test_perplexity_stupid_backoff_matches_python(ctx, spark, docs, order):
    # LM trained on docs 1-2 only so docs 3/5 exercise every backoff
    # depth incl. the OOV uniform floor
    ref = docs.filter("doc_id <= 2")
    out = run_op(ctx, "text.perplexity", [docs, ref],
                 column="text", id_column="doc_id", order=order,
                 backoff="stupid", alpha=0.4)
    got = {r["doc_id"]: (r["nll"], r["lm_ngrams"]) for r in out.collect()}
    ref_toks = [TOKS[1], TOKS[2]]
    for i, t in TOKS.items():
        exp, cnt = _py_stupid_backoff(t, ref_toks, n=order)
        assert got[i][1] == cnt, (order, i)
        if exp is None:
            assert got[i][0] is None, (order, i)
        else:
            assert got[i][0] == pytest.approx(exp, abs=1e-9), (order, i)


def test_perplexity_backoff_beats_addk_on_seen_text(ctx, docs):
    # self-scored fluent text: backoff assigns it much higher
    # probability (no +kV flattening), i.e. lower nll
    addk = {r["doc_id"]: r["nll"] for r in run_op(
        ctx, "text.perplexity", [docs], column="text",
        id_column="doc_id", order=2).collect()}
    bo = {r["doc_id"]: r["nll"] for r in run_op(
        ctx, "text.perplexity", [docs], column="text",
        id_column="doc_id", order=2, backoff="stupid").collect()}
    assert bo[1] < addk[1]


def test_perplexity_backoff_errors(ctx, docs):
    with pytest.raises(ConfigError, match="alpha"):
        run_op(ctx, "text.perplexity", [docs], column="text",
               id_column="doc_id", backoff="stupid", alpha=0.0)
    with pytest.raises(ConfigError, match="backoff"):
        run_op(ctx, "text.perplexity", [docs], column="text",
               id_column="doc_id", backoff="katz")


def test_perplexity_backoff_empty_reference_raises(ctx, spark, docs):
    ref = spark.createDataFrame([], "doc_id LONG, text STRING")
    with pytest.raises(ConfigError, match="no tokens"):
        run_op(ctx, "text.perplexity", [docs, ref], column="text",
               id_column="doc_id", backoff="stupid")
