"""Hypothesis parity: the round-8 scoring/clustering ops against
their plain-Python references on randomized corpora — fuzzing the
exactness claims the fixed-fixture tests spot-check."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from tests.conftest import run_op  # noqa: E402
from tests.test_clustering import py_kmeans, py_pq  # noqa: E402
from tests.test_scoring import _py_nll  # noqa: E402

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta"]

DOC = st.lists(st.sampled_from(WORDS), min_size=0, max_size=10)
CORPUS = st.lists(DOC, min_size=1, max_size=8)

_SETTINGS = dict(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(corpus=CORPUS, order=st.integers(1, 3))
@settings(**_SETTINGS)
def test_perplexity_matches_python_on_random_corpora(ctx, spark, corpus, order):
    rows = [(i, " ".join(t)) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = run_op(ctx, "text.perplexity", [df], column="text",
                 id_column="doc_id", order=order)
    got = {r["doc_id"]: (r["nll"], r["lm_ngrams"]) for r in out.collect()}
    for i, toks in enumerate(corpus):
        exp, n = _py_nll(toks, corpus, n=order)
        assert got[i][1] == n, (i, order)
        if exp is None:
            assert got[i][0] is None, (i, order)
        else:
            assert got[i][0] == pytest.approx(exp, abs=1e-9), (i, order)


VEC = st.lists(
    st.integers(-32, 32).map(lambda v: v / 8.0), min_size=3, max_size=3
)


@given(vecs=st.lists(VEC, min_size=2, max_size=9, unique_by=tuple),
       data=st.data())
@settings(**_SETTINGS)
def test_kmeans_matches_python_on_random_vectors(ctx, spark, vecs, data):
    k = data.draw(st.integers(1, len(vecs)))
    iters = data.draw(st.integers(1, 3))
    vmap = {i: v for i, v in enumerate(vecs)}
    rows = [(i, v) for i, v in vmap.items()]
    df = spark.createDataFrame(rows, "vec_id LONG, embedding ARRAY<DOUBLE>")
    exp_assign, _, _ = py_kmeans(vmap, k, iters)
    got = {r["vec_id"]: r["cluster"] for r in run_op(
        ctx, "embedding.kmeans", [df], id_column="vec_id",
        k=k, iterations=iters).collect()}
    assert got == exp_assign


@given(vecs=st.lists(
    st.lists(st.integers(-32, 32).map(lambda v: v / 8.0),
             min_size=4, max_size=4),
    min_size=3, max_size=8, unique_by=tuple),
    data=st.data())
@settings(**_SETTINGS)
def test_pq_codes_match_python_on_random_vectors(ctx, spark, vecs, data):
    kw = data.draw(st.integers(1, len(vecs)))
    iters = data.draw(st.integers(1, 2))
    vmap = {i: v for i, v in enumerate(vecs)}
    df = spark.createDataFrame(list(vmap.items()),
                               "vec_id LONG, embedding ARRAY<DOUBLE>")
    _, exp_codes = py_pq(vmap, m=2, kw=kw, iterations=iters)
    got = {r["vec_id"]: list(r["pq_code"]) for r in run_op(
        ctx, "embedding.pq", [df], id_column="vec_id",
        m=2, k=kw, iterations=iters).collect()}
    assert got == exp_codes
