"""Hypothesis parity for the round-8 fingerprint/selection wave:
text.winnow, text.cdc_chunk, and text.entropy against their
plain-Python references on randomized corpora — including texts with
weird whitespace, repeated tokens (winnow's tie rule), and unicode."""

from __future__ import annotations

import pytest

hypothesis = pytest.importorskip("hypothesis")
from hypothesis import HealthCheck, given, settings, strategies as st  # noqa: E402

from tests.conftest import run_op  # noqa: E402
from tests.test_cdc_chunk import _py_cdc  # noqa: E402
from tests.test_entropy import _py_entropy  # noqa: E402
from tests.test_winnow import _py_winnow  # noqa: E402

# small alphabet maximizes repeated grams (the tie-rule stress);
# includes a two-char token and unicode
WORDS = ["aa", "b", "c", "Ü", "aa.", "x9"]

DOC = st.lists(st.sampled_from(WORDS), min_size=0, max_size=24).map(" ".join)
CORPUS = st.lists(DOC, min_size=1, max_size=6)

_SETTINGS = dict(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)


@given(corpus=CORPUS, k=st.integers(1, 4), w=st.integers(1, 6))
@settings(**_SETTINGS)
def test_winnow_matches_python_on_random_corpora(ctx, spark, corpus, k, w):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = run_op(ctx, "text.winnow", [df], column="text",
                 id_column="doc_id", k=k, window=w)
    got: dict[int, set] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fingerprint"]))
    for i, t in enumerate(corpus):
        assert got.get(i, set()) == _py_winnow(t, k, w), (i, k, w)


@given(corpus=CORPUS, k=st.integers(1, 3), divisor=st.integers(2, 8))
@settings(**_SETTINGS)
def test_cdc_matches_python_on_random_corpora(ctx, spark, corpus, k, divisor):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = run_op(ctx, "text.cdc_chunk", [df], column="text",
                 id_column="doc_id", k=k, divisor=divisor)
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["chunk"], r["chunk_tokens"], r["chunk_hash"]))
    for i, t in enumerate(corpus):
        assert sorted(got.get(i, [])) == _py_cdc(t, k, divisor), (i, k, divisor)


@given(corpus=CORPUS)
@settings(**_SETTINGS)
def test_entropy_matches_python_on_random_corpora(ctx, spark, corpus):
    rows = [(i, t) for i, t in enumerate(corpus)]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    for unit in ("char", "token"):
        out = run_op(ctx, "text.entropy", [df], column="text", unit=unit)
        got = {r["doc_id"]: r["entropy"] for r in out.collect()}
        for i, t in enumerate(corpus):
            syms = list(t) if unit == "char" else \
                [x for x in t.lower().split() if x]
            exp = _py_entropy(syms)
            if exp is None:
                assert got[i] is None, (i, unit)
            else:
                assert got[i] == pytest.approx(exp, abs=1e-9), (i, unit)
