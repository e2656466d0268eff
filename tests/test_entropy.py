"""text.entropy vs the math: exact Shannon entropy over char/token
histograms, edge cases (empty, single-symbol, NULL)."""

from __future__ import annotations

import math
from collections import Counter

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def _py_entropy(symbols) -> float | None:
    n = len(symbols)
    if n == 0:
        return None
    cnt = Counter(symbols)
    h = math.log(n) - sum(c * math.log(c) for c in cnt.values()) / n
    return round(h, 9)


ROWS = [
    (1, "aaaa"),                      # one symbol: H = 0
    (2, "abab"),                      # uniform 2: H = ln 2
    (3, "the quick brown fox"),
    (4, ""),                          # empty: NULL
    (5, None),                        # NULL: NULL
    (6, "aAbB 09!?"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id LONG, text STRING")


def test_entropy_char(ctx, docs):
    out = run_op(ctx, "text.entropy", [docs], column="text")
    got = {r["doc_id"]: r["entropy"] for r in out.collect()}
    for i, t in ROWS:
        exp = _py_entropy(list(t)) if t is not None else None
        if exp is None:
            assert got[i] is None, i
        else:
            assert got[i] == pytest.approx(exp, abs=1e-9), i
    assert got[1] == 0.0
    assert got[2] == pytest.approx(round(math.log(2), 9), abs=1e-9)


def test_entropy_token(ctx, docs):
    out = run_op(ctx, "text.entropy", [docs], column="text", unit="token")
    got = {r["doc_id"]: r["entropy"] for r in out.collect()}
    for i, t in ROWS:
        toks = [x for x in t.lower().split() if x] if t is not None else []
        exp = _py_entropy(toks)
        if exp is None:
            assert got[i] is None, i
        else:
            assert got[i] == pytest.approx(exp, abs=1e-9), i


def test_entropy_separates_noise_from_boilerplate(ctx, spark):
    d = spark.createDataFrame(
        [(1, "buy now " * 30), (2, "k9#Qz@1xV!mP4&wL0s^Gn7*Td2")],
        "doc_id LONG, text STRING")
    out = run_op(ctx, "text.entropy", [d], column="text")
    got = {r["doc_id"]: r["entropy"] for r in out.collect()}
    assert got[2] > got[1] + 1.0


def test_entropy_errors(ctx, docs):
    with pytest.raises(ConfigError, match="column"):
        run_op(ctx, "text.entropy", [docs])
    with pytest.raises(ConfigError, match="unit"):
        run_op(ctx, "text.entropy", [docs], column="text", unit="byte")
    with pytest.raises(ConfigError, match="overwrite"):
        run_op(ctx, "text.entropy", [docs], column="text",
               output_column="text")


def _py_gini(symbols) -> float | None:
    n = len(symbols)
    if n == 0:
        return None
    cnt = sorted(Counter(symbols).values())
    m = len(cnt)
    s = sum((i + 1) * c for i, c in enumerate(cnt))
    return 2.0 * s / (m * n) - (m + 1) / m


def test_gini_matches_reference(ctx, docs):
    for unit in ("char", "token"):
        out = run_op(ctx, "text.gini", [docs], column="text", unit=unit)
        got = {r["doc_id"]: r["gini"] for r in out.collect()}
        for i, t in ROWS:
            if t is None:
                syms = []
            else:
                syms = list(t) if unit == "char" else \
                    [x for x in t.lower().split() if x]
            exp = _py_gini(syms)
            if exp is None:
                assert got[i] is None, (unit, i)
            else:
                assert got[i] == pytest.approx(exp, abs=1e-12), (unit, i)


def test_gini_uniform_vs_skewed(ctx, spark):
    d = spark.createDataFrame(
        [(1, "a b c d e f g h"),            # uniform: G = 0
         (2, "spam " * 50 + "a b c")],       # one dominant token
        "doc_id LONG, text STRING")
    out = run_op(ctx, "text.gini", [d], column="text", unit="token")
    got = {r["doc_id"]: r["gini"] for r in out.collect()}
    assert got[1] == 0.0
    assert got[2] > 0.5


def test_gini_errors(ctx, docs):
    with pytest.raises(ConfigError, match="unit"):
        run_op(ctx, "text.gini", [docs], column="text", unit="byte")
    with pytest.raises(ConfigError, match="overwrite"):
        run_op(ctx, "text.gini", [docs], column="text",
               output_column="text")
