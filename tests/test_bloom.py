"""Tests for decontam.bloom (datapipe/bloom.py): both the inline-JVM
and broadcast-numpy check paths, vs the exact decontam.ngram result."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from conveyor_spark.datapipe.bloom import _size_filter
from tests.conftest import run_op


WORDS = "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima".split()


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    for i in range(40):
        # docs 0..9 contain the benchmark phrase verbatim; others are
        # distinct rotations so no 4-gram collides
        if i < 10:
            txt = "the quick brown fox jumps over the lazy dog " + " ".join(
                WORDS[(i + j) % 12] for j in range(6))
        else:
            txt = " ".join(WORDS[(i * 5 + j) % 12] + str(i) for j in range(12))
        rows.append((i, txt))
    return spark.createDataFrame(rows, ["doc_id", "text"])


@pytest.fixture(scope="module")
def bench(spark):
    return spark.createDataFrame(
        [(100, "the quick brown fox jumps over the lazy dog")], ["bid", "text"])


def test_size_filter_math():
    m, k, indep = _size_filter(1000, 0.01)
    assert m == 16384  # ~9.59 kbits ideal for 1k @ 1%, next pow2
    assert k == 11
    assert not indep  # orbit floor (448) below textbook m: double hashing
    m2, _, indep2 = _size_filter(1000, 1e-6)
    assert m2 > m
    assert indep2  # sqrt(2n/fpp)=44.7k > textbook 2^15: independent hashes
    assert _size_filter(1, 0.5)[0] == 1024  # floor
    # small-n tight-fpp regime stays at textbook sizing (inline path)
    m3, k3, indep3 = _size_filter(2400, 1e-9)
    assert indep3 and m3 == 1 << 17 and k3 == 16


def _flags(ctx, corpus, bench, **kw):
    out = run_op(ctx, "decontam.bloom", [corpus, bench], column="text",
                 id_column="doc_id", ngram=4, **kw)
    return {r["doc_id"]: r["contaminated"] for r in out.collect()}


def test_inline_path_matches_exact(ctx, corpus, bench):
    got = _flags(ctx, corpus, bench, fpp=1e-6)  # tiny m -> inline path
    exact = {r["doc_id"]: r["contaminated"] for r in run_op(
        ctx, "decontam.ngram", [corpus, bench], column="text",
        id_column="doc_id", ngram=4).collect()}
    assert got == exact
    assert sum(got.values()) == 10


def test_broadcast_join_path_matches_exact(ctx, corpus, bench):
    # inline_bits=1 forces the one-row broadcast-join path
    got = _flags(ctx, corpus, bench, fpp=1e-6, inline_bits=1)
    exact = {r["doc_id"]: r["contaminated"] for r in run_op(
        ctx, "decontam.ngram", [corpus, bench], column="text",
        id_column="doc_id", ngram=4).collect()}
    assert got == exact


def test_broadcast_join_plan_is_jvm_only(ctx, corpus, bench):
    out = run_op(ctx, "decontam.bloom", [corpus, bench], column="text",
                 id_column="doc_id", ngram=4, inline_bits=1)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" in plan
    for bad in ("ArrowEvalPython", "BatchEvalPython", "MapInPandas"):
        assert bad not in plan


def test_numpy_path_matches_exact(ctx, corpus, bench):
    # broadcast_bits=1 too -> forces the huge-filter numpy bit-gather
    got = _flags(ctx, corpus, bench, fpp=1e-6, inline_bits=1, broadcast_bits=1)
    exact = {r["doc_id"]: r["contaminated"] for r in run_op(
        ctx, "decontam.ngram", [corpus, bench], column="text",
        id_column="doc_id", ngram=4).collect()}
    assert got == exact


def test_partition_invariance(ctx, corpus, bench):
    a = _flags(ctx, corpus, bench)
    b = _flags(ctx, corpus.repartition(13), bench.repartition(3))
    assert a == b


def test_filter_mode_drops_and_removes_flag(ctx, corpus, bench):
    out = run_op(ctx, "decontam.bloom", [corpus, bench], column="text",
                 id_column="doc_id", ngram=4, mode="filter")
    assert out.columns == corpus.columns
    assert out.count() == 30
    assert {r["doc_id"] for r in out.select("doc_id").collect()} == set(range(10, 40))


def test_short_docs_never_flag(ctx, spark, bench):
    short = spark.createDataFrame([(1, "too short"), (2, "")], ["doc_id", "text"])
    got = _flags(ctx, short, bench)
    assert got == {1: False, 2: False}
    got2 = _flags(ctx, short, bench, inline_bits=1)
    assert got2 == {1: False, 2: False}


def test_expected_items_skips_sizing_job(ctx, corpus, bench):
    got = _flags(ctx, corpus, bench, expected_items=64)
    assert sum(got.values()) == 10


def test_config_errors(ctx, corpus, bench):
    with pytest.raises(ConfigError):
        run_op(ctx, "decontam.bloom", [corpus, bench], column="text",
               id_column="doc_id", fpp=2.0)
    with pytest.raises(ConfigError):
        run_op(ctx, "decontam.bloom", [corpus, bench], id_column="doc_id")
    with pytest.raises(ConfigError):
        run_op(ctx, "decontam.bloom", [corpus, bench], column="text",
               id_column="doc_id", mode="nope")
