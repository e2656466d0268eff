"""Tests for embedding.normalize / embedding.quantize
(datapipe/embedding.py)."""

from __future__ import annotations

import math

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


@pytest.fixture(scope="module")
def vecs(spark):
    rows = [
        (1, [3.0, 4.0]),
        (2, [0.0, 0.0]),
        (3, [-1.0, 1.0]),
        (4, [0.5, -2.5]),
    ]
    from pyspark.sql import types as T
    schema = T.StructType([
        T.StructField("vec_id", T.LongType()),
        T.StructField("embedding", T.ArrayType(T.FloatType())),
    ])
    return spark.createDataFrame(rows, schema)


def test_normalize_unit_length(ctx, vecs):
    out = {r["vec_id"]: r for r in run_op(
        ctx, "embedding.normalize", [vecs], column="embedding",
        output_column="unit", norm_column="nrm").collect()}
    assert out[1]["nrm"] == pytest.approx(5.0)
    assert out[1]["unit"] == pytest.approx([0.6, 0.8])
    # zero vector: unchanged, norm 0, no division error
    assert out[2]["nrm"] == 0.0 and out[2]["unit"] == [0.0, 0.0]
    for vid in (3, 4):
        assert math.hypot(*out[vid]["unit"]) == pytest.approx(1.0)


def test_normalize_overwrites_in_place_by_default(ctx, vecs):
    out = run_op(ctx, "embedding.normalize", [vecs], column="embedding")
    assert out.columns == ["vec_id", "embedding"]
    row = {r["vec_id"]: r["embedding"] for r in out.collect()}
    assert row[1] == pytest.approx([0.6, 0.8])


def test_quantize_roundtrip_error_bounded(ctx, vecs):
    out = {r["vec_id"]: r for r in run_op(
        ctx, "embedding.quantize", [vecs], column="embedding").collect()}
    r = out[4]
    assert r["embedding_scale"] == pytest.approx(2.5 / 127)
    deq = [q * r["embedding_scale"] for q in r["embedding_q8"]]
    for orig, back in zip([0.5, -2.5], deq):
        assert abs(orig - back) <= r["embedding_scale"] / 2 + 1e-12
    # extremes hit +-127 exactly
    assert out[1]["embedding_q8"][1] == 127
    assert max(abs(q) for q in out[3]["embedding_q8"]) == 127
    # zero vector: zero codes, zero scale
    assert out[2]["embedding_q8"] == [0, 0] and out[2]["embedding_scale"] == 0.0


def test_quantize_output_is_tinyint(ctx, vecs):
    out = run_op(ctx, "embedding.quantize", [vecs], column="embedding",
                 output_column="q", scale_column="s")
    dt = dict(out.dtypes)
    assert dt["q"] == "array<tinyint>" and dt["s"] == "double"


def test_knn_lsh_gemm_signature_parity(ctx, spark):
    """signature_method='gemm' must produce the SAME result frame as
    'fold' — BLAS changes summation order, but the sign margins of
    any real corpus dwarf double rounding (test data: >= 8.8e-6 vs
    ~1e-13)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(id_column="vec_id", k=3, dim=64, bits=24, bands=4)
    a = run_op(ctx, "knn.lsh", [e], signature_method="fold", **kw)
    b = run_op(ctx, "knn.lsh", [e], signature_method="gemm", **kw)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b and len(rows_a) > 0


def test_knn_lsh_pq_verify_unbounded_rerank_equals_exact(ctx, spark):
    """verify='pq' with a rerank cap above the candidate count keeps
    EVERY candidate through the screen — the exact re-rank must then
    reproduce verify='exact' row-for-row (the screen may reorder, it
    must never rescore)."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(id_column="vec_id", k=3, dim=64, bits=24, bands=4)
    a = run_op(ctx, "knn.lsh", [e], **kw)
    b = run_op(ctx, "knn.lsh", [e], verify="pq", m=4, codewords=4,
               iterations=1, rerank=10**6, **kw)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b and len(rows_a) > 0


def test_knn_lsh_pq_verify_pretrained_matches_inline(ctx, spark):
    """code_column + codebooks last input (the train-once deployment)
    must reproduce inline training exactly: embedding.pq's encode is
    the same argmin as _train_pq's final assign."""
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(id_column="vec_id", k=3, dim=64, bits=24, bands=4,
              verify="pq", m=4, codewords=4, rerank=6)
    inline = run_op(ctx, "knn.lsh", [e], iterations=1, **kw)
    books = run_op(ctx, "embedding.pq", [e], id_column="vec_id", m=4, k=4,
                   iterations=1, output="codebooks")
    coded = run_op(ctx, "embedding.pq", [e], id_column="vec_id", m=4, k=4,
                   iterations=1, output="codes")
    pre = run_op(ctx, "knn.lsh", [coded, books], code_column="pq_code", **kw)
    assert sorted(map(tuple, inline.collect())) == \
        sorted(map(tuple, pre.collect()))


def test_gemm_encode_codes_bit_matches_fold(ctx, spark):
    """gemm_encode_codes (Arrow numpy argmin) must reproduce the JVM
    fold's codes EXACTLY — per-dim sequential accumulation makes
    every distance double identical, and np.argmin's first-occurrence
    tie matches array_position's ties-to-lowest. Checked code-by-code
    on the full table."""
    from conveyor_spark.datapipe.clustering import (
        _pq_clean, _train_pq, gemm_encode_codes,
    )
    from pyspark.sql import functions as F

    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    clean, dim = _pq_clean(e, "vec_id", "embedding", 64)
    codebooks, encoded = _train_pq(ctx, clean, 64, 4, 16, 1)
    fold = {
        r["__kid"]: tuple(r["c"])
        for r in encoded.select(
            "__kid", F.array(*[f"__c{s}" for s in range(4)]).alias("c")
        ).collect()
    }
    gemm = {
        r["vec_id"]: tuple(r["code"])
        for r in gemm_encode_codes(
            clean, "__kid", "__v", "vec_id", "code", codebooks, 4, 16
        ).collect()
    }
    assert fold == gemm and len(fold) == 500


def test_knn_lsh_pq_verify_gemm_encode_matches_fold(ctx, spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(id_column="vec_id", k=3, dim=64, bits=24, bands=4,
              verify="pq", m=4, codewords=4, iterations=1, rerank=6)
    a = run_op(ctx, "knn.lsh", [e], encode_method="fold", **kw)
    b = run_op(ctx, "knn.lsh", [e], encode_method="gemm", **kw)
    rows_a = sorted(map(tuple, a.collect()))
    rows_b = sorted(map(tuple, b.collect()))
    assert rows_a == rows_b and len(rows_a) > 0


def test_knn_lsh_pq_verify_validates(ctx, spark):
    e = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    kw = dict(id_column="vec_id", k=3, dim=64, bits=24, bands=4)
    # PQ knobs are dead config under verify='exact' — loud failure
    for dead in ({"rerank": 6}, {"m": 8}, {"codewords": 8},
                 {"iterations": 2}, {"code_column": "pq_code"}):
        with pytest.raises(ConfigError, match="verify='pq'"):
            run_op(ctx, "knn.lsh", [e], **kw, **dead)
    # a rerank below k could never fill the requested top-k
    with pytest.raises(ConfigError, match="rerank"):
        run_op(ctx, "knn.lsh", [e], verify="pq", rerank=2, **kw)
    # code_column without the codebooks input
    with pytest.raises(ConfigError, match="codebooks"):
        run_op(ctx, "knn.lsh", [e], verify="pq", code_column="pq_code", **kw)
    # encode_method is dead config in pretrained mode (corpus already
    # encoded) — loud failure, same doctrine as the blocking knobs
    books = run_op(ctx, "embedding.pq", [e], id_column="vec_id", m=4, k=4,
                   iterations=1, output="codebooks")
    coded = run_op(ctx, "embedding.pq", [e], id_column="vec_id", m=4, k=4,
                   iterations=1, output="codes")
    with pytest.raises(ConfigError, match="pretrained"):
        run_op(ctx, "knn.lsh", [coded, books], verify="pq",
               code_column="pq_code", encode_method="gemm", **kw)
    # iterations is equally dead in pretrained mode (no training runs)
    with pytest.raises(ConfigError, match="pretrained"):
        run_op(ctx, "knn.lsh", [coded, books], verify="pq",
               code_column="pq_code", iterations=2, **kw)
    # a third (codebooks) input without code_column would be silently
    # ignored and codebooks inline-trained — loud failure instead
    # (two inputs stay legal: [corpus, queries])
    with pytest.raises(ConfigError, match="code_column"):
        run_op(ctx, "knn.lsh", [coded, coded, books], verify="pq", **kw)
    # SDC literal-table budget
    with pytest.raises(ConfigError, match="65536"):
        run_op(ctx, "knn.lsh", [e], verify="pq", m=16, codewords=256, **kw)


def test_signature_frame_gemm_matches_fold_on_adversarial_vectors(ctx, spark):
    """Hypothesis-style adversarial shapes: NULL vectors, wrong
    lengths, zeros — gemm drops exactly the rows whose fold signature
    is NULL, and agrees bit-for-bit on the rest."""
    from conveyor_spark.datapipe.emb_lsh import signature_frame

    rows = [
        (1, [float(i) for i in range(64)]),
        (2, [(-1.0) ** i * 0.001 for i in range(64)]),
        (3, None),
        (4, [1.0, 2.0]),            # wrong length
        (5, [0.0] * 64),            # all-zero: dots exactly 0 -> bits 0
    ]
    df = spark.createDataFrame(rows, "vec_id INT, embedding ARRAY<DOUBLE>")
    fold = {
        r["vid"]: r["__sig"]
        for r in signature_frame(df, "vec_id", "vid", "embedding", 16, 64,
                                 "fold").collect()
        if r["__sig"] is not None
    }
    gemm = {
        r["vid"]: r["__sig"]
        for r in signature_frame(df, "vec_id", "vid", "embedding", 16, 64,
                                 "gemm").collect()
    }
    assert set(fold) == {1, 2, 5} and gemm == fold
