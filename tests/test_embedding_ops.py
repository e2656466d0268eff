"""Tests for embedding.normalize / embedding.quantize
(datapipe/embedding.py)."""

from __future__ import annotations

import math

import pytest

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
