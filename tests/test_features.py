"""feature.hashing (features.py) against a plain-Python reference of
the same portable-hash bucketing."""

from __future__ import annotations

import hashlib
import re

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def h60(token: str) -> int:
    return int(hashlib.md5(token.encode()).hexdigest()[:15], 16)


def ref_features(text, dim, signed=True):
    if text is None:
        return None
    out: dict[int, int] = {}
    for t in re.split(r"\s+", text.lower()):
        if not t:
            continue
        h = h60(t)
        s = (1 if (h >> 40) & 1 else -1) if signed else 1
        out[h % dim] = out.get(h % dim, 0) + s
    return {i: v for i, v in sorted(out.items()) if v != 0}


ROWS = [
    (1, "the cat and the hat"),
    (2, None),
    (3, ""),
    (4, "a a a b mixed CASE case"),
    (5, "one two three four five six seven eight nine ten " * 3),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id LONG, text STRING")


@pytest.mark.parametrize("signed", [True, False])
def test_sparse_matches_reference(ctx, docs, signed):
    out = {r["doc_id"]: r for r in run_op(
        ctx, "feature.hashing", [docs], column="text", dim=16,
        signed=signed).collect()}
    for i, text in ROWS:
        ref = ref_features(text, 16, signed)
        row = out[i]
        if ref is None:
            assert row["indices"] is None and row["values"] is None
            continue
        assert row["indices"] == list(ref), i
        assert row["values"] == [float(v) for v in ref.values()], i


def test_dense_matches_sparse(ctx, docs):
    dense = {r["doc_id"]: r["features"] for r in run_op(
        ctx, "feature.hashing", [docs], column="text", dim=16,
        output="dense").collect()}
    for i, text in ROWS:
        ref = ref_features(text, 16)
        if ref is None:
            assert dense[i] is None
            continue
        assert dense[i] == [float(ref.get(j, 0)) for j in range(16)], i


def test_sign_cancellation_dropped(ctx, spark):
    """Two tokens in the same bucket with opposite signs cancel to an
    exact zero, which must be dropped (HashingVectorizer semantics)."""
    # find two tokens colliding at dim=2 with opposite signs
    toks, seen = [], {}
    for n in range(1000):
        t = f"tok{n}"
        h = h60(t)
        key = h % 2
        s = 1 if (h >> 40) & 1 else -1
        if key in seen and seen[key][1] == -s:
            toks = [seen[key][0], t]
            bucket = key
            break
        seen.setdefault(key, (t, s))
    assert toks, "no opposite-sign collision found in 1000 tokens"
    df = spark.createDataFrame([(1, " ".join(toks))],
                               "doc_id LONG, text STRING")
    row = run_op(ctx, "feature.hashing", [df], column="text",
                 dim=2).collect()[0]
    assert bucket not in row["indices"]


def test_errors(ctx, docs):
    with pytest.raises(ConfigError, match="no column"):
        run_op(ctx, "feature.hashing", [docs], column="nope")
    with pytest.raises(ConfigError, match="dense output capped"):
        run_op(ctx, "feature.hashing", [docs], column="text",
               dim=100000, output="dense")
    with pytest.raises(ConfigError, match="sparse|dense"):
        run_op(ctx, "feature.hashing", [docs], column="text",
               output="banana")


def test_output_column_clash_raises(ctx, spark):
    df = spark.createDataFrame([(1, "t", [0])],
                               "doc_id LONG, text STRING, indices ARRAY<INT>")
    with pytest.raises(ConfigError, match="would overwrite"):
        run_op(ctx, "feature.hashing", [df], column="text")
    # renaming resolves it
    out = run_op(ctx, "feature.hashing", [df], column="text",
                 indices_column="fh_idx", values_column="fh_val")
    assert "fh_idx" in out.columns
