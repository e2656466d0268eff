"""mine.bitext (mining.py) against a plain-Python margin-mining
reference."""

from __future__ import annotations

import math

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def py_margin(src: dict, tgt: dict, k: int):
    """Mirror mining.py: round-6 cosines, rank-ordered top-k means,
    the margin formula, best matches with id tie-break."""
    def cos(a, b):
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), 6)

    pairs = {(i, j): cos(a, b) for i, a in src.items()
             for j, b in tgt.items()}

    def topk_mean(keys, other_of, key_of):
        out = {}
        for key in keys:
            cands = sorted(
                ((c, other_of(p)) for p, c in pairs.items()
                 if key_of(p) == key),
                key=lambda t: (-t[0], t[1]),
            )[:k]
            out[key] = sum(c for c, _ in cands) / len(cands)
        return out

    sa = topk_mean(src, lambda p: p[1], lambda p: p[0])
    ta = topk_mean(tgt, lambda p: p[0], lambda p: p[1])
    margins = {
        p: round(c / ((sa[p[0]] + ta[p[1]]) * 0.5), 9)
        for p, c in pairs.items()
    }
    best_s = {
        i: min(((-(margins[(i, j)]), j) for j in tgt))[1] for i in src
    }
    best_t = {
        j: min(((-(margins[(i, j)]), i) for i in src))[1] for j in tgt
    }
    return pairs, margins, best_s, best_t


@pytest.fixture(scope="module")
def corpora(spark):
    import numpy as np

    src = {i: [float(np.float32(math.sin(i + d))) for d in range(4)]
           for i in range(0, 10, 2)}
    tgt = {j: [float(np.float32(math.sin(j - 1 + d) + 0.01 * j))
               for d in range(4)]
           for j in range(1, 11, 2)}
    mk = lambda m: spark.createDataFrame(
        [(i, v) for i, v in m.items()], "vec_id LONG, embedding ARRAY<FLOAT>")
    return mk(src), mk(tgt), src, tgt


def test_bitext_matches_python(ctx, corpora):
    sdf, tdf, src, tgt = corpora
    pairs, margins, best_s, best_t = py_margin(src, tgt, k=3)
    out = run_op(ctx, "mine.bitext", [sdf, tdf], id_column="vec_id",
                 k=3, mutual=False, threshold=-99.0)
    got = {r["src_vec_id"]: (r["tgt_vec_id"], r["cosine"], r["margin"])
           for r in out.collect()}
    assert set(got) == set(src)
    for i, (j, c, m) in got.items():
        assert j == best_s[i], i
        assert c == pytest.approx(pairs[(i, j)], abs=1e-9)
        assert m == pytest.approx(margins[(i, j)], abs=1e-9)

    # mutual mode keeps only reciprocal best pairs
    out_m = run_op(ctx, "mine.bitext", [sdf, tdf], id_column="vec_id",
                   k=3, mutual=True, threshold=-99.0)
    got_m = {(r["src_vec_id"], r["tgt_vec_id"]) for r in out_m.collect()}
    exp_m = {(i, j) for i, j in best_s.items() if best_t[j] == i}
    assert got_m == exp_m


def test_bitext_threshold_and_errors(ctx, corpora, spark):
    sdf, tdf, *_ = corpora
    hi = run_op(ctx, "mine.bitext", [sdf, tdf], id_column="vec_id",
                mutual=False, threshold=99.0)
    assert hi.count() == 0
    with pytest.raises(ConfigError, match="source has no column"):
        run_op(ctx, "mine.bitext", [sdf.drop("embedding"), tdf],
               id_column="vec_id")
    with pytest.raises(ConfigError, match="'k'|k must"):
        run_op(ctx, "mine.bitext", [sdf, tdf], id_column="vec_id", k=0)
    # zero-norm vectors excluded, not a divide-by-zero crash
    z = spark.createDataFrame([(99, [0.0] * 4)],
                              "vec_id LONG, embedding ARRAY<FLOAT>")
    out = run_op(ctx, "mine.bitext", [sdf.union(z), tdf],
                 id_column="vec_id", mutual=False, threshold=-99.0)
    assert 99 not in {r["src_vec_id"] for r in out.collect()}


def test_bitext_zero_denominator_is_null_not_crash(ctx, spark):
    """Every cross-side cosine exactly 0 -> both neighborhood means 0
    -> the margin denominator is 0. Must yield NULL margins (pairs
    dropped by any threshold), not an ANSI DIVIDE_BY_ZERO."""
    src = spark.createDataFrame(
        [(0, [1.0, 0.0]), (2, [2.0, 0.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    tgt = spark.createDataFrame(
        [(1, [0.0, 1.0]), (3, [0.0, 2.0])],
        "vec_id LONG, embedding ARRAY<DOUBLE>")
    out = run_op(ctx, "mine.bitext", [src, tgt], id_column="vec_id",
                 k=2, mutual=False, threshold=-99.0)
    assert out.collect() == []


def test_bitext_dedup_pairs_band_exploded(ctx, spark):
    """One id in several buckets (exploded LSH bands): without
    dedup_pairs the duplicate candidate rows inflate the top-k
    neighborhood means; with it the result matches the single-bucket
    run exactly."""
    vecs = {0: [1.0, 0.1], 2: [0.2, 1.0], 1: [1.0, 0.2], 3: [0.1, 1.0]}
    one = lambda ids: spark.createDataFrame(
        [(i, vecs[i], "b0") for i in ids],
        "vec_id LONG, embedding ARRAY<DOUBLE>, band STRING")
    two = lambda ids: spark.createDataFrame(
        [(i, vecs[i], b) for i in ids for b in ("b0", "b1")],
        "vec_id LONG, embedding ARRAY<DOUBLE>, band STRING")
    base = run_op(ctx, "mine.bitext", [one([0, 2]), one([1, 3])],
                  id_column="vec_id", bucket_column="band", k=2,
                  mutual=False, threshold=-99.0)
    deduped = run_op(ctx, "mine.bitext", [two([0, 2]), two([1, 3])],
                     id_column="vec_id", bucket_column="band", k=2,
                     mutual=False, threshold=-99.0, dedup_pairs=True)
    key = lambda df: sorted(map(tuple, df.collect()))
    assert key(deduped) == key(base)
