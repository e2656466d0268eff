"""r14 build-phase memo contracts (clustering.py).

Three memos cut driver-job count in the IVFPQ compositions; each has
an invariant a future edit could silently break:

- `_collect_once`: the local-rows ride-along on kmeans/pq output
  frames must agree VALUE-FOR-VALUE with a real collect of the same
  frame (the parser consumes whichever is present).
- `_init_vectors`: one collect per (ctx, frame, projection) — shared
  within a build, NEVER across OpContexts (a cross-build share would
  be result caching across bench runs).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from conveyor_spark.registry import OpContext

from tests.conftest import run_op


def test_local_rows_match_a_real_collect(ctx, spark, sf_dir):
    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    cents = run_op(ctx, "embedding.kmeans", [e], id_column="vec_id",
                   column="embedding", k=4, iterations=1, dim=64,
                   output="centroids")
    local = cents._conveyor_local_rows
    collected = cents.select("cluster", "centroid", "size").collect()
    assert len(local) == len(collected) == 4
    for lr, cr in zip(sorted(local, key=lambda r: r["cluster"]),
                      sorted(collected, key=lambda r: r["cluster"])):
        assert lr["cluster"] == cr["cluster"]
        assert lr["size"] == cr["size"]
        assert list(lr["centroid"]) == list(cr["centroid"])  # bitwise

    books = run_op(ctx, "embedding.pq", [e], id_column="vec_id",
                   column="embedding", m=4, k=4, iterations=1, dim=64,
                   output="codebooks")
    local = books._conveyor_local_rows
    collected = books.select("subspace", "code", "centroid").collect()
    key = lambda r: (r["subspace"], r["code"])  # noqa: E731
    assert len(local) == len(collected) == 16
    for lr, cr in zip(sorted(local, key=key), sorted(collected, key=key)):
        assert key(lr) == key(cr)
        assert list(lr["centroid"]) == list(cr["centroid"])


def test_init_vectors_shared_within_but_not_across_builds(spark, sf_dir):
    from conveyor_spark.datapipe.clustering import _init_vectors

    e = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    clean = e.select(F.col("vec_id").alias("__kid"),
                     F.col("embedding").alias("__v"))
    ctx1 = OpContext(spark=spark)
    a = _init_vectors(ctx1, e, clean, 4, "vec_id", "embedding", 64)
    b = _init_vectors(ctx1, e, clean, 4, "vec_id", "embedding", 64)
    assert a is b  # same build, same key: one collect, shared rows
    # a different projection key misses
    c = _init_vectors(ctx1, e, clean, 3, "vec_id", "embedding", 64)
    assert c is not a and len(c) == 3
    # a NEW context (a fresh query build / bench repeat) collects fresh
    ctx2 = OpContext(spark=spark)
    d = _init_vectors(ctx2, e, clean, 4, "vec_id", "embedding", 64)
    assert d is not a
    assert [list(r[0]) for r in d] == [list(r[0]) for r in a]  # same values
