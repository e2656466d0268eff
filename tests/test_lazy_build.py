"""Plan construction must not run Spark jobs.

At 100 TB every driver round-trip during plan BUILD (a .count(), a
.first(), an RDD materialization) is a synchronous stall before any
work is scheduled. These tests pin the fixed eager-action bugs:
max_df doc counting (now a lazy broadcast total), embedding.lsh dim
inference (now opt-in), and the global-index offsets (lazy broadcast
aggregates)."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from conveyor_spark.transforms.global_index import global_sequence
from tests.conftest import run_op


def _jobs_run(spark) -> int:
    """Total jobs submitted so far (DAGScheduler's job id counter)."""
    return spark.sparkContext._jsc.sc().dagScheduler().nextJobId()


@pytest.fixture()
def docs(spark, sf_dir):
    return spark.read.parquet(f"{sf_dir}/documents.parquet")


def _assert_no_jobs(spark, build):
    before = _jobs_run(spark)
    df = build()
    df.schema  # force analysis (not execution)
    assert _jobs_run(spark) == before, "plan build ran a Spark job"
    return df


def test_jaccard_pruned_builds_lazily(ctx, spark, docs):
    _assert_no_jobs(spark, lambda: run_op(
        ctx, "dedup.ngram_jaccard", [docs], column="text", id_column="doc_id",
        shingle="word", ngram=3, threshold=0.5))


def test_minhash_builds_lazily(ctx, spark, docs):
    _assert_no_jobs(spark, lambda: run_op(
        ctx, "dedup.minhash", [docs], column="text", id_column="doc_id",
        num_hashes=8, bands=2))


def test_global_index_builds_lazily(ctx, spark, docs):
    _assert_no_jobs(spark, lambda: global_sequence(docs, ["doc_id"], "seq"))
    _assert_no_jobs(spark, lambda: run_op(
        ctx, "chunk.apply", [docs], batch_size=100, order_by="doc_id"))


def test_embedding_lsh_requires_dim(ctx, spark, sf_dir):
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
    _assert_no_jobs(spark, lambda: run_op(
        ctx, "embedding.lsh", [emb], column="embedding", bits=8, dim=64))
    with pytest.raises(ConfigError, match="infer_dim"):
        run_op(ctx, "embedding.lsh", [emb], column="embedding", bits=8)
    # explicit opt-in to the inference job still works
    out = run_op(ctx, "embedding.lsh", [emb], column="embedding", bits=8, infer_dim=True)
    assert "lsh_sig" in out.columns


def test_widen_override(ctx, spark, docs):
    from conveyor_spark.datapipe.dedup import widen

    assert widen(ctx, docs, {"widen": False}) is docs
    forced = widen(ctx, docs, {"widen": 7})
    assert forced.rdd.getNumPartitions() == 7
