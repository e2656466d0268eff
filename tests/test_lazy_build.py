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


def test_widen_spreads_single_file_scan(ctx, spark, docs):
    """Auto-widen must repartition a one-file local scan up to cluster
    parallelism, without touching private JVM surface or running jobs."""
    from conveyor_spark.datapipe.dedup import widen

    wide = _assert_no_jobs(spark, lambda: widen(ctx, docs, {}))
    assert wide.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism


class _NoJdfFrame:
    """Stand-in for a Spark-Connect DataFrame: public API delegates,
    direct `_jdf` access (the private classic-only surface) raises."""

    def __init__(self, df):
        object.__setattr__(self, "_df", df)

    def __getattr__(self, name):
        if name == "_jdf":
            raise AttributeError("no _jdf on Spark-Connect DataFrames")
        return getattr(object.__getattribute__(self, "_df"), name)


def test_widen_works_without_jdf(ctx, spark, docs):
    """Spark-Connect sessions expose no _jdf; widen's auto path must
    probe the scan via public API only (inputFiles + conf)."""
    from conveyor_spark.datapipe.dedup import widen

    wide = widen(ctx, _NoJdfFrame(docs), {})
    # single-file local scan -> widened to cluster parallelism
    assert wide.rdd.getNumPartitions() >= spark.sparkContext.defaultParallelism
    # and every dedup plan still builds on the real frame (auto path)
    for op, cfg in [
        ("dedup.exact", {"columns": ["text"], "id_column": "doc_id"}),
        ("dedup.minhash", {"column": "text", "id_column": "doc_id",
                           "num_hashes": 8, "bands": 2}),
        ("dedup.simhash", {"column": "text"}),
        ("dedup.ngram_jaccard", {"column": "text", "id_column": "doc_id",
                                 "shingle": "word", "ngram": 3,
                                 "threshold": 0.5}),
    ]:
        run_op(ctx, op, [docs], **cfg).schema  # force analysis
