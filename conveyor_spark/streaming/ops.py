"""Streaming building blocks (batch-testable via availableNow).

The reference's streaming operators (stdin_stream, file_watch,
window.apply, aggregate.stream, stdout_stream.write) compose here as
Structured Streaming plans. Everything is testable offline: a file
stream + ``Trigger.AvailableNow`` drains existing data and stops, so
pytest and the oracle harness can exercise real streaming plans
deterministically.
"""

from __future__ import annotations

import tempfile
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError


def read_file_stream(
    spark: SparkSession,
    path: str,
    schema: Any,
    fmt: str = "parquet",
    options: dict[str, str] | None = None,
) -> DataFrame:
    """File-source stream (reference file_watch: poll+re-emit a file;
    Spark's file source tails a directory/glob natively and tracks
    processed files exactly-once)."""
    reader = spark.readStream.schema(schema)
    for k, v in (options or {}).items():
        reader = reader.option(k, v)
    return reader.format(fmt).load(path)


def windowed_aggregate(
    sdf: DataFrame,
    time_column: str,
    window_size: str,
    aggs: list[tuple[str, str, str]],
    group_by: list[str] | None = None,
    slide: str | None = None,
    watermark: str | None = "1 hour",
    session_gap: str | None = None,
) -> DataFrame:
    """groupBy(window(ts, size[, slide]) | session_window, *keys).agg(...)

    aggs: list of (column, operation, output_name). Watermark bounds
    state (late data beyond it is dropped) — the reference has no
    equivalent (no event time at all).
    """
    from conveyor_spark.transforms.group_by import build_agg

    if watermark:
        sdf = sdf.withWatermark(time_column, watermark)
    if session_gap:
        win = F.session_window(F.col(time_column), session_gap)
    elif slide:
        win = F.window(F.col(time_column), window_size, slide)
    else:
        win = F.window(F.col(time_column), window_size)
    keys = [win, *[F.col(c) for c in (group_by or [])]]
    exprs = [build_agg(c, op).alias(name) for c, op, name in aggs]
    if not exprs:
        raise ConfigError("windowed_aggregate requires at least one aggregation")
    out = sdf.groupBy(*keys).agg(*exprs)
    wcol = next((c for c in ("window", "session_window") if c in out.columns), None)
    if wcol is None:
        return out
    return out.select(
        F.col(f"{wcol}.start").alias("window_start"),
        F.col(f"{wcol}.end").alias("window_end"),
        *[c for c in out.columns if c != wcol],
    )


def stream_dedup(
    sdf: DataFrame,
    keys: list[str],
    time_column: str | None = None,
    watermark: str = "1 hour",
) -> DataFrame:
    """Streaming deduplication: exactly-once keys across micro-batches.

    With a time column, `dropDuplicatesWithinWatermark` bounds the
    dedup state to the watermark horizon (state for keys older than
    the watermark is evicted — mandatory for unbounded streams; the
    batch dedup ops have no state to bound). Without one, state grows
    with distinct keys forever — only for finite streams.
    """
    if time_column:
        return sdf.withWatermark(time_column, watermark).dropDuplicatesWithinWatermark(keys)
    return sdf.dropDuplicates(keys)


from conveyor_spark.registry import OpContext, register


@register("stream.dedup", kind="transform", streaming_capable=True, doc="Watermark-bounded streaming dedup")
def stream_dedup_op(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    keys = config.get("columns") or config.get("keys")
    if not keys:
        raise ConfigError("stream.dedup requires 'columns'")
    keys = [keys] if isinstance(keys, str) else list(keys)
    return stream_dedup(
        inputs[0], keys, config.get("time_column"), config.get("watermark", "1 hour")
    )


def run_available_now(
    sdf: DataFrame, query_name: str, output_mode: str = "complete"
) -> DataFrame:
    """Drain all available input through a streaming plan into an
    in-memory table and return it as a (batch) DataFrame."""
    with tempfile.TemporaryDirectory(prefix="conveyor-ckpt-") as ckpt:
        q = (
            sdf.writeStream.format("memory")
            .queryName(query_name)
            .outputMode(output_mode)
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return sdf.sparkSession.table(query_name)
