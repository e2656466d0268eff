"""Structured Streaming surface (availableNow => deterministic)."""

from __future__ import annotations

from pyspark.sql import functions as F

from conveyor_spark.streaming.ops import (
    read_file_stream,
    run_available_now,
    windowed_aggregate,
)


def test_stream_matches_batch_tumbling(spark, sf_dir):
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    sdf = read_file_stream(
        spark, sf_dir, batch.schema, "parquet",
        options={"pathGlobFilter": "events.parquet"},
    )
    def fix_ts(df):
        if dict(df.dtypes).get("ts") == "bigint":
            return df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
        return df

    agg = windowed_aggregate(
        fix_ts(sdf), "ts", "1 hour",
        aggs=[("event_id", "count", "n_events")], watermark="2 hours",
    )
    stream_result = run_available_now(agg, "t_stream_tumbling")
    expected = (
        fix_ts(batch)
        .groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(F.count("event_id").alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )
    got = {(r["window_start"], r["n_events"]) for r in stream_result.select("window_start", "n_events").collect()}
    want = {(r["window_start"], r["n_events"]) for r in expected.collect()}
    assert got == want and len(got) > 0


def test_stream_session_window(spark, sf_dir):
    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    sdf = read_file_stream(
        spark, sf_dir, batch.schema, "parquet",
        options={"pathGlobFilter": "events.parquet"},
    )
    if dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    agg = windowed_aggregate(
        sdf, "ts", "", aggs=[("event_id", "count", "n")],
        group_by=["user_id"], watermark="2 hours", session_gap="30 minutes",
    )
    out = run_available_now(agg, "t_stream_session")
    assert out.count() > 0
    assert {"window_start", "window_end", "user_id", "n"} <= set(out.columns)


def test_stream_dedup(spark, sf_dir):
    from conveyor_spark.streaming.ops import (
        read_file_stream,
        run_available_now,
        stream_dedup,
    )

    batch = spark.read.parquet(f"{sf_dir}/events.parquet")
    sdf = read_file_stream(
        spark, sf_dir, batch.schema, "parquet",
        options={"pathGlobFilter": "events.parquet"},
    )
    if dict(sdf.dtypes).get("ts") == "bigint":
        sdf = sdf.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    deduped = stream_dedup(sdf, ["user_id"], time_column="ts", watermark="10 days")
    out = run_available_now(deduped.select("user_id"), "t_stream_dedup", output_mode="append")
    n_users = batch.select("user_id").distinct().count()
    assert out.count() == n_users
