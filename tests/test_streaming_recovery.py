"""Checkpoint recovery: the load-bearing production property.

Every other streaming test drains a stream to completion in one
query. These kill/stop a query and prove that a SECOND query started
on the SAME checkpoint resumes (a) source offsets — already-read
files are not re-read — and (b) stateful operator state — per-key
counters continue across the restart. This is Structured Streaming's
crash-recovery contract, and the one claim the engine makes at scale
that a to-completion drain never exercises.

Parametrized over both state-store providers ([global] state_store):
the HDFS-backed default and RocksDB with changelog checkpointing —
recovery must hold identically under either, since RocksDB is the
provider a 100 TB deployment would actually run.
"""

from __future__ import annotations

import json
import time

import pytest
from pyspark.sql import functions as F

from conveyor_spark.compiler import STATE_STORE_PROVIDERS
from conveyor_spark.streaming.count_window import count_tumbling
from conveyor_spark.streaming.ops import run_available_now

_PROVIDER_KEY = "spark.sql.streaming.stateStore.providerClass"


@pytest.fixture(params=["hdfs", "rocksdb"])
def state_provider(request, spark):
    """Run the recovery contract under each state-store provider."""
    old = spark.conf.get(_PROVIDER_KEY, None)
    spark.conf.set(_PROVIDER_KEY, STATE_STORE_PROVIDERS[request.param])
    if request.param == "rocksdb":
        spark.conf.set(
            "spark.sql.streaming.stateStore.rocksdb."
            "changelogCheckpointing.enabled", "true")
    try:
        yield request.param
    finally:
        if old is None:
            spark.conf.unset(_PROVIDER_KEY)
        else:
            spark.conf.set(_PROVIDER_KEY, old)


def _jsonl(path, rows):
    with open(path, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")


def _read(spark, src):
    return spark.readStream.schema("user_id STRING, seq LONG").json(str(src))


def test_stateful_state_survives_restart(spark, tmp_path, state_provider):
    """Tumbling count-window (size=2) over two drains on one durable
    checkpoint. Run 1 sees 3 rows: window 0 closes, window 1 half
    full. Run 2 sees 1 MORE row: with recovered state (rows_seen=3)
    window 1 closes with n_rows=2; with lost state the row would
    restart window 0 at n_rows=1."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _jsonl(src / "f1.jsonl", [{"user_id": "u1", "seq": i} for i in range(3)])

    win = count_tumbling(_read(spark, src), ["user_id"], size=2)
    out1 = run_available_now(win, "t_rec_run1", output_mode="update",
                             state_partitions=4, checkpoint=ckpt)
    got1 = {(r["window_id"], r["n_rows"], r["closed"]) for r in out1.collect()}
    assert got1 == {(0, 2, True), (1, 1, False)}

    _jsonl(src / "f2.jsonl", [{"user_id": "u1", "seq": 3}])
    win2 = count_tumbling(_read(spark, src), ["user_id"], size=2)
    out2 = run_available_now(win2, "t_rec_run2", output_mode="update",
                             state_partitions=4, checkpoint=ckpt)
    got2 = {(r["window_id"], r["n_rows"], r["closed"]) for r in out2.collect()}
    # ONLY window 1, completed — state resumed AND f1 was not re-read
    assert got2 == {(1, 2, True)}, got2


def test_midstream_kill_recovers_exactly_once(spark, tmp_path, state_provider):
    """Kill a running query between micro-batches (maxFilesPerTrigger=1
    over 3 files, stop after the first committed batch), then restart
    on the same checkpoint and drain. The final complete-mode counts
    equal the all-files totals exactly: no rows lost (state recovered)
    and none double-counted (offsets recovered)."""
    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    for i in range(3):
        _jsonl(src / f"f{i}.jsonl",
               [{"user_id": f"u{j % 2}", "seq": i * 10 + j} for j in range(4)])

    def counts_stream():
        sdf = (
            spark.readStream.schema("user_id STRING, seq LONG")
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        return sdf.groupBy("user_id").agg(F.count("*").alias("n"))

    old = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", "4")
    try:
        q = (
            counts_stream().writeStream.format("memory")
            .queryName("t_rec_kill_1").outputMode("complete")
            .option("checkpointLocation", ckpt).start()
        )
        # wait for >= 1 committed batch, then kill mid-stream
        deadline = time.time() + 60
        while time.time() < deadline:
            p = q.lastProgress
            if p and p["batchId"] >= 0 and p["numInputRows"] > 0:
                break
            time.sleep(0.1)
        else:
            raise AssertionError("first micro-batch never committed")
        q.stop()
        q.awaitTermination()
        seen_first = {r["user_id"]: r["n"]
                      for r in spark.table("t_rec_kill_1").collect()}
        # the kill landed mid-stream: some input processed, not all
        assert seen_first and sum(seen_first.values()) <= 8
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)

    out = run_available_now(counts_stream(), "t_rec_kill_2",
                            output_mode="complete", state_partitions=4,
                            checkpoint=ckpt)
    got = {r["user_id"]: r["n"] for r in out.collect()}
    assert got == {"u0": 6, "u1": 6}, got


def test_complete_mode_no_new_data_resume_raises(spark, tmp_path):
    """A resumed complete-mode drain with no new input runs zero
    micro-batches, so nothing re-emits the live aggregate state; an
    empty result would be indistinguishable from 'no results' (ADVICE
    r7). It must fail loudly instead. Update/append resumes stay
    silent — zero NEW rows is their correct answer."""
    from conveyor_spark.errors import ConveyorError

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _jsonl(src / "f1.jsonl", [{"user_id": "a", "seq": 1}])

    def agg():
        return _read(spark, src).groupBy("user_id").agg(
            F.count("*").alias("n"))

    out1 = run_available_now(agg(), "t_noop_1", output_mode="complete",
                             state_partitions=2, checkpoint=ckpt)
    assert {(r["user_id"], r["n"]) for r in out1.collect()} == {("a", 1)}

    # resume with NOTHING new: complete mode raises...
    with pytest.raises(ConveyorError, match="no new input"):
        run_available_now(agg(), "t_noop_2", output_mode="complete",
                          state_partitions=2, checkpoint=ckpt)

    # ...including when the checkpoint is a file: URI (review finding:
    # an os.listdir-based check silently disarmed for URI schemes)
    with pytest.raises(ConveyorError, match="no new input"):
        run_available_now(agg(), "t_noop_3", output_mode="complete",
                          state_partitions=2, checkpoint=f"file:{ckpt}")

    # ...while an update-mode resume legitimately returns zero rows
    ckpt_u = str(tmp_path / "ckpt_u")
    from conveyor_spark.streaming.ops import stream_dedup
    out_u1 = run_available_now(
        stream_dedup(_read(spark, src), ["user_id"]), "t_noop_u1",
        output_mode="append", state_partitions=2, checkpoint=ckpt_u)
    assert out_u1.count() == 1
    out_u2 = run_available_now(
        stream_dedup(_read(spark, src), ["user_id"]), "t_noop_u2",
        output_mode="append", state_partitions=2, checkpoint=ckpt_u)
    assert out_u2.count() == 0


def test_dedup_state_survives_restart(spark, tmp_path, state_provider):
    """stream.dedup's seen-keys state must persist across a restart:
    a key first seen in run 1 and re-sent in run 2 is still a
    duplicate. With lost state it would be re-emitted."""
    from conveyor_spark.streaming.ops import stream_dedup

    src = tmp_path / "src"
    src.mkdir()
    ckpt = str(tmp_path / "ckpt")
    _jsonl(src / "f1.jsonl", [{"user_id": "a", "seq": 1},
                              {"user_id": "b", "seq": 2}])
    out1 = run_available_now(
        stream_dedup(_read(spark, src), ["user_id"]), "t_rec_dd1",
        output_mode="append", state_partitions=4, checkpoint=ckpt)
    assert {r["user_id"] for r in out1.collect()} == {"a", "b"}

    # 'a' again (dupe, must be dropped) + a genuinely new key
    _jsonl(src / "f2.jsonl", [{"user_id": "a", "seq": 3},
                              {"user_id": "c", "seq": 4}])
    out2 = run_available_now(
        stream_dedup(_read(spark, src), ["user_id"]), "t_rec_dd2",
        output_mode="append", state_partitions=4, checkpoint=ckpt)
    assert {r["user_id"] for r in out2.collect()} == {"c"}
