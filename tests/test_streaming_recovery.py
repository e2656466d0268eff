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


# ---------------------------------------------------------------------------
# Crash consistency: the query dies UNCLEANLY (a poisoned micro-batch
# throws mid-flight — no q.stop(), no graceful shutdown), then a
# restart from the same checkpoint must be exactly-once vs the batch
# oracle. The graceful tests above prove offsets/state round-trip
# through a clean stop; these prove the same through a failure, which
# is the recovery path a 1000-executor deployment actually exercises.
# ---------------------------------------------------------------------------

_POISON_SEQ = 666


def _poisoned(sdf, flag_path):
    """Inject a task failure: raise while flag_path exists and the
    poison row is processed. Deleting the flag 'fixes' the cluster so
    the restarted query can reprocess the same data successfully."""
    from pyspark.sql import types as T

    def maybe_crash(seq):
        import os
        if seq == _POISON_SEQ and os.path.exists(flag_path):
            raise RuntimeError("injected task failure")
        return seq

    crash = F.udf(maybe_crash, T.LongType())
    return sdf.withColumn("seq", crash("seq"))


def _staged_files(src, rows_by_file):
    """Write one jsonl per batch with strictly increasing mtimes so
    the file source (which orders by modification time) processes
    them in index order under maxFilesPerTrigger=1."""
    import os
    base = time.time() - 1000
    for i, rows in enumerate(rows_by_file):
        p = src / f"f{i}.jsonl"
        _jsonl(p, rows)
        os.utime(p, (base + i, base + i))


def _crash_then_drain(spark, tmp_path, build_stream, name):
    """Run build_stream() with the poison armed until the query dies
    uncleanly, then disarm and drain from the same checkpoint.
    Returns (rows_before_crash, rows_after_restart)."""
    import os
    from pyspark.errors.exceptions.captured import StreamingQueryException

    ckpt = str(tmp_path / "ckpt")
    flag = str(tmp_path / "poison.flag")
    open(flag, "w").close()

    q = (
        build_stream().writeStream.format("memory")
        .queryName(f"{name}_crash").outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True).start()
    )
    with pytest.raises(StreamingQueryException):
        q.awaitTermination(120)
        raise AssertionError("poisoned query terminated cleanly")
    before = spark.table(f"{name}_crash").collect()

    os.remove(flag)
    after = run_available_now(build_stream(), f"{name}_resume",
                              output_mode="update", state_partitions=4,
                              checkpoint=ckpt)
    return before, after.collect()


def test_crash_consistency_count_window(spark, tmp_path, state_provider):
    src = tmp_path / "src"
    src.mkdir()
    flag = str(tmp_path / "poison.flag")
    _staged_files(src, [
        [{"user_id": f"u{j % 2}", "seq": j} for j in range(5)],          # f0
        [{"user_id": "u0", "seq": _POISON_SEQ},
         {"user_id": "u1", "seq": 101}],                                  # f1
        [{"user_id": f"u{j % 2}", "seq": 200 + j} for j in range(3)],    # f2
    ])

    def build():
        sdf = (
            spark.readStream.schema("user_id STRING, seq LONG")
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        return count_tumbling(_poisoned(sdf, flag), ["user_id"],
                              size=2, order_by="seq")

    before, after = _crash_then_drain(spark, tmp_path, build, "t_cc_cw")
    # batch 0 committed before the poison batch died
    assert before, "no batch committed before the injected failure"

    # last update wins per (key, window): max n_rows is monotone
    final: dict = {}
    for r in before + after:
        k = (r["user_id"], r["window_id"])
        final[k] = max(final.get(k, 0), r["n_rows"])

    # batch oracle: all rows per key in seq order, chunked by 2
    rows = sorted(
        [("u0", 0), ("u0", 2), ("u0", 4), ("u1", 1), ("u1", 3),
         ("u0", _POISON_SEQ), ("u1", 101),
         ("u0", 200), ("u1", 201), ("u0", 202)])
    expect: dict = {}
    from collections import defaultdict
    per_key = defaultdict(list)
    for k, s in rows:
        per_key[k].append(s)
    for k, seqs in per_key.items():
        for i in range(len(seqs)):
            expect[(k, i // 2)] = max(expect.get((k, i // 2), 0),
                                      i % 2 + 1)
    assert final == expect, (final, expect)


def test_crash_consistency_stream_dedup(spark, tmp_path, state_provider):
    from conveyor_spark.streaming.ops import stream_dedup

    src = tmp_path / "src"
    src.mkdir()
    flag = str(tmp_path / "poison.flag")
    _staged_files(src, [
        [{"user_id": "a", "seq": 1}, {"user_id": "b", "seq": 2}],        # f0
        [{"user_id": "a", "seq": _POISON_SEQ}, {"user_id": "c", "seq": 4}],
        [{"user_id": "b", "seq": 5}, {"user_id": "d", "seq": 6}],        # f2
    ])

    def build():
        sdf = (
            spark.readStream.schema("user_id STRING, seq LONG")
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        return stream_dedup(_poisoned(sdf, flag), ["user_id"])

    before, after = _crash_then_drain(spark, tmp_path, build, "t_cc_dd")
    assert before
    emitted = [r["user_id"] for r in before + after]
    # exactly-once: every distinct key once, none double-emitted
    # across the crash boundary
    assert sorted(emitted) == ["a", "b", "c", "d"], emitted


def test_crash_consistency_session_window(spark, tmp_path, state_provider):
    from conveyor_spark.streaming.session_window import session_assign

    src = tmp_path / "src"
    src.mkdir()
    flag = str(tmp_path / "poison.flag")
    # sessions (gap 10s): u0 [0,5,666...no — seqs become timestamps;
    # keep u0's times clustered so the poison row EXTENDS a session
    # that opened before the crash: state must survive the failure
    _staged_files(src, [
        [{"user_id": "u0", "seq": 100}, {"user_id": "u0", "seq": 105},
         {"user_id": "u1", "seq": 100}],                                  # f0
        [{"user_id": "u0", "seq": _POISON_SEQ}],                          # f1
        [{"user_id": "u0", "seq": 670}, {"user_id": "u1", "seq": 300}],  # f2
    ])

    def build():
        sdf = (
            spark.readStream.schema("user_id STRING, seq LONG")
            .option("maxFilesPerTrigger", 1).json(str(src))
        )
        sdf = _poisoned(sdf, flag).withColumn(
            "ts", F.timestamp_seconds(F.col("seq")))
        return session_assign(sdf, ["user_id"], "ts", gap_seconds=10.0)

    before, after = _crash_then_drain(spark, tmp_path, build, "t_cc_sw")
    assert before
    final: dict = {}
    for r in before + after:
        k = (r["user_id"], r["session_id"])
        final[k] = max(final.get(k, 0), r["n_rows"])

    # batch oracle (gap 10): u0 {100,105} | {666,670}; u1 {100} | {300}
    assert final == {("u0", 0): 2, ("u0", 1): 2,
                     ("u1", 0): 1, ("u1", 1): 1}, final
