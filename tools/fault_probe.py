"""Executor fault-injection probe (round 11, VERDICT r10 item 5).

The compiler's error strategies (stop/continue/retry, dead-letter)
are pytest-covered DRIVER-side, but Spark's own task-level recovery
— lost shuffle blocks refetched via stage retry, streaming state
reloaded from checkpoint on a replacement executor — had never been
exercised: local[32] has no executor process to lose. Under
``local-cluster`` the executors are real JVMs, so this probe SIGKILLs
one mid-query and asserts the job still completes with the
hash-exact DuckDB-oracle result:

  - batch: a shuffle-heavy query. Killing an executor between the
    map and reduce stages destroys its shuffle files (no external
    shuffle service), forcing FetchFailed -> DAGScheduler re-runs
    the map stage on survivors — the recovery path a 1000-executor
    run exercises weekly.
  - streaming: a stateful drain (stream-stream join). The killed
    executor's state-store partitions reload from the HDFS-backed
    checkpoint onto a replacement — Structured Streaming's
    crash-recovery contract under real process loss.

The kill must land MID-FLIGHT: each query is first timed warm, then
re-run with a killer thread that fires at ~40% of that duration and
records whether the query was still running. A kill that misses
(query already finished) retries with an earlier trigger; landing
none is a violation, not a silent pass. Executor PIDs are found by
matching the app id in CoarseGrainedExecutorBackend command lines —
never the driver or workers.

Usage:
    python tools/fault_probe.py [--sf-dir DIR] [--master M]
        [--executor-mem 3g] [--out FAULT_PROBE.json]
Exit 0 = all assertions hold; 1 = violation (named on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import subprocess
import sys
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# one representative per execution class whose recovery differs:
# - shuffle-heavy batch (lost map outputs -> FetchFailed -> stage
#   re-run on survivors)
# - stateful streaming drain (state-store partitions reload from the
#   checkpoint onto the replacement executor)
# - grouped PYTHON apply (the killed executor takes its Python
#   workers with it; retried tasks must respawn workers and re-exec
#   the script namespace)
# - Arrow mapInPandas codec decode (pure-Python heavy compute in the
#   workers, no shuffle — task retry only)
KILL_QUERIES = [
    "q64_fuzzy_join",
    "q66_stream_join",
    "q155_py_group_eval",
    "q153_video_frame_stats",
]


def executor_pids(app_id: str) -> list[int]:
    """PIDs of live CoarseGrainedExecutorBackend JVMs for this app."""
    try:
        out = subprocess.run(
            ["pgrep", "-f", f"CoarseGrainedExecutorBackend.*{app_id}"],
            capture_output=True, text=True, timeout=10,
        ).stdout
    except Exception:  # noqa: BLE001
        return []
    return [int(p) for p in out.split() if p.strip().isdigit()]


def run_with_kill(spark, fn, sf_dir, kill_after_s, app_id):
    """Run fn(spark, sf_dir).collect() with a killer thread that
    SIGKILLs one executor JVM after ``kill_after_s``. Returns
    (cols, rows, kill_record)."""
    state = {"done": False, "killed_pid": None, "kill_t": None,
             "pids_before": None, "landed_mid_flight": False}

    def killer():
        time.sleep(kill_after_s)
        if state["done"]:
            return  # query finished first: kill missed
        pids = executor_pids(app_id)
        state["pids_before"] = pids
        if not pids:
            return
        victim = pids[0]
        try:
            os.kill(victim, signal.SIGKILL)
        except ProcessLookupError:
            return
        state["killed_pid"] = victim
        state["kill_t"] = time.time()
        state["landed_mid_flight"] = not state["done"]

    t = threading.Thread(target=killer, daemon=True)
    t0 = time.time()
    t.start()
    df = fn(spark, sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    state["done"] = True
    t.join(timeout=kill_after_s + 15)
    state["query_seconds"] = round(time.time() - t0, 2)
    return cols, rows, state


def main() -> int:
    # pin the hash-comparison basis to UTC (see check_oracle.py:
    # PySpark collect() renders timestamps through the PROCESS tz)
    os.environ["TZ"] = "UTC"
    time.tzset()

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local-cluster[2,16,4096]")
    ap.add_argument("--executor-mem", default="3g")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_MASTER"] = args.master
    os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = args.executor_mem
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import duckdb

    import __spark_entry__ as entry
    from check_oracle import frame_hash
    from conveyor_spark.session import get_spark

    spark = get_spark(app_name="conveyor-fault-probe")
    app_id = spark.sparkContext.applicationId
    qs, oracles = entry.queries(), entry.oracle_sql()

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{args.sf_dir}/{t}.parquet')"
        )

    result: dict = {"master": args.master, "sf_dir": args.sf_dir,
                    "app_id": app_id, "kills": {}}
    violations: list[str] = []

    for qname in KILL_QUERIES:
        fn = qs[qname]
        # warm + time the query (also proves it passes pre-kill)
        t0 = time.time()
        base_df = fn(spark, args.sf_dir)
        base_cols = base_df.columns
        base_rows = [tuple(r) for r in base_df.collect()]
        warm_s = time.time() - t0
        base_hash = frame_hash(base_cols, base_rows)
        cur = con.execute(oracles[qname])
        ocols = [d[0] for d in cur.description]
        oracle_hash = frame_hash(ocols, cur.fetchall())
        if base_hash != oracle_hash:
            violations.append(f"{qname}: baseline hash mismatch pre-kill")
            continue

        rec = {"warm_seconds": round(warm_s, 2), "attempts": []}
        result["kills"][qname] = rec
        landed = False
        # try kill points at decreasing fractions of the LATEST
        # observed duration — repeat runs get faster (broadcast +
        # codegen caches), so warm_s alone overshoots and the kill
        # keeps missing
        last_s = warm_s
        for frac in (0.4, 0.25, 0.1, 0.05):
            kill_after = max(0.2, last_s * frac)
            exec_before = executor_pids(app_id)
            cols, rows, kill = run_with_kill(
                spark, fn, args.sf_dir, kill_after, app_id,
            )
            got_hash = frame_hash(cols, rows)
            attempt = {
                "kill_after_s": round(kill_after, 2),
                "killed_pid": kill["killed_pid"],
                "landed_mid_flight": kill["landed_mid_flight"],
                "query_seconds": kill["query_seconds"],
                "executors_before": len(exec_before),
                "hash_match": got_hash == oracle_hash,
            }
            rec["attempts"].append(attempt)
            last_s = kill["query_seconds"]
            # a landed kill counts as exercised recovery even when
            # the recomputed result is WRONG — the mismatch is its
            # own violation, and reporting 'no kill landed' on top
            # of it would misdescribe the failure mode
            if kill["landed_mid_flight"] and kill["killed_pid"]:
                landed = True
            if not attempt["hash_match"]:
                violations.append(
                    f"{qname}: result hash mismatch after executor kill "
                    f"(attempt at {kill_after:.2f}s, "
                    f"landed={attempt['landed_mid_flight']})"
                )
                break
            if landed:
                break
            # give the cluster a moment to re-register a replacement
            time.sleep(5)
        rec["kill_landed"] = landed
        if not landed:
            violations.append(
                f"{qname}: no kill landed mid-flight in "
                f"{len(rec['attempts'])} attempts — recovery unexercised"
            )

    spark.stop()
    result["violations"] = violations
    result["pass"] = not violations
    out = args.out or os.path.join(REPO, "FAULT_PROBE.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}  pass={result['pass']}")
    for v in violations:
        print(f"VIOLATION: {v}", file=sys.stderr)
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
