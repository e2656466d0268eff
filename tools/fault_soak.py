"""Streaming fault SOAK (round 12, VERDICT r11 item 3b).

FAULT_PROBE_r11 proved ONE executor SIGKILL recovers hash-exact.
This soak proves the property holds under REPEATED process loss: the
stream-stream join (q66) drains a Zipf-replicated events corpus under
``local-cluster`` (real executor JVMs) while a killer thread SIGKILLs
a live executor every ``--interval`` seconds for the WHOLE drain —
state-store partitions reload from the checkpoint onto replacement
executors again and again, and the final output must still be
hash-exact against the DuckDB batch oracle over the same probe data,
under BOTH state-store providers. Each kill is recorded with its PID
and timestamp; a soak where fewer than --min-kills land mid-drain is
a violation (the drain must be long enough to be worth the name).

Usage:
    python tools/fault_soak.py [--scale 16] [--interval 8]
        [--min-kills 3] [--out FAULT_SOAK.json]
Exit 0 = both providers hash-exact with >= min-kills landed each.
"""
from __future__ import annotations

import argparse
import json
import os
import signal
import sys
import tempfile
import threading
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
QUERY = "q66_stream_join"

PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider",
}


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scale", type=int, default=16)
    ap.add_argument("--alpha", type=float, default=1.1)
    ap.add_argument("--max-cluster", type=int, default=256)
    ap.add_argument("--master", default="local-cluster[2,16,4096]")
    ap.add_argument("--executor-mem", default="3g")
    ap.add_argument("--interval", type=float, default=8.0)
    ap.add_argument("--min-kills", type=int, default=3)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_MASTER"] = args.master
    os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = args.executor_mem
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import duckdb

    import __spark_entry__ as entry
    from check_oracle import frame_hash
    from conveyor_spark.queries import QUERIES
    from conveyor_spark.session import get_spark
    from fault_probe import executor_pids
    from streaming_probe import build_events_probe

    spark = get_spark(app_name="conveyor-fault-soak",
                      extra_conf={"spark.ui.enabled": "true"})
    app_id = spark.sparkContext.applicationId
    ui = spark.sparkContext.uiWebUrl

    def stage_state() -> tuple[int, int]:
        """(completed-stage count, max attemptId among ACTIVE stages).
        The attempt number is the kill gate: a stage we have already
        killed once is on attempt >= 1, and letting our kills push any
        stage to spark.stage.maxConsecutiveAttempts (4) aborts the job
        by design."""
        import urllib.request
        try:
            with urllib.request.urlopen(
                f"{ui}/api/v1/applications/{app_id}/stages",
                timeout=5,
            ) as r:
                stages = json.load(r)
            done = sum(1 for s in stages if s["status"] == "COMPLETE")
            retrying = max(
                (s["attemptId"] for s in stages if s["status"] == "ACTIVE"),
                default=0,
            )
            return done, retrying
        except Exception:  # noqa: BLE001
            return -1, 0
    probe_dir = tempfile.mkdtemp(prefix="fault_soak_")
    result: dict = {"query": QUERY, "master": args.master,
                    "scale": args.scale, "interval_s": args.interval,
                    "app_id": app_id, "providers": {}}
    violations: list[str] = []
    try:
        t0 = time.time()
        result["events_rows"] = build_events_probe(
            spark, args.sf_dir, probe_dir, args.scale, args.alpha,
            args.max_cluster)
        result["build_sec"] = round(time.time() - t0, 1)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            src = os.path.join(args.sf_dir, f"{t}.parquet")
            if os.path.exists(src):
                os.symlink(src, os.path.join(probe_dir, f"{t}.parquet"))

        con = duckdb.connect()
        con.execute("CREATE VIEW events AS SELECT * FROM read_parquet("
                    f"'{probe_dir}/events.parquet')")
        cur = con.execute(entry.oracle_sql()[QUERY])
        ocols = [d[0] for d in cur.description]
        orows = cur.fetchall()
        ohash = frame_hash(ocols, orows)
        result["oracle_rows"] = len(orows)

        for prov, cls in PROVIDERS.items():
            spark.conf.set(
                "spark.sql.streaming.stateStore.providerClass", cls)
            if prov == "rocksdb":
                spark.conf.set(
                    "spark.sql.streaming.stateStore.rocksdb."
                    "changelogCheckpointing.enabled", "true")
            kills: list[dict] = []
            state = {"done": False}

            def killer():
                # first kill after ONE interval so batch 0 commits a
                # checkpoint to recover from. Each kill is PROGRESS-
                # GATED: the next one fires only after the app has
                # COMPLETED at least one new stage since the last kill
                # — a fixed cadence can hit the same recovering stage
                # spark.stage.maxConsecutiveAttempts (4) times in a
                # row and abort the job by design (measured at 3 s and
                # intermittently at 6 s intervals; kept as the
                # interval3 negative artifact). Gating on progress is
                # the honest semantics: kills spread across the drain,
                # never a denial-of-recovery loop.
                last_stages, _ = stage_state()
                while not state["done"]:
                    time.sleep(args.interval)
                    if state["done"]:
                        return
                    cur, retrying = stage_state()
                    if cur != -1 and cur <= last_stages:
                        continue  # no forward progress yet: hold fire
                    if retrying >= 1:
                        # an active stage is already on a retry
                        # attempt (our previous kill, or collateral
                        # FetchFailed) — killing now walks it toward
                        # the 4-attempt abort; let it land first
                        continue
                    pids = executor_pids(app_id)
                    if not pids:
                        kills.append({"t": round(time.time() - q0, 2),
                                      "pid": None,
                                      "note": "no live executor"})
                        continue
                    try:
                        os.kill(pids[0], signal.SIGKILL)
                    except ProcessLookupError:
                        continue
                    last_stages = cur
                    kills.append({"t": round(time.time() - q0, 2),
                                  "pid": pids[0],
                                  "stages_completed_at_kill": cur,
                                  "landed_mid_drain": not state["done"]})

            q0 = time.time()
            kt = threading.Thread(target=killer, daemon=True)
            kt.start()
            try:
                df = QUERIES[QUERY](spark, probe_dir)
                cols = df.columns
                rows = [tuple(r) for r in df.collect()]
                err = None
            except Exception as exc:  # noqa: BLE001
                cols, rows = [], []
                err = f"{type(exc).__name__}: {str(exc)[:300]}"
            state["done"] = True
            kt.join(timeout=args.interval + 5)
            landed = [k for k in kills if k.get("landed_mid_drain")]
            prec = {
                "drain_seconds": round(time.time() - q0, 2),
                "rows": len(rows), "error": err, "kills": kills,
                "kills_landed": len(landed),
            }
            result["providers"][prov] = prec
            if err:
                violations.append(f"{prov}: ERROR {err}")
                continue
            prec["hash_match_oracle"] = (
                frame_hash(cols, rows) == ohash
                and sorted(cols) == sorted(ocols)
                and len(rows) == len(orows))
            if not prec["hash_match_oracle"]:
                violations.append(
                    f"{prov}: hash/rows mismatch after soak "
                    f"(rows {len(rows)} vs {len(orows)})")
            if len(landed) < args.min_kills:
                violations.append(
                    f"{prov}: only {len(landed)} kills landed mid-drain "
                    f"(< {args.min_kills}) — lengthen the drain or "
                    "shorten --interval")
            print(f"  {prov}: drain {prec['drain_seconds']}s "
                  f"rows={len(rows)} kills_landed={len(landed)} "
                  + ("OK" if prec.get("hash_match_oracle") else "FAIL"))
    finally:
        import shutil
        shutil.rmtree(probe_dir, ignore_errors=True)
        try:
            spark.stop()
        except Exception:  # noqa: BLE001
            pass

    result["violations"] = violations
    result["pass"] = not violations
    out = args.out or os.path.join(REPO, "FAULT_SOAK.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}  pass={result['pass']}")
    for v in violations:
        print(f"VIOLATION: {v}", file=sys.stderr)
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
