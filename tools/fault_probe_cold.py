"""Cold-cache executor fault injection (round 12, VERDICT r11 item 4).

FAULT_PROBE_r11's q64 mid-flight kill recovered on a WARM run
(1.49 s vs 12.38 s cold): broadcast variables, codegen, and parquet
footers were primed by the baseline run in the same JVMs, so the
FetchFailed/stage-retry path was exercised against a reduced shuffle.
This probe makes the kill maximally honest: EVERY attempt runs in a
fresh subprocess — new driver JVM, new local-cluster executor JVMs,
nothing cached — so the SIGKILL lands inside the full cold shuffle of
the shuffle-heaviest oracle query (q64_fuzzy_join, the same query the
warm probe uses).

Protocol:
  1. attempt 0: fresh subprocess, no kill — measures the true cold
     duration and proves the cold baseline hash-matches the DuckDB
     oracle (computed in the parent).
  2. subsequent attempts: fresh subprocess each, killer thread fires
     at a decreasing fraction of the COLD duration, SIGKILLs one
     CoarseGrainedExecutorBackend, asserts the query still completes
     with the oracle hash. A kill that misses (query finished first)
     retries colder; landing none is a violation.

Usage:
    python tools/fault_probe_cold.py [--sf-dir DIR] [--out JSON]
    (internal) --child --kill-after S   one fresh-JVM run
Exit 0 = cold kill landed mid-flight AND result hash-exact.
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
QUERY = "q64_fuzzy_join"


def child(args) -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()
    os.environ["SPARK_GRAFT_MASTER"] = args.master
    os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = args.executor_mem
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import __spark_entry__ as entry
    from check_oracle import frame_hash
    from conveyor_spark.session import get_spark
    from fault_probe import executor_pids

    spark = get_spark(app_name="conveyor-fault-cold")
    app_id = spark.sparkContext.applicationId
    state = {"done": False, "killed_pid": None, "landed": False,
             "executors_before": 0}

    def killer():
        time.sleep(args.kill_after)
        if state["done"]:
            return
        pids = executor_pids(app_id)
        state["executors_before"] = len(pids)
        if not pids:
            return
        try:
            os.kill(pids[0], signal.SIGKILL)
        except ProcessLookupError:
            return
        state["killed_pid"] = pids[0]
        state["landed"] = not state["done"]

    if args.kill_after > 0:
        threading.Thread(target=killer, daemon=True).start()
    t0 = time.time()
    df = entry.queries()[QUERY](spark, args.sf_dir)
    cols = df.columns
    rows = [tuple(r) for r in df.collect()]
    state["done"] = True
    out = {
        "seconds": round(time.time() - t0, 2),
        "rows": len(rows),
        "hash": frame_hash(cols, rows),
        "killed_pid": state["killed_pid"],
        "landed_mid_flight": state["landed"],
        "executors_before": state["executors_before"],
        "app_id": app_id,
    }
    spark.stop()
    # last line of stdout is the result JSON (Spark logs go to stderr)
    print("CHILD_RESULT " + json.dumps(out), flush=True)
    return 0


def run_child(args, kill_after: float) -> dict | None:
    cmd = [sys.executable, os.path.abspath(__file__), "--child",
           "--sf-dir", args.sf_dir, "--master", args.master,
           "--executor-mem", args.executor_mem,
           "--kill-after", str(kill_after)]
    env = dict(os.environ, PYTHONPATH=REPO)
    p = subprocess.run(cmd, capture_output=True, text=True,
                       timeout=900, env=env, cwd=REPO)
    for line in reversed(p.stdout.splitlines()):
        if line.startswith("CHILD_RESULT "):
            return json.loads(line[len("CHILD_RESULT "):])
    sys.stderr.write(p.stderr[-2000:] + "\n")
    return None


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local-cluster[2,16,4096]")
    ap.add_argument("--executor-mem", default="3g")
    ap.add_argument("--kill-after", type=float, default=0.0)
    ap.add_argument("--child", action="store_true")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    if args.child:
        return child(args)

    os.environ["TZ"] = "UTC"
    time.tzset()
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import duckdb

    import __spark_entry__ as entry
    from check_oracle import frame_hash

    con = duckdb.connect()
    for t in ("region", "nation", "customer", "supplier", "part",
              "orders", "lineitem", "events", "documents", "embeddings"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{args.sf_dir}/{t}.parquet')")
    cur = con.execute(entry.oracle_sql()[QUERY])
    ocols = [d[0] for d in cur.description]
    oracle_hash = frame_hash(ocols, cur.fetchall())

    result: dict = {"query": QUERY, "sf_dir": args.sf_dir,
                    "master": args.master, "attempts": []}
    violations: list[str] = []

    base = run_child(args, 0.0)
    if base is None or base["hash"] != oracle_hash:
        violations.append(f"{QUERY}: cold baseline failed or hash mismatch")
        result["cold_baseline"] = base
    else:
        result["cold_baseline"] = base
        cold_s = base["seconds"]
        landed = False
        for frac in (0.4, 0.25, 0.15, 0.08):
            rec = run_child(args, max(0.5, cold_s * frac))
            if rec is None:
                violations.append(f"{QUERY}: child crashed at frac {frac}")
                break
            rec["kill_after_s"] = round(max(0.5, cold_s * frac), 2)
            rec["hash_match"] = rec["hash"] == oracle_hash
            del rec["hash"]
            result["attempts"].append(rec)
            if not rec["hash_match"]:
                violations.append(
                    f"{QUERY}: hash mismatch after cold kill at "
                    f"{rec['kill_after_s']}s "
                    f"(landed={rec['landed_mid_flight']})")
                break
            if rec["landed_mid_flight"] and rec["killed_pid"]:
                landed = True
                break
        result["kill_landed_cold"] = landed
        if not landed and not violations:
            violations.append(
                f"{QUERY}: no cold kill landed mid-flight — "
                "recovery unexercised")

    result["violations"] = violations
    result["pass"] = not violations
    out = args.out or os.path.join(REPO, "FAULT_PROBE_cold.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}  pass={result['pass']}")
    for v in violations:
        print(f"VIOLATION: {v}", file=sys.stderr)
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
