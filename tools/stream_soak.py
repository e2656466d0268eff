"""Steady-state streaming soak: prove state PLATEAUS across batches.

STREAM_PROBE_r12_x1024 measured single bounded drains (1-2
micro-batches) — it bounds state for ONE pass but cannot distinguish
"state is bounded by the watermark horizon" from "state just didn't
get a chance to grow" (VERDICT r12 task 3). This soak drains the
same 1024x Zipf events corpus INCREMENTALLY:

  1. the built events table is re-written as K time-ordered chunks
     (a directory-shaped table, the layout every real corpus has);
  2. SPARK_GRAFT_MAX_FILES_PER_TRIGGER=1 makes the availableNow
     drain process ONE chunk per micro-batch (>= K batches), so the
     watermark advances batch over batch and eviction actually runs;
  3. per-batch state_rows / state_memory are read from the drain's
     recentProgress (conveyor_spark.streaming.ops.RECENT_PROGRESS)
     for BOTH state-store providers at
     SPARK_GRAFT_STATE_PARTITIONS=32 (the measured 1024x layout);
  4. the final accumulated output must be hash-exact against the
     query's DuckDB batch oracle over the same chunked data for the
     batching-invariant plans (q66's join: a pair exists iff the two
     events are within the interval, however they arrive). For q154
     (dropDuplicatesWithinWatermark) exact multiset equality is NOT
     the semantics: Spark's contract guarantees dedup only WITHIN
     the watermark horizon, so a key legitimately re-emits after its
     state is evicted and output multiplicity is arrival-batching-
     defined. The soak therefore asserts the q154 invariants that DO
     hold: the DISTINCT emitted key set equals the oracle's distinct
     set (hash-exact after projection), distinct <= emitted <= total
     events, both providers produce identical multisets, and
     eviction is active (revivals + rows_evicted > 0 prove the state
     bound is working, which is the very property under test).

The claim under test: for the watermark-evicting queries (q66
stream-stream join, q154 dedup) state rises to the horizon's
occupancy and PLATEAUS — max state over the last half of batches
must not exceed the first half's max by more than --plateau-factor.
If it does, the artifact records the per-batch growth curve and
FAILS: that would mean eviction is not keeping up and a production
stream would grow without bound.

Usage:
    python tools/stream_soak.py [--scale 1024] [--chunks 6]
        [--queries q66_stream_join q154_stream_dedup]
        [--state-partitions 32] [--out STREAM_SOAK.json]
Exit 0 = hash-exact + >= --min-batches batches + plateau, both
providers, every query.

DRIVER SIZING: the comparison harness accumulates each drain's
output driver-side (memory-sink shape) and collects it for the
hash, so DRIVER heap scales with the drain's RESULT rows — q66 at
4096x emits 10.3M rows and the default 8g heap OOMs on the second
provider's collect (measured 2026-08-17; the engine's own drain was
fine — hdfs completed hash-exact first). Run >= 4096x with
SPARK_GRAFT_DRIVER_MEM=24g. Per-provider result refs are dropped
eagerly for the same reason.
"""
from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

PROVIDERS = {
    "hdfs": "org.apache.spark.sql.execution.streaming.state."
            "HDFSBackedStateStoreProvider",
    "rocksdb": "org.apache.spark.sql.execution.streaming.state."
               "RocksDBStateStoreProvider",
}

# Queries whose output MULTIPLICITY is arrival-batching-defined by
# Spark's own contract (dedup within watermark: revived keys
# re-emit). Checked on the distinct-key projection + bounds +
# provider equivalence instead of multiset hash.
BATCHING_DEFINED_MULTIPLICITY = {"q154_stream_dedup"}


def chunk_events(spark, probe_dir: str, k: int) -> int:
    """Re-write the built single-file events table as K time-ordered
    parquet files under events.parquet/ (directory-shaped), ascending
    mtimes so the file source feeds them oldest-first."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    single = os.path.join(probe_dir, "events.parquet")
    df = spark.read.parquet(single)
    w = Window.orderBy("ts", "event_id")
    chunked = df.withColumn("__b", F.ntile(k).over(w))
    tmp = os.path.join(probe_dir, "__chunks")
    chunked.write.mode("overwrite").partitionBy("__b").parquet(tmp)
    out_dir = single + ".dir"
    os.makedirs(out_dir)
    n = 0
    for i in range(1, k + 1):
        part_dir = os.path.join(tmp, f"__b={i}")
        parts = sorted(p for p in os.listdir(part_dir)
                       if p.endswith(".parquet"))
        for j, p in enumerate(parts):
            dst = os.path.join(out_dir, f"chunk-{i:02d}-{j:02d}.parquet")
            shutil.move(os.path.join(part_dir, p), dst)
            os.utime(dst, (time.time() + i, time.time() + i))
            n += 1
    shutil.rmtree(tmp, ignore_errors=True)
    os.remove(single)
    os.rename(out_dir, single)
    return n


def batch_curve(progress: list) -> list[dict]:
    curve = []
    for p in progress:
        ops = p.get("stateOperators") or []
        curve.append({
            "batch_id": p.get("batchId"),
            "input_rows": p.get("numInputRows"),
            "state_rows": sum(o.get("numRowsTotal", 0) for o in ops),
            "state_memory_mb": round(
                sum(o.get("memoryUsedBytes", 0) for o in ops) / 2**20, 2),
            "rows_evicted": sum(o.get("numRowsRemoved", 0) for o in ops),
        })
    return curve


def main() -> int:
    os.environ["TZ"] = "UTC"
    time.tzset()

    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--scale", type=int, default=1024)
    ap.add_argument("--alpha", type=float, default=1.1)
    ap.add_argument("--max-cluster", type=int, default=256)
    ap.add_argument("--chunks", type=int, default=6)
    ap.add_argument("--min-batches", type=int, default=5)
    ap.add_argument("--state-partitions", type=int, default=32)
    ap.add_argument("--plateau-factor", type=float, default=1.5)
    ap.add_argument("--queries", nargs="*",
                    default=["q66_stream_join", "q154_stream_dedup"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    os.environ["SPARK_GRAFT_STATE_PARTITIONS"] = str(args.state_partitions)
    os.environ["SPARK_GRAFT_MAX_FILES_PER_TRIGGER"] = "1"
    sys.path.insert(0, REPO)
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import duckdb

    import __spark_entry__ as entry
    from check_oracle import frame_hash
    from streaming_probe import DRAIN_NAMES, build_events_probe

    from conveyor_spark.queries import QUERIES
    from conveyor_spark.session import get_spark
    from conveyor_spark.streaming.ops import RECENT_PROGRESS

    spark = get_spark(app_name="conveyor-stream-soak",
                      shuffle_partitions=32)
    probe_dir = tempfile.mkdtemp(prefix="stream_soak_")
    result: dict = {
        "scale": args.scale, "alpha": args.alpha,
        "max_cluster": args.max_cluster, "chunks": args.chunks,
        "state_partitions": args.state_partitions,
        "plateau_factor": args.plateau_factor, "queries": {},
    }
    violations: list[str] = []
    try:
        t0 = time.time()
        QUERIES["q01_pricing_summary"](spark, args.sf_dir).count()
        result["calibration"] = {"query": "q01_pricing_summary",
                                 "sec": round(time.time() - t0, 2)}
        t0 = time.time()
        result["events_rows"] = build_events_probe(
            spark, args.sf_dir, probe_dir, args.scale, args.alpha,
            args.max_cluster)
        result["chunk_files"] = chunk_events(spark, probe_dir,
                                             args.chunks)
        result["build_sec"] = round(time.time() - t0, 1)
        for t in ("region", "nation", "customer", "supplier", "part",
                  "orders", "lineitem", "documents", "embeddings"):
            src = os.path.join(args.sf_dir, f"{t}.parquet")
            if os.path.exists(src):
                os.symlink(src, os.path.join(probe_dir, f"{t}.parquet"))

        con = duckdb.connect()
        con.execute("SET threads TO 16")
        con.execute(
            "CREATE VIEW events AS SELECT * FROM read_parquet("
            f"'{probe_dir}/events.parquet/*.parquet')")
        oracles = entry.oracle_sql()

        for name in args.queries:
            qrec: dict = {}
            result["queries"][name] = qrec
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
            ohash = frame_hash(ocols, orows)
            qrec["oracle_rows"] = len(orows)
            if name in BATCHING_DEFINED_MULTIPLICITY:
                qrec["check"] = ("distinct-key projection + bounds + "
                                 "provider equivalence (multiplicity is "
                                 "arrival-batching-defined by Spark's "
                                 "within-watermark dedup contract)")
            prov_hashes: dict[str, str] = {}
            total_events = result["events_rows"]
            for prov, cls in PROVIDERS.items():
                spark.conf.set(
                    "spark.sql.streaming.stateStore.providerClass", cls)
                if prov == "rocksdb":
                    spark.conf.set(
                        "spark.sql.streaming.stateStore.rocksdb."
                        "changelogCheckpointing.enabled", "true")
                RECENT_PROGRESS.pop(DRAIN_NAMES[name], None)
                t0 = time.time()
                try:
                    df = QUERIES[name](spark, probe_dir)
                    cols = df.columns
                    rows = [tuple(r) for r in df.collect()]
                    err = None
                except Exception as exc:  # noqa: BLE001
                    cols, rows = [], []
                    err = f"{type(exc).__name__}: {str(exc)[:300]}"
                sec = round(time.time() - t0, 2)
                curve = batch_curve(
                    RECENT_PROGRESS.get(DRAIN_NAMES[name]) or [])
                # trailing zero-input flush batches carry no state
                # signal — the curve's CLAIM is over fed batches
                fed = [c for c in curve if (c["input_rows"] or 0) > 0]
                prec = {"sec": sec, "rows": len(rows), "error": err,
                        "batches": len(curve), "fed_batches": len(fed),
                        "curve": curve}
                qrec[prov] = prec
                if err:
                    violations.append(f"{name}[{prov}]: ERROR {err}")
                    continue
                prov_hashes[prov] = frame_hash(cols, rows)
                if name in BATCHING_DEFINED_MULTIPLICITY:
                    # distinct projection must equal the oracle's set;
                    # multiplicity bounded by [distinct, total events]
                    distinct = sorted(set(rows))
                    prec["distinct_rows"] = len(distinct)
                    prec["revivals"] = len(rows) - len(distinct)
                    prec["hash_match_oracle_distinct"] = (
                        frame_hash(cols, distinct) == ohash
                        and sorted(cols) == sorted(ocols)
                        and len(distinct) == len(orows))
                    if not prec["hash_match_oracle_distinct"]:
                        violations.append(
                            f"{name}[{prov}]: DISTINCT key set differs "
                            f"from oracle ({len(distinct)} vs "
                            f"{len(orows)})")
                    if not (len(orows) <= len(rows) <= total_events):
                        violations.append(
                            f"{name}[{prov}]: emitted {len(rows)} "
                            f"outside [{len(orows)}, {total_events}]")
                else:
                    prec["hash_match_oracle"] = (
                        prov_hashes[prov] == ohash
                        and sorted(cols) == sorted(ocols)
                        and len(rows) == len(orows))
                    if not prec["hash_match_oracle"]:
                        violations.append(
                            f"{name}[{prov}]: hash/rows mismatch "
                            f"({len(rows)} vs {len(orows)})")
                if len(fed) < args.min_batches:
                    violations.append(
                        f"{name}[{prov}]: only {len(fed)} fed batches "
                        f"(< {args.min_batches}) — raise --chunks")
                if fed:
                    half = max(1, len(fed) // 2)
                    first = max(c["state_rows"] for c in fed[:half])
                    last = max(c["state_rows"] for c in fed[half:])
                    prec["plateau"] = {
                        "first_half_max_state_rows": first,
                        "last_half_max_state_rows": last,
                        "ratio": round(last / first, 3) if first else None,
                        "total_evicted": sum(c["rows_evicted"]
                                             for c in fed),
                    }
                    if first and last > first * args.plateau_factor:
                        violations.append(
                            f"{name}[{prov}]: state GREW across the "
                            f"drain ({first} -> {last} rows, > "
                            f"{args.plateau_factor}x) — watermark "
                            "eviction not keeping up")
                ok = prec.get("hash_match_oracle",
                              prec.get("hash_match_oracle_distinct"))
                print(f"  {name}[{prov}]: {sec}s rows={len(rows)} "
                      f"batches={len(curve)} "
                      f"curve={[c['state_rows'] for c in curve]} "
                      f"evicted={sum(c['rows_evicted'] for c in curve)} "
                      + ("OK" if ok else "FAIL"))
                # drop the provider's result eagerly: at 4096x a
                # drain result is ~10M rows — keeping two providers'
                # python tuples + JVM local relations alive is what
                # OOM'd an 8g driver (see DRIVER SIZING above)
                rows, df = [], None
            if len(prov_hashes) == 2 \
                    and len(set(prov_hashes.values())) != 1:
                violations.append(
                    f"{name}: providers disagree "
                    f"({sorted(prov_hashes)})")
    finally:
        shutil.rmtree(probe_dir, ignore_errors=True)
        os.environ.pop("SPARK_GRAFT_MAX_FILES_PER_TRIGGER", None)
        os.environ.pop("SPARK_GRAFT_STATE_PARTITIONS", None)

    result["violations"] = violations
    result["pass"] = not violations
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps({"pass": result["pass"],
                      "violations": violations[:5]}))
    return 0 if result["pass"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
