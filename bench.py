"""Benchmark harness: runs the query suite on SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) and prints ONE JSON line:

    {"metric": ..., "value": total_sec, "unit": "sec",
     "queries": {name: sec, ...}, "sf": ...}

Each query executes end-to-end into a `noop` sink (full compute, no
driver-side result transfer). Usage: python bench.py [query ...]
"""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    only = set(sys.argv[1:])

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from conveyor_spark.queries import QUERIES
    from conveyor_spark.session import get_spark

    spark = get_spark(app_name="conveyor-bench")
    # warm the JVM + parquet footers with a trivial job
    spark.read.parquet(f"{sf_dir}/region.parquet").count()

    timings: dict[str, float] = {}
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, sf_dir)
            df.write.mode("overwrite").format("noop").save()
        except Exception as exc:  # noqa: BLE001
            print(f"bench: {name} failed: {type(exc).__name__}: {str(exc)[:200]}", file=sys.stderr)
            timings[name] = -1.0
            continue
        timings[name] = round(time.time() - t0, 3)

    total = round(sum(v for v in timings.values() if v >= 0), 3)
    # round-1 baseline covered q01-q50; keep a same-scope subtotal so
    # cross-round comparisons aren't skewed by suite growth
    def _qnum(n: str) -> int:
        digits = "".join(c for c in n[1:] if c.isdigit() or c == "_").split("_")[0]
        return int(digits) if digits.isdigit() else 999

    r1_scope = {n: v for n, v in timings.items() if _qnum(n) <= 50}
    baseline_total = round(sum(v for v in r1_scope.values() if v >= 0), 3)
    print(json.dumps({
        "metric": "conveyor_spark query suite wall time",
        "value": total,
        "unit": "sec",
        "value_r1_scope": baseline_total,
        "n_queries": len(timings),
        "queries": timings,
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
    }))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
