"""Multi-JVM smoke: one oracle query + a Python-worker roundtrip
under local-cluster, in a subprocess (a second master cannot join the
suite's shared local[N] JVM). The full surface is probed by
tools/cluster_probe.py per round; this keeps the DIMENSION — closure
/ broadcast serialization across real executor JVMs, executor-side
conveyor_spark imports via spark.executorEnv.PYTHONPATH — from
regressing silently between probe runs."""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, sys
sys.path.insert(0, %(repo)r)
from conveyor_spark.session import get_spark
from conveyor_spark.queries import QUERIES

spark = get_spark(app_name="lc-smoke",
                  master="local-cluster[2,4,1024]",
                  shuffle_partitions=8)
out = {}
# q01: scan + decimal aggregate + sort across executor JVMs
rows = QUERIES["q01_pricing_summary"](spark, "/root/testdata/sf0.001").collect()
out["q01_rows"] = len(rows)
# q44: py.eval -- the mapInPandas closure references conveyor_spark
# modules by name, so executor Python workers must IMPORT the package
# (the exact bug class local[N] masks)
out["q44_rows"] = QUERIES["q44_py_eval"](spark, "/root/testdata/sf0.001").count()
mem = spark.sparkContext._jsc.sc().getExecutorMemoryStatus()
out["jvm_endpoints"] = int(mem.size())
spark.stop()
print("LCSMOKE:" + json.dumps(out))
"""


def test_oracle_query_and_python_worker_under_local_cluster():
    # sanitize topology knobs a probe run may have exported: an
    # inherited SPARK_GRAFT_EXECUTOR_MEM=3g against this master's
    # 1024 MB workers would starve the app (no executors ever
    # allocated) and the test would die at the subprocess timeout
    env = {**os.environ, "SPARK_GRAFT_CPUS": "8"}
    for k in ("SPARK_GRAFT_MASTER", "SPARK_GRAFT_EXECUTOR_MEM",
              "SPARK_GRAFT_DRIVER_MEM"):
        env.pop(k, None)
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT % {"repo": REPO}],
        capture_output=True, text=True, timeout=420, cwd=REPO,
        env=env,
    )
    lines = [l for l in proc.stdout.splitlines() if l.startswith("LCSMOKE:")]
    assert lines, (
        f"no smoke output; rc={proc.returncode}\n"
        f"stdout tail: {proc.stdout[-1500:]}\nstderr tail: {proc.stderr[-1500:]}"
    )
    out = json.loads(lines[-1][len("LCSMOKE:"):])
    assert out["q01_rows"] == 6
    assert out["q44_rows"] > 0
    # driver + 2 executor JVMs
    assert out["jvm_endpoints"] >= 3
