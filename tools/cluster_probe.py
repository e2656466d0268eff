"""Multi-JVM execution probe (round 11, VERDICT r10 item 1).

Every prior green signal (oracle, scale probes, bench) ran under
``local[32]`` — driver and executors share one JVM, so broadcast
serialization, closure capture, and task-side import bugs are
structurally invisible. This probe re-runs the correctness surface
under ``local-cluster[2,16,4096]``: a real standalone master + 2
workers, each launching a SEPARATE executor JVM whose Python workers
run from the executor work dir (NOT the repo checkout) — the closest
this container gets to a real cluster topology.

What local-cluster exercises that local[N] cannot:
  - task binaries / closures cross a real JVM boundary (Java
    serialization + cloudpickle over the wire, not in-process);
  - broadcast variables are torrent-fetched by remote executors;
  - executor Python workers must IMPORT conveyor_spark from
    PYTHONPATH (session.py sets spark.executorEnv.PYTHONPATH for
    local-cluster/spark:// masters — found by this probe: executor
    cwd is the work dir, so the source checkout is not implicitly
    importable the way local[N]'s driver-cwd inheritance makes it);
  - shuffle blocks are fetched over netty between executor JVMs.

Phases (each a subprocess so its Spark session is clean):
  1. full oracle suite (tools/check_oracle.py) at --sf-dir: all
     queries hash-exact vs DuckDB under the cluster master;
  2. streaming probe (tools/streaming_probe.py --scale N): the 5
     stateful streaming ops drained under BOTH state-store
     providers in separate executor JVMs;
  3. recipe probe (tools/recipe_probe.py): both composed recipe
     pipelines end-to-end under the cluster master;
  4. fault injection (VERDICT r10 item 5): re-run a shuffle-heavy
     batch query and a stateful streaming drain while SIGKILLing an
     executor JVM mid-flight; assert Spark's task retry still
     produces the hash-exact oracle result (tools/fault_probe.py).

A pre-flight session records the actual topology (executor count
must be >= 2, distinct from the driver) so the artifact proves the
multi-JVM claim rather than asserting it.

Usage:
    python tools/cluster_probe.py [--sf-dir /root/testdata/sf0.01]
        [--master 'local-cluster[2,16,4096]'] [--executor-mem 3g]
        [--skip PHASE ...] [--out CLUSTER_PROBE_rN.json]

Exit 0 = all phases pass; 1 = violation (named on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def preflight(master: str, executor_mem: str) -> dict:
    """Start one session under the cluster master and record the
    real topology: number of executor JVMs distinct from the driver,
    and a broadcast + shuffle + Python-worker round-trip."""
    env_backup = dict(os.environ)
    os.environ["SPARK_GRAFT_MASTER"] = master
    os.environ["SPARK_GRAFT_EXECUTOR_MEM"] = executor_mem
    try:
        sys.path.insert(0, REPO)
        from conveyor_spark.session import get_spark

        spark = get_spark(app_name="cluster-preflight")
        sc = spark.sparkContext
        # exercise broadcast + shuffle + Python worker in one plan:
        # a broadcast-joined agg through mapInPandas (this also
        # forces executor registration — counting before the first
        # job sees only the driver)
        from pyspark.sql import functions as F

        dim = spark.range(10).withColumnRenamed("id", "k")
        fact = spark.range(10_000).selectExpr("id % 10 as k", "id as v")
        joined = fact.join(F.broadcast(dim), "k").groupBy("k").sum("v")

        def ident(it):
            for pdf in it:
                yield pdf

        got = joined.mapInPandas(ident, joined.schema).count()
        # getExecutorMemoryStatus lists the driver too; executors
        # are the rest (PySpark's StatusTracker has no executor
        # list). Poll briefly: registration can trail the first job.
        n_exec, hosts = 0, ""
        for _ in range(30):
            mem_status = sc._jsc.sc().getExecutorMemoryStatus()
            hosts = str(mem_status.keys().mkString(","))
            n_exec = max(0, int(mem_status.size()) - 1)
            if n_exec >= 2:
                break
            time.sleep(1)
        topo = {
            "master": master,
            "executors": n_exec,
            "executor_endpoints": hosts,
            "roundtrip_rows": got,
        }
        spark.stop()
        return topo
    finally:
        os.environ.clear()
        os.environ.update(env_backup)


def run_phase(cmd: list[str], env_extra: dict, timeout_s: int) -> dict:
    env = {**os.environ, **env_extra}
    t0 = time.time()
    try:
        proc = subprocess.run(
            cmd, cwd=REPO, env=env, timeout=timeout_s,
            capture_output=True, text=True,
        )
        rc = proc.returncode
        tail = (proc.stdout or "")[-2000:]
        err_tail = (proc.stderr or "")[-1000:]
    except subprocess.TimeoutExpired:
        rc, tail, err_tail = -1, "", f"timeout after {timeout_s}s"
    return {"cmd": " ".join(cmd), "returncode": rc,
            "seconds": round(time.time() - t0, 1),
            "stdout_tail": tail, "stderr_tail": err_tail}


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument("--master", default="local-cluster[2,16,4096]")
    ap.add_argument("--executor-mem", default="3g")
    ap.add_argument("--stream-scale", type=int, default=4)
    ap.add_argument("--skip", nargs="*", default=[],
                    choices=["oracle", "streaming", "recipes", "faults"])
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    env_cluster = {
        "SPARK_GRAFT_MASTER": args.master,
        "SPARK_GRAFT_EXECUTOR_MEM": args.executor_mem,
    }
    result: dict = {"master": args.master, "sf_dir": args.sf_dir,
                    "executor_mem": args.executor_mem, "phases": {}}
    violations: list[str] = []

    print(f"== preflight: {args.master}", flush=True)
    topo = preflight(args.master, args.executor_mem)
    result["topology"] = topo
    if topo["executors"] < 2:
        violations.append(
            f"preflight: expected >=2 executor JVMs, saw {topo['executors']}"
        )
    if topo["roundtrip_rows"] != 10:
        violations.append(
            f"preflight: broadcast/shuffle/pandas roundtrip returned "
            f"{topo['roundtrip_rows']} rows, expected 10"
        )

    if "oracle" not in args.skip:
        print("== phase: oracle suite under cluster master", flush=True)
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            oracle_out = f.name
        rec = run_phase(
            [sys.executable, "tools/check_oracle.py", args.sf_dir],
            {**env_cluster, "SPARK_GRAFT_ORACLE_OUT": oracle_out},
            timeout_s=3600,
        )
        try:
            with open(oracle_out) as f:
                report = json.load(f)["queries"]
            n_pass = sum(
                1 for r in report.values()
                if r.get("hash_match") is True and not r.get("err")
            )
            n_rows_only = sum(
                1 for r in report.values()
                if r.get("err") is None and r.get("hash_match") is None
                and r.get("spark_rows") is not None
                and r.get("oracle_rows") is None
            )
            bad = sorted(
                name for name, r in report.items()
                if r.get("err") or r.get("hash_match") is False
                or r.get("rows_match") is False
                or r.get("schema_match") is False
            )
            rec.update({"queries_total": len(report), "hash_exact": n_pass,
                        "rows_only": n_rows_only, "failed": bad})
            if bad:
                violations.append(f"oracle: {len(bad)} failed under "
                                  f"cluster master: {bad[:10]}")
            if rec["returncode"] != 0:
                violations.append(
                    f"oracle: exit {rec['returncode']} under cluster master"
                )
        except Exception as exc:  # noqa: BLE001
            violations.append(f"oracle: no artifact ({exc})")
        finally:
            os.unlink(oracle_out)
        result["phases"]["oracle"] = rec

    def pass_violations_phase(phase: str, title: str, cmd_fn, env: dict,
                              timeout_s: int = 3600,
                              extra_keys: tuple = ()) -> None:
        """Run one child probe whose artifact carries pass/violations:
        tempfile -> subprocess -> load -> record -> unlink. Shared so
        the artifact-read/except/unlink handling cannot drift between
        phases (it already had, before this helper)."""
        if phase in args.skip:
            return
        print(f"== phase: {title}", flush=True)
        with tempfile.NamedTemporaryFile(suffix=".json", delete=False) as f:
            out_path = f.name
        rec = run_phase(cmd_fn(out_path), env, timeout_s=timeout_s)
        try:
            with open(out_path) as f:
                art = json.load(f)
            rec["pass"] = art.get("pass")
            rec["violations"] = art.get("violations")
            for k in extra_keys:
                rec[k] = art.get(k)
            if not art.get("pass"):
                violations.append(
                    f"{phase}: probe violations {art.get('violations')}"
                )
        except Exception as exc:  # noqa: BLE001
            violations.append(f"{phase}: no artifact ({exc})")
        finally:
            os.unlink(out_path)
        result["phases"][phase] = rec

    pass_violations_phase(
        "streaming", "streaming probe under cluster master",
        lambda out: [sys.executable, "tools/streaming_probe.py",
                     "--sf-dir", args.sf_dir,
                     "--scale", str(args.stream_scale), "--out", out],
        env_cluster,
    )
    pass_violations_phase(
        "recipes", "recipe probe under cluster master",
        lambda out: [sys.executable, "tools/recipe_probe.py",
                     "--sf-dir", args.sf_dir, "--out", out],
        env_cluster,
    )
    pass_violations_phase(
        "faults", "executor fault injection",
        lambda out: [sys.executable, "tools/fault_probe.py",
                     "--sf-dir", args.sf_dir, "--master", args.master,
                     "--executor-mem", args.executor_mem, "--out", out],
        {}, timeout_s=1800, extra_keys=("kills",),
    )

    result["violations"] = violations
    result["pass"] = not violations
    out = args.out or os.path.join(REPO, "CLUSTER_PROBE.json")
    with open(out, "w") as f:
        json.dump(result, f, indent=2)
    print(f"wrote {out}  pass={result['pass']}")
    for v in violations:
        print(f"VIOLATION: {v}", file=sys.stderr)
    return 1 if violations else 0


if __name__ == "__main__":
    raise SystemExit(main())
