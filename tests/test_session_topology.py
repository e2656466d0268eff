"""Topology-dependent session confs (round-11 cluster probe).

The multi-JVM probe (tools/cluster_probe.py) found the one genuinely
cluster-only deployment bug this repo had: executor Python workers
run from the executor work dir, so the source checkout is not
importable there — every mapInPandas closure that references a
conveyor_spark module by name dies with ModuleNotFoundError on a
real cluster while local[N] (workers inherit the driver's cwd)
stays green. These tests pin the fix's logic without needing to
boot a second cluster inside the shared-session test suite."""

from __future__ import annotations

import os

from conveyor_spark.session import _topology_conf


def test_multi_jvm_masters_get_executor_pythonpath(monkeypatch):
    monkeypatch.delenv("PYTHONPATH", raising=False)
    monkeypatch.delenv("SPARK_GRAFT_EXECUTOR_MEM", raising=False)
    for master in ("local-cluster[2,16,4096]", "spark://host:7077"):
        conf = _topology_conf(master)
        path = conf["spark.executorEnv.PYTHONPATH"]
        # the repo root (the dir containing conveyor_spark/) must be
        # importable on executor workers
        assert os.path.isdir(os.path.join(path, "conveyor_spark")), master


def test_executor_pythonpath_prepends_not_replaces(monkeypatch):
    monkeypatch.setenv("PYTHONPATH", "/some/user/libs")
    conf = _topology_conf("local-cluster[2,16,4096]")
    path = conf["spark.executorEnv.PYTHONPATH"]
    assert path.endswith(":/some/user/libs")
    assert os.path.isdir(os.path.join(path.split(":")[0], "conveyor_spark"))


def test_local_masters_left_alone(monkeypatch):
    monkeypatch.delenv("SPARK_GRAFT_EXECUTOR_MEM", raising=False)
    # local[N] workers inherit the driver env/cwd; injecting an
    # executorEnv there would be dead config
    assert _topology_conf("local[32]") == {}
    assert _topology_conf("") == {}


def test_executor_memory_env(monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_EXECUTOR_MEM", "3g")
    conf = _topology_conf("local-cluster[2,16,4096]")
    assert conf["spark.executor.memory"] == "3g"
