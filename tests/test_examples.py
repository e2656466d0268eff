"""Every shipped example pipeline must validate AND run."""

from __future__ import annotations

import glob
import pathlib

import pytest

from conveyor_spark.compiler import run_pipeline
from conveyor_spark.config.spec import load_spec

EXAMPLES = sorted(glob.glob("/root/repo/examples/*.toml"))


@pytest.mark.parametrize("path", EXAMPLES, ids=[pathlib.Path(p).stem for p in EXAMPLES])
def test_example_validates(path):
    spec = load_spec(path)
    assert spec.stages


@pytest.mark.parametrize("path", EXAMPLES, ids=[pathlib.Path(p).stem for p in EXAMPLES])
def test_example_runs(spark, path):
    spec = load_spec(path)
    result = run_pipeline(spark, spec)
    assert not result.errors


def test_simple_example_output():
    out = pathlib.Path("/tmp/conveyor-examples/big_orders.csv")
    assert out.exists()
    header, *rows = out.read_text().strip().splitlines()
    assert "price_with_uplift" in header
    assert len(rows) > 0


def test_layout_ops(spark, ctx):
    from tests.conftest import run_op

    df = spark.range(0, 1000)
    rp = run_op(ctx, "repartition.apply", [df], num_partitions=8, by="id")
    assert rp.rdd.getNumPartitions() == 8
    co = run_op(ctx, "coalesce.apply", [rp], num_partitions=2)
    assert co.rdd.getNumPartitions() == 2
    ca = run_op(ctx, "cache.apply", [df], storage_level="MEMORY_ONLY")
    assert ca.storageLevel.useMemory
    ca.unpersist()
