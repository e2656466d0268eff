"""Every shipped example pipeline must validate AND run."""

from __future__ import annotations

import glob
import pathlib

import pytest

from conveyor_spark.compiler import run_pipeline
from conveyor_spark.config.spec import load_spec

_EXAMPLES_DIR = pathlib.Path(__file__).resolve().parents[1] / "examples"
EXAMPLES = sorted(glob.glob(str(_EXAMPLES_DIR / "*.toml")))
assert EXAMPLES, f"no example pipelines found in {_EXAMPLES_DIR}"


@pytest.mark.parametrize("path", EXAMPLES, ids=[pathlib.Path(p).stem for p in EXAMPLES])
def test_example_validates(path):
    spec = load_spec(path)
    assert spec.stages


@pytest.mark.parametrize("path", EXAMPLES, ids=[pathlib.Path(p).stem for p in EXAMPLES])
def test_example_runs(spark, path):
    spec = load_spec(path)
    result = run_pipeline(spark, spec)
    assert not result.errors


def test_simple_example_output(spark):
    # self-contained: remove any stale artifact, run THIS pipeline,
    # assert the output it just produced
    out = pathlib.Path("/tmp/conveyor-examples/big_orders.csv")
    out.unlink(missing_ok=True)
    spec = load_spec(str(_EXAMPLES_DIR / "simple_pipeline.toml"))
    run_pipeline(spark, spec)
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
