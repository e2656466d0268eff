"""Tests for sort.zorder (transforms/zorder.py)."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


@pytest.fixture(scope="module")
def grid(spark):
    # 16x16 integer grid
    return spark.createDataFrame(
        [(x * 16 + y, float(x), float(y)) for x in range(16) for y in range(16)],
        ["id", "x", "y"])


def _py_z(x, y, bits):
    z = 0
    for b in range(bits):
        z |= ((x >> b) & 1) << (2 * b)
        z |= ((y >> b) & 1) << (2 * b + 1)
    return z


def test_zvalue_matches_reference_interleave(ctx, grid):
    out = run_op(ctx, "sort.zorder", [grid], columns=["x", "y"], bits=4,
                 cluster=False, output_column="zv").collect()
    for r in out:
        assert r["zv"] == _py_z(int(r["x"]), int(r["y"]), 4), (r["x"], r["y"])


def test_zorder_file_bounding_boxes_tight_on_both_dims(ctx, grid):
    """The property parquet pruning actually uses: split the sorted
    order into 16-row 'files'; z-order keeps EVERY file's min/max
    range tight on BOTH dims (4x4 tiles), while a linear sort is
    tight on one dim and spans the whole domain on the other."""
    rows = run_op(ctx, "sort.zorder", [grid], columns=["x", "y"], bits=4,
                  cluster=False, output_column="zv").collect()
    zsorted = sorted(rows, key=lambda r: r["zv"])
    lin = sorted(rows, key=lambda r: (r["x"], r["y"]))

    def max_ranges(seq):
        rx = ry = 0
        for i in range(0, len(seq), 16):
            chunk = seq[i:i + 16]
            rx = max(rx, max(r["x"] for r in chunk) - min(r["x"] for r in chunk))
            ry = max(ry, max(r["y"] for r in chunk) - min(r["y"] for r in chunk))
        return rx, ry

    zx, zy = max_ranges(zsorted)
    lx, ly = max_ranges(lin)
    assert zx == 3 and zy == 3        # 4x4 tiles: prunable on both dims
    assert lx == 0 and ly == 15       # linear: one dim degenerate, one full-span


def test_zorder_cluster_plan_and_order(ctx, grid):
    out = run_op(ctx, "sort.zorder", [grid], columns=["x", "y"], bits=4,
                 num_partitions=4)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "rangepartitioning" in plan.replace(" ", "").lower()
    assert "_zvalue" not in out.columns  # helper dropped by default
    # each partition is sorted by z internally: verify via partition id
    from pyspark.sql import functions as F
    withpid = run_op(ctx, "sort.zorder", [grid], columns=["x", "y"], bits=4,
                     num_partitions=4, keep_zvalue=True)
    pdf = withpid.withColumn("pid", F.spark_partition_id()).collect()
    by_pid = {}
    for r in pdf:
        by_pid.setdefault(r["pid"], []).append(r["_zvalue"])
    for zs in by_pid.values():
        assert zs == sorted(zs)


def test_zorder_nulls_and_constant_dims(ctx, spark):
    df = spark.createDataFrame(
        [(1, None, 5.0), (2, 3.0, 5.0), (3, 9.0, 5.0)], ["id", "x", "y"])
    out = {r["id"]: r["zv"] for r in run_op(
        ctx, "sort.zorder", [df], columns=["x", "y"], bits=4,
        cluster=False, output_column="zv").collect()}
    assert out[1] == 0  # null -> level 0; constant y -> level 0 everywhere
    assert out[2] == 0  # x=min -> level 0
    assert out[3] > 0


def test_zorder_config_errors(ctx, grid):
    with pytest.raises(ConfigError):
        run_op(ctx, "sort.zorder", [grid], columns=["x"])
    with pytest.raises(ConfigError):
        run_op(ctx, "sort.zorder", [grid], columns=["x", "y"], bits=32)
