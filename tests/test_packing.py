"""Tests for pack.sequences (datapipe/packing.py)."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


@pytest.fixture(scope="module")
def docs(spark):
    # weights chosen so several packs per shard occur at budget=100
    rows = [(i, 10 + (i * 37) % 80) for i in range(200)]
    return spark.createDataFrame(rows, ["id", "tok"])


def _packs(ctx, df, **kw):
    cfg = dict(weight_column="tok", budget=100, id_column="id", shards=8)
    cfg.update(kw)
    return run_op(ctx, "pack.sequences", [df], **cfg)


def test_budget_respected_and_all_rows_kept(ctx, docs):
    out = _packs(ctx, docs).collect()
    assert len(out) == 200
    fills = {}
    for r in out:
        fills[r["pack_id"]] = fills.get(r["pack_id"], 0) + r["tok"]
    assert all(f <= 100 for f in fills.values())
    # packs are reasonably full (next-fit with avg weight ~50)
    assert sum(fills.values()) / (100 * len(fills)) > 0.5


def test_partition_invariance(ctx, docs):
    a = {r["id"]: r["pack_id"] for r in _packs(ctx, docs).collect()}
    b = {r["id"]: r["pack_id"] for r in _packs(ctx, docs.repartition(17)).collect()}
    c = {r["id"]: r["pack_id"] for r in _packs(ctx, docs.coalesce(1)).collect()}
    assert a == b == c


def test_next_fit_order_within_shard(ctx, spark):
    """With one shard, packing must follow id order exactly."""
    df = spark.createDataFrame(
        [(1, 60), (2, 50), (3, 40), (4, 100), (5, 10)], ["id", "tok"])
    out = {r["id"]: r["pack_id"] for r in _packs(ctx, df, shards=1).collect()}
    # next-fit: [60], [50,40], [100], [10]
    assert out[1] == 0 and out[2] == out[3] == 1 and out[4] == 2 and out[5] == 3


def test_oversize_policies(ctx, spark):
    df = spark.createDataFrame([(1, 50), (2, 500), (3, 60)], ["id", "tok"])
    own = _packs(ctx, df, shards=1).collect()
    heavy = [r for r in own if r["id"] == 2][0]
    others = [r["pack_id"] for r in own if r["id"] != 2]
    assert heavy["pack_id"] not in others  # oversize row alone
    dropped = _packs(ctx, df, shards=1, oversize="drop").collect()
    assert sorted(r["id"] for r in dropped) == [1, 3]
    with pytest.raises(Exception):
        _packs(ctx, df, shards=1, oversize="error").collect()


def test_null_weights_count_zero(ctx, spark):
    df = spark.createDataFrame([(1, 90), (2, None), (3, 5)], ["id", "tok"])
    out = {r["id"]: r["pack_id"] for r in _packs(ctx, df, shards=1).collect()}
    assert out[1] == out[2] == out[3]  # 90 + 0 + 5 <= 100


def test_config_errors(ctx, docs):
    for bad in (dict(budget=0), dict(shards=0), dict(oversize="nope")):
        with pytest.raises(ConfigError):
            _packs(ctx, docs, **bad)
    with pytest.raises(ConfigError):
        run_op(ctx, "pack.sequences", [docs], budget=10, id_column="id")
