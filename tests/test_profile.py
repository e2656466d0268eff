"""Tests for profile.apply and the knn.brute query-side guard."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def test_profile_stats(ctx, spark):
    df = spark.createDataFrame(
        [(1, "a"), (2, "a"), (3, None), (None, "b")], ["x", "y"]
    )
    out = {r["column"]: r for r in run_op(ctx, "profile.apply", [df]).collect()}
    assert out["x"]["n_rows"] == 4 and out["x"]["n_nulls"] == 1
    assert out["x"]["n_distinct"] == 3
    assert out["x"]["min_value"] == "1" and out["x"]["max_value"] == "3"
    assert out["y"]["n_nulls"] == 1 and out["y"]["n_distinct"] == 2


def test_profile_single_job_and_options(ctx, spark):
    df = spark.createDataFrame([(1, "a")], ["x", "y"])
    approx = run_op(ctx, "profile.apply", [df], distinct="approx")
    assert approx.count() == 2
    none = {r["column"]: r for r in run_op(ctx, "profile.apply", [df], distinct="none").collect()}
    assert none["x"]["n_distinct"] is None
    with pytest.raises(ConfigError):
        run_op(ctx, "profile.apply", [df], columns=["zz"])


def test_knn_brute_rejects_huge_query_id_list(ctx, spark):
    df = spark.createDataFrame([(i, [0.0, 1.0]) for i in range(5)], ["id", "embedding"])
    with pytest.raises(ConfigError):
        run_op(ctx, "knn.brute", [df], id_column="id", query_ids=[1, 2, 3],
               max_queries=2)
    out = run_op(ctx, "knn.brute", [df], id_column="id", query_ids=[1, 2], k=1)
    assert out.count() == 2
