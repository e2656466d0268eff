"""Scale features: skew-salted joins, bucketed co-located joins."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_salted_join_matches_plain(ctx, spark):
    # heavily skewed left: one hot key
    left = spark.createDataFrame(
        [(1, i) for i in range(500)] + [(2, 1000), (3, 2000)], "k INT, v INT"
    )
    right = spark.createDataFrame([(1, "hot"), (2, "a"), (3, "b"), (4, "never")], "k INT, r STRING")
    plain = run_op(ctx, "join.apply", [left, right], on="k", how="inner")
    salted = run_op(ctx, "join.apply", [left, right], on="k", how="inner", salt=8)
    assert salted.count() == plain.count() == 502
    assert sorted(r["r"] for r in salted.filter("k != 1").collect()) == ["a", "b"]
    # the salt column must not leak
    assert "__salt" not in salted.columns
    # left join parity incl. unmatched rows
    lplain = run_op(ctx, "join.apply", [left, right.filter("k != 2")], on="k", how="left")
    lsalted = run_op(ctx, "join.apply", [left, right.filter("k != 2")], on="k", how="left", salt=4)
    assert lsalted.count() == lplain.count()
    assert lsalted.filter("k = 2 AND r IS NULL").count() == 1


def test_salted_join_rejects_outer(ctx, spark):
    df = spark.createDataFrame([(1,)], "k INT")
    with pytest.raises(ConfigError, match="salt supports"):
        run_op(ctx, "join.apply", [df, df], on="k", how="outer", salt=4)


def test_bucketed_join_no_shuffle(ctx, spark, tmp_path):
    facts = spark.range(0, 10000).selectExpr("id AS k", "id * 2 AS v")
    dims = spark.range(0, 1000).selectExpr("id AS k", "concat('d', id) AS name")
    run_op(ctx, "table.write", [facts], name="t_facts_b", bucket_by="k",
           num_buckets=8, sort_by="k")
    run_op(ctx, "table.write", [dims], name="t_dims_b", bucket_by="k",
           num_buckets=8, sort_by="k")
    f = run_op(ctx, "table.read", [], name="t_facts_b")
    d = run_op(ctx, "table.read", [], name="t_dims_b")
    # disable broadcast so the bucket join is observable
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = f.join(d, on="k")
        plan = _plan(joined)
        assert "SortMergeJoin" in plan
        assert "Exchange hashpartitioning" not in plan  # co-located: no shuffle
        assert joined.count() == 1000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        spark.sql("DROP TABLE IF EXISTS t_facts_b")
        spark.sql("DROP TABLE IF EXISTS t_dims_b")


def test_aqe_splits_skewed_join_partition(ctx, spark):
    """join.apply leaves the plan declarative enough for AQE's
    OptimizeSkewedJoin to split a hot partition at runtime: with one
    key holding ~50x the bytes of the median partition, the FINAL
    adaptive plan must show SortMergeJoin(skew=true) over an
    'AQEShuffleRead skewed' — proof the un-salted path still degrades
    gracefully under skew on a real cluster (salt= remains the
    explicit escape hatch when stats mislead AQE).

    The payload is sha2 output: incompressible, so the hot shuffle
    partition is big in BYTES (AQE's skew test is byte-based;
    a constant payload LZ4-compresses below any threshold).
    """
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64k",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32k",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    old = {k: spark.conf.get(k) for k in confs}
    for k, v in confs.items():
        spark.conf.set(k, v)
    try:
        left = (
            spark.range(0, 50_000)
            .selectExpr("1 AS k", "sha2(cast(id AS string), 256) AS pay")
            .unionAll(
                spark.range(2, 1000).selectExpr("id AS k", "'small' AS pay")
            )
        )
        right = spark.range(1, 1000).selectExpr("id AS k", "concat('r', id) AS r")
        joined = run_op(ctx, "join.apply", [left, right], on="k", how="inner")
        assert len(joined.collect()) == 50_998  # correctness under the split
        plan = _plan(joined)  # same QueryExecution -> final adaptive plan
        assert "isFinalPlan=true" in plan
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan
    finally:
        for k, v in old.items():
            spark.conf.set(k, v)
