"""Tests for table.upsert and diff.apply (transforms/snapshot.py)."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


@pytest.fixture(scope="module")
def snap(spark):
    return spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30)], ["id", "name", "v"])


def test_upsert_update_insert_delete(ctx, spark, snap):
    changes = spark.createDataFrame(
        [(2, "b2", 21, False), (4, "d", 40, False), (3, None, 0, True)],
        ["id", "name", "v", "_del"])
    out = {r["id"]: (r["name"], r["v"]) for r in run_op(
        ctx, "table.upsert", [snap, changes], key="id",
        delete_column="_del").collect()}
    assert out == {1: ("a", 10), 2: ("b2", 21), 4: ("d", 40)}  # 3 deleted


def test_upsert_without_delete_column(ctx, spark, snap):
    changes = spark.createDataFrame([(1, "a9", 99)], ["id", "name", "v"])
    out = {r["id"]: r["v"] for r in run_op(
        ctx, "table.upsert", [snap, changes], key="id").collect()}
    assert out == {1: 99, 2: 20, 3: 30}


def test_upsert_duplicate_change_keys_error(ctx, spark, snap):
    from pyspark.errors import PySparkException

    dup = spark.createDataFrame(
        [(1, "a1", 1), (1, "a2", 2)], ["id", "name", "v"])
    with pytest.raises(PySparkException, match="duplicate key"):
        run_op(ctx, "table.upsert", [snap, dup], key="id").collect()


def test_upsert_last_wins(ctx, spark, snap):
    dup = spark.createDataFrame(
        [(1, "a1", 1, 100), (1, "a2", 2, 200), (4, "d", 40, 50)],
        ["id", "name", "v", "seq"])
    out = {r["id"]: (r["name"], r["v"]) for r in run_op(
        ctx, "table.upsert", [snap, dup], key="id",
        on_duplicate="last_wins", order_column="seq").collect()}
    assert out == {1: ("a2", 2), 2: ("b", 20), 3: ("c", 30), 4: ("d", 40)}
    with pytest.raises(ConfigError, match="order_column"):
        run_op(ctx, "table.upsert", [snap, dup], key="id", on_duplicate="last_wins")
    with pytest.raises(ConfigError, match="on_duplicate"):
        run_op(ctx, "table.upsert", [snap, dup], key="id", on_duplicate="nope")


def test_upsert_schema_mismatch_errors(ctx, spark, snap):
    bad = spark.createDataFrame([(1, "x")], ["id", "name"])
    with pytest.raises(ConfigError):
        run_op(ctx, "table.upsert", [snap, bad], key="id")
    with pytest.raises(ConfigError):
        run_op(ctx, "table.upsert", [snap, snap])


def test_diff_statuses_and_changed_columns(ctx, spark):
    before = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (5, None, 50)],
        ["id", "name", "v"])
    after = spark.createDataFrame(
        [(1, "a", 10), (2, "B", 21), (4, "d", 40), (5, None, 50)],
        ["id", "name", "v"])
    out = {r["id"]: r for r in run_op(
        ctx, "diff.apply", [before, after], key="id").collect()}
    assert out[2]["diff_status"] == "changed"
    assert sorted(out[2]["changed_columns"]) == ["name", "v"]
    assert out[3]["diff_status"] == "removed" and out[3]["changed_columns"] == []
    assert out[4]["diff_status"] == "added"
    assert 1 not in out and 5 not in out  # unchanged omitted (NULL-safe)
    full = run_op(ctx, "diff.apply", [before, after], key="id",
                  include_unchanged=True).collect()
    assert {r["id"]: r["diff_status"] for r in full}[1] == "unchanged"


def test_diff_null_transitions(ctx, spark):
    before = spark.createDataFrame([(1, None)], "id bigint, x string")
    after = spark.createDataFrame([(1, "now")], "id bigint, x string")
    out = run_op(ctx, "diff.apply", [before, after], key="id").collect()
    assert out[0]["diff_status"] == "changed" and out[0]["changed_columns"] == ["x"]


def test_diff_schema_mismatch_errors(ctx, spark, snap):
    other = spark.createDataFrame([(1, "a")], ["id", "name"])
    with pytest.raises(ConfigError):
        run_op(ctx, "diff.apply", [snap, other], key="id")


# -- scd2.apply -------------------------------------------------------------

from datetime import datetime


@pytest.fixture(scope="module")
def hist(spark):
    jan = datetime(2024, 1, 1)
    mar = datetime(2024, 3, 1)
    rows = [
        # key 1: one closed version + one current
        (1, "v1", jan, mar, False), (1, "v2", mar, None, True),
        # key 2: current only
        (2, "x", jan, None, True),
    ]
    return spark.createDataFrame(
        rows, "id bigint, val string, valid_from timestamp, "
              "valid_to timestamp, is_current boolean")


def test_scd2_close_open_and_passthrough(ctx, spark, hist):
    jun = datetime(2024, 6, 1)
    upd = spark.createDataFrame([(1, "v3", jun), (3, "new", jun)],
                                "id bigint, val string, eff timestamp")
    out = run_op(ctx, "scd2.apply", [hist, upd], key="id", ts_column="eff")
    rows = sorted(
        ((r["id"], r["val"], r["is_current"], r["valid_to"]) for r in out.collect()))
    assert rows == [
        (1, "v1", False, datetime(2024, 3, 1)),   # old closed row untouched
        (1, "v2", False, jun),                     # current closed at eff
        (1, "v3", True, None),                     # new current
        (2, "x", True, None),                      # untouched key
        (3, "new", True, None),                    # brand-new key
    ]


def test_scd2_skip_unchanged(ctx, spark, hist):
    jun = datetime(2024, 6, 1)
    upd = spark.createDataFrame([(2, "x", jun)],
                                "id bigint, val string, eff timestamp")
    out = run_op(ctx, "scd2.apply", [hist, upd], key="id", ts_column="eff")
    assert out.count() == 3  # no-op: nothing closed, nothing opened
    forced = run_op(ctx, "scd2.apply", [hist, upd], key="id", ts_column="eff",
                    skip_unchanged=False)
    assert forced.count() == 4


def test_scd2_all_null_value_columns_survive(ctx, spark):
    # presence must come from join flags, not value-NULL tests: a current
    # row whose tracked value is NULL (and NULL valid_from) still keeps /
    # closes correctly
    jan = datetime(2024, 1, 1)
    jun = datetime(2024, 6, 1)
    hist = spark.createDataFrame(
        [(1, None, None, None, True), (2, None, None, None, True)],
        "id bigint, val string, valid_from timestamp, "
        "valid_to timestamp, is_current boolean")
    upd = spark.createDataFrame([(1, "now", jun)],
                                "id bigint, val string, eff timestamp")
    out = run_op(ctx, "scd2.apply", [hist, upd], key="id", ts_column="eff")
    rows = sorted(
        ((r["id"], r["val"], r["is_current"]) for r in out.collect()),
        key=lambda t: (t[0], t[1] is not None, t[1] or "", t[2]),
    )
    # key 1: NULL-valued current closed + new current; key 2 passes through
    assert rows == [(1, None, False), (1, "now", True), (2, None, True)]


def test_scd2_null_ts_column_raises(ctx, spark, hist):
    from pyspark.errors import PySparkException

    upd = spark.createDataFrame([(1, "v9", None)],
                                "id bigint, val string, eff timestamp")
    with pytest.raises(PySparkException, match="NULL 'eff'"):
        run_op(ctx, "scd2.apply", [hist, upd], key="id", ts_column="eff").collect()


def test_scd2_schema_validation(ctx, spark, hist):
    bad = spark.createDataFrame([(1, "v")], "id bigint, val string")
    with pytest.raises(ConfigError):
        run_op(ctx, "scd2.apply", [hist, bad], key="id", ts_column="eff")
    with pytest.raises(ConfigError):
        run_op(ctx, "scd2.apply", [hist, hist], key="id")
