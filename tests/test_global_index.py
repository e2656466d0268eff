"""global_sequence: the two-phase bucket-offset global row index
(the scalable replacement for unpartitioned Window.orderBy)."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from conveyor_spark.transforms.global_index import global_sequence
from tests.conftest import run_op


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def _assert_exact_sequence(df, order_key):
    rows = df.collect()
    ordered = sorted(rows, key=order_key)
    assert [r["seq"] for r in ordered] == list(range(len(rows)))


def test_numeric_key_exact_and_invariant(spark):
    df = spark.createDataFrame([(i * 7 % 1000, f"v{i}") for i in range(1000)], "k INT, v STRING")
    out = global_sequence(df.repartition(5), ["k", "v"], "seq")
    _assert_exact_sequence(out.select("k", "v", "seq"), lambda r: (r["k"], r["v"]))
    # invariant under a different input layout
    out2 = global_sequence(df.repartition(11), ["k", "v"], "seq")
    a = {(r["k"], r["v"], r["seq"]) for r in out.collect()}
    b = {(r["k"], r["v"], r["seq"]) for r in out2.collect()}
    assert a == b


def test_string_key_byte_order(spark):
    vals = ["b", "ab", "", "zzz", "a", "Z", "aa", "abc", "z", "B"]
    df = spark.createDataFrame([(v, i) for i, v in enumerate(vals)], "s STRING, i INT")
    out = global_sequence(df, ["s", "i"], "seq")
    _assert_exact_sequence(out.select("s", "i", "seq"), lambda r: (r["s"], r["i"]))


def test_null_keys_sort_first(spark):
    df = spark.createDataFrame([(None, 1), (5, 2), (None, 3), (1, 4)], "k INT, i INT")
    out = {r["i"]: r["seq"] for r in global_sequence(df, ["k", "i"], "seq").collect()}
    assert out[1] == 0 and out[3] == 1  # nulls first, tie-broken by i
    assert out[4] == 2 and out[2] == 3


def test_constant_key_single_bucket_still_correct(spark):
    df = spark.createDataFrame([(1, i) for i in range(50)], "k INT, i INT")
    out = global_sequence(df, ["k", "i"], "seq")
    _assert_exact_sequence(out.select("k", "i", "seq"), lambda r: (r["k"], r["i"]))


def test_no_unpartitioned_window_in_plan(spark):
    df = spark.createDataFrame([(i,) for i in range(100)], "k INT")
    p = _plan(global_sequence(df, ["k"], "seq"))
    win_lines = [ln for ln in p.splitlines() if "Window [" in ln]
    assert win_lines, "expected a Window operator"
    assert all("], [__gidx_bkt" in ln for ln in win_lines), p
    assert "rangepartitioning" not in p  # sampled boundaries are branch-unstable


def test_unsupported_order_type_raises(spark):
    df = spark.createDataFrame([([1, 2],)], "a ARRAY<INT>")
    with pytest.raises(ConfigError, match="unsupported type"):
        global_sequence(df, ["a"], "seq")


def test_chunk_and_window_ops_use_it(ctx, spark):
    df = spark.createDataFrame([(i, i * 2) for i in range(95)], "k INT, v INT")
    chunks = run_op(ctx, "chunk.apply", [df], batch_size=10, order_by="k")
    got = {r["chunk_id"]: len(r["records"]) for r in chunks.collect()}
    assert got == {i: 10 for i in range(9)} | {9: 5}
    win = run_op(ctx, "window.apply", [df], type="tumbling", size=20, order_by="k")
    counts = {r["window_id"]: r["count(1)"] for r in win.groupBy("window_id").count()
              .withColumnRenamed("count", "count(1)").collect()}
    assert counts == {0: 20, 1: 20, 2: 20, 3: 20, 4: 15}
