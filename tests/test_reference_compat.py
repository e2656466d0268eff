"""A pipeline written against the REFERENCE's documented config keys
(docs/builtin-functions.md) must run unchanged here — drop-in parity:
csv has_headers, sort by/per-column descending, distinct subset,
validate.schema unique, aggregate.stream column, file.watch
poll_interval_ms, stdin.read json default."""

from __future__ import annotations

import io

from tests.conftest import run_op


def test_csv_has_headers_alias(ctx, tmp_path):
    f = tmp_path / "in.csv"
    f.write_text("id;name\n1;a\n2;b\n")
    df = run_op(ctx, "csv.read", [], path=str(f), has_headers=True, delimiter=";")
    assert df.columns == ["id", "name"] and df.count() == 2
    out = tmp_path / "out.csv"
    run_op(ctx, "csv.write", [df], path=str(out), has_headers=False, delimiter=";")
    assert out.read_text().splitlines()[0].startswith(("1;", "2;"))


def test_sort_by_alias_with_per_column_descending(ctx, spark):
    df = spark.createDataFrame(
        [("a", 3), ("b", 1), ("a", 1), ("b", 2)], "cat string, price int"
    )
    out = run_op(ctx, "sort.apply", [df], by=["cat", "price"], descending=[False, True])
    assert [(r["cat"], r["price"]) for r in out.collect()] == [
        ("a", 3), ("a", 1), ("b", 2), ("b", 1)
    ]


def test_distinct_subset_alias(ctx, spark):
    df = spark.createDataFrame([("x", 1), ("x", 2), ("y", 3)], "email string, n int")
    out = run_op(ctx, "distinct.apply", [df], subset=["email"])
    assert out.select("email").distinct().count() == 2
    assert out.count() == 2


def test_validate_unique_alias(ctx, spark):
    import pytest

    from conveyor_spark.errors import ValidationError

    df = spark.createDataFrame([(1,), (1,)], "id int")
    with pytest.raises(ValidationError, match="duplicate"):
        run_op(ctx, "validate.schema", [df], unique=["id"]).collect()


def test_aggregate_stream_column_alias(ctx, spark):
    df = spark.createDataFrame([("a", 2.0), ("a", 3.0)], "k string, v double")
    out = run_op(ctx, "aggregate.stream", [df], operation="sum",
                 column="v", group_by=["k"])
    assert out.collect()[0]["sum_v"] == 5.0


def test_stdin_default_is_json_array(ctx):
    out = run_op(ctx, "stdin.read", [], _text='[{"x": 1}, {"x": 2}]')
    assert out.count() == 2


def test_file_watch_poll_interval_ms(ctx, tmp_path):
    # reemit path validates the knob parse without starting the poller
    f = tmp_path / "w.json"
    f.write_text('{"x": 1}\n')
    df = run_op(ctx, "file.watch", [], path=str(f), format="jsonl",
                schema="x INT", reemit_on_modify=True, poll_interval_ms=50,
                _no_poller_thread=True)
    assert df.isStreaming
