"""Tests for sample.balanced (selection.py), text.html_strip
(curation.py) and anomaly.zscore (stats.py)."""

from __future__ import annotations

import statistics

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


# -- sample.balanced --------------------------------------------------------

@pytest.fixture(scope="module")
def langs(spark):
    rows = [(i, "en" if i < 80 else ("de" if i < 95 else "fr")) for i in range(100)]
    return spark.createDataFrame(rows, ["id", "lang"])


def test_balanced_caps_head_keeps_tail(ctx, langs):
    out = run_op(ctx, "sample.balanced", [langs], by="lang", cap=10,
                 id_column="id").collect()
    by_lang = {}
    for r in out:
        by_lang.setdefault(r["lang"], []).append(r["id"])
    assert len(by_lang["en"]) == 10      # 80 -> capped
    assert len(by_lang["de"]) == 10      # 15 -> capped
    assert len(by_lang["fr"]) == 5       # 5 -> untouched


def test_balanced_deterministic_and_salted_equal(ctx, langs):
    a = {r["id"] for r in run_op(ctx, "sample.balanced", [langs], by="lang",
                                 cap=7, id_column="id").collect()}
    b = {r["id"] for r in run_op(ctx, "sample.balanced", [langs.repartition(9)],
                                 by="lang", cap=7, id_column="id").collect()}
    c = {r["id"] for r in run_op(ctx, "sample.balanced", [langs], by="lang",
                                 cap=7, id_column="id", salt=4).collect()}
    assert a == b == c


def test_balanced_seed_changes_selection(ctx, langs):
    a = {r["id"] for r in run_op(ctx, "sample.balanced", [langs], by="lang",
                                 cap=10, id_column="id", seed="s1").collect()}
    b = {r["id"] for r in run_op(ctx, "sample.balanced", [langs], by="lang",
                                 cap=10, id_column="id", seed="s2").collect()}
    assert a != b


def test_balanced_requires_config(ctx, langs):
    with pytest.raises(ConfigError):
        run_op(ctx, "sample.balanced", [langs], by="lang", cap=5)


# -- text.html_strip --------------------------------------------------------

def test_html_strip_basic(ctx, spark):
    page = ("<html><head><title>T</title><style>p{}</style></head><body>"
            "<h1>Head</h1><p>one &amp; two</p><!-- hidden -->"
            "<script>alert('x')</script><div>tail&nbsp;end</div></body></html>")
    df = spark.createDataFrame([(1, page)], ["id", "html"])
    out = run_op(ctx, "text.html_strip", [df], column="html",
                 output_column="t").collect()[0]["t"]
    assert "alert" not in out and "hidden" not in out and "p{}" not in out
    assert "<" not in out and ">" not in out
    assert "one & two" in out
    assert "tail end" in out
    assert out.startswith("T") and "Head" in out


def test_html_strip_block_tags_become_newlines(ctx, spark):
    df = spark.createDataFrame([(1, "<p>a</p><p>b</p><br>c")], ["id", "h"])
    out = run_op(ctx, "text.html_strip", [df], column="h",
                 output_column="t").collect()[0]["t"]
    assert out == "a\nb\n\nc"  # </p> and <br> -> \n; <p> -> space; <=2 newlines kept


def test_html_strip_plain_text_unchanged(ctx, spark):
    df = spark.createDataFrame([(1, "no markup here, 2 < 3 maybe")], ["id", "h"])
    out = run_op(ctx, "text.html_strip", [df], column="h",
                 output_column="t").collect()[0]["t"]
    # "< 3 maybe" is not a tag (no closing > after <3...): untouched
    assert out == "no markup here, 2 < 3 maybe"


def test_html_strip_switches(ctx, spark):
    df = spark.createDataFrame([(1, "<b>x</b> &amp;   y")], ["id", "h"])
    raw = run_op(ctx, "text.html_strip", [df], column="h", output_column="t",
                 decode_entities=False, collapse_whitespace=False).collect()[0]["t"]
    assert "&amp;" in raw and "   " in raw


# -- anomaly.zscore ---------------------------------------------------------

@pytest.fixture(scope="module")
def metrics(spark):
    rows = [(i, "a", float(v)) for i, v in enumerate([10, 12, 11, 9, 10, 11, 100])]
    rows += [(100 + i, "b", float(v)) for i, v in enumerate([5, 5, 5])]
    rows += [(200, "c", 42.0), (201, "d", None)]
    return spark.createDataFrame(rows, ["id", "grp", "v"])


def test_zscore_values_match_reference(ctx, metrics):
    out = {r["id"]: r for r in run_op(
        ctx, "anomaly.zscore", [metrics], column="v", by="grp",
        threshold=2.0).collect()}
    vals = [10, 12, 11, 9, 10, 11, 100]
    mu, sd = statistics.mean(vals), statistics.stdev(vals)
    assert out[6]["zscore"] == pytest.approx((100 - mu) / sd)
    assert out[6]["is_outlier"] is True
    assert all(not out[i]["is_outlier"] for i in range(6))
    # zero-variance group and singleton group: z=0, never outliers
    assert out[100]["zscore"] == 0.0 and not out[100]["is_outlier"]
    assert out[200]["zscore"] == 0.0 and not out[200]["is_outlier"]
    # NULL value: NULL z, not an outlier
    assert out[201]["zscore"] is None and out[201]["is_outlier"] is False


def test_zscore_filter_mode(ctx, metrics):
    out = run_op(ctx, "anomaly.zscore", [metrics], column="v", by="grp",
                 threshold=2.0, mode="filter")
    ids = {r["id"] for r in out.collect()}
    assert 6 not in ids and len(ids) == 11  # 12 rows in, 1 outlier dropped
    assert "zscore" not in out.columns


def test_zscore_global_no_window_warning(ctx, metrics):
    """Whole-table mode must use a broadcast aggregate, not an
    unpartitioned window."""
    out = run_op(ctx, "anomaly.zscore", [metrics], column="v", threshold=3.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan
    rows = {r["id"]: r["zscore"] for r in out.collect()}
    assert len(rows) == 12 and rows[201] is None


def test_zscore_config_errors(ctx, metrics):
    with pytest.raises(ConfigError):
        run_op(ctx, "anomaly.zscore", [metrics], by="grp")
    with pytest.raises(ConfigError):
        run_op(ctx, "anomaly.zscore", [metrics], column="v", mode="nope")


def test_stats_correlation_exact(ctx, spark):
    import math

    rows = [(float(i), float(2 * i + 1), float((-1) ** i * i), None if i == 3 else float(i * i))
            for i in range(10)]
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE, z DOUBLE, w DOUBLE")
    out = run_op(ctx, "stats.correlation", [df], columns=["x", "y", "z", "w"])
    got = {(r["col_a"], r["col_b"]): r["corr"] for r in out.collect()}
    assert got[("x", "y")] == 1.0                      # perfectly linear
    assert abs(got[("x", "z")]) < 0.6                  # alternating sign

    # pairwise deletion: (x, w) computed over the 9 non-null rows
    import statistics
    xs = [r[0] for r in rows if r[3] is not None]
    ws = [r[3] for r in rows if r[3] is not None]
    n = len(xs)
    sx, sw = sum(xs), sum(ws)
    sxw = sum(a * b for a, b in zip(xs, ws))
    sxx = sum(a * a for a in xs)
    sww = sum(b * b for b in ws)
    expect = (n * sxw - sx * sw) / math.sqrt(
        (n * sxx - sx * sx) * (n * sww - sw * sw))
    assert abs(got[("x", "w")] - expect) < 1e-12

    # zero variance -> NULL, not an ANSI division error
    cdf = spark.createDataFrame([(1.0, 5.0), (2.0, 5.0)], "a DOUBLE, b DOUBLE")
    out2 = run_op(ctx, "stats.correlation", [cdf], columns=["a", "b"])
    assert out2.collect()[0]["corr"] is None


def test_stats_correlation_overflow_is_pairwise_deleted(ctx, spark):
    """Values outside decimal(18,3) (|x| >= 10^15) must behave exactly
    like NULLs — pairwise-deleted with n counted from the CAST values
    (ADVICE r7: counting the originals let n disagree with the moment
    sums, a silently wrong corr; under ANSI a plain cast killed the
    job instead)."""
    import math

    rows = [(float(i), float(2 * i + 1)) for i in range(10)]
    rows[3] = (1e16, rows[3][1])        # overflows the decimal domain
    df = spark.createDataFrame(rows, "x DOUBLE, y DOUBLE")
    out = run_op(ctx, "stats.correlation", [df], columns=["x", "y"])
    got = out.collect()[0]["corr"]

    xs = [r[0] for i, r in enumerate(rows) if i != 3]
    ys = [r[1] for i, r in enumerate(rows) if i != 3]
    n = len(xs)
    sx, sy = sum(xs), sum(ys)
    sxy = sum(a * b for a, b in zip(xs, ys))
    sxx = sum(a * a for a in xs)
    syy = sum(b * b for b in ys)
    expect = (n * sxy - sx * sy) / math.sqrt(
        (n * sxx - sx * sx) * (n * syy - sy * sy))
    assert abs(got - expect) < 1e-12


def test_stats_correlation_grouped(ctx, spark):
    rows = [("g1", float(i), float(3 * i)) for i in range(5)] + \
           [("g2", float(i), float(-i)) for i in range(5)]
    df = spark.createDataFrame(rows, "g STRING, x DOUBLE, y DOUBLE")
    out = run_op(ctx, "stats.correlation", [df], columns=["x", "y"], by=["g"])
    got = {r["g"]: r["corr"] for r in out.collect()}
    assert got["g1"] == 1.0 and got["g2"] == -1.0
