"""Tests for validate.expectations and drift.psi (datapipe/quality.py)."""

from __future__ import annotations

import math

import pytest

from conveyor_spark.errors import ConfigError, ValidationError
from tests.conftest import run_op


@pytest.fixture(scope="module")
def tbl(spark):
    rows = [(i, f"u{i}@ex.com" if i != 7 else "not-an-email",
             float(i) / 10, None if i == 3 else "x") for i in range(10)]
    return spark.createDataFrame(rows, ["id", "email", "score", "tag"])


def test_expectations_pass_through(ctx, tbl):
    out = run_op(ctx, "validate.expectations", [tbl], expectations=[
        {"kind": "row_count", "min": 5, "max": 100},
        {"kind": "unique", "column": "id"},
        {"kind": "in_range", "column": "score", "min": 0.0, "max": 1.0},
        {"kind": "not_null", "column": "tag", "max_null_fraction": 0.2},
        {"kind": "matches", "column": "email", "pattern": r"^[^@]+@[^@]+$",
         "min_fraction": 0.8},
    ])
    assert out.count() == 10  # unchanged pass-through


def test_expectations_failure_lists_all(ctx, tbl):
    with pytest.raises(ValidationError) as e:
        run_op(ctx, "validate.expectations", [tbl], expectations=[
            {"kind": "row_count", "min": 100},
            {"kind": "not_null", "column": "tag"},
            {"kind": "accepted_values", "column": "email", "values": ["a"]},
        ])
    msg = str(e.value)
    assert "row_count" in msg and "not_null(tag)" in msg and "accepted_values" in msg


def test_expectations_metrics_mode(ctx, tbl):
    out = {r["expectation"]: r for r in run_op(
        ctx, "validate.expectations", [tbl], mode="metrics", expectations=[
            {"kind": "unique", "column": "id"},
            {"kind": "unique", "column": "tag"},
            {"kind": "matches", "column": "email", "pattern": "@"},
        ]).collect()}
    assert out["unique(id)"]["passed"] is True
    assert out["unique(tag)"]["passed"] is False  # 'x' repeats
    assert out["matches(email)"]["passed"] is False
    assert "match_fraction=0.9" in out["matches(email)"]["detail"]


def test_expectations_config_errors(ctx, tbl):
    with pytest.raises(ConfigError):
        run_op(ctx, "validate.expectations", [tbl])
    with pytest.raises(ConfigError):
        run_op(ctx, "validate.expectations", [tbl],
               expectations=[{"kind": "bogus"}])


# -- drift.psi --------------------------------------------------------------

def test_psi_identical_distributions_zero(ctx, spark):
    a = spark.createDataFrame([(float(i % 10),) for i in range(1000)], ["v"])
    out = run_op(ctx, "drift.psi", [a, a], column="v", min=0, max=10,
                 bins=10).collect()
    assert len(out) == 10
    assert all(abs(r["psi_bin"]) < 1e-12 for r in out)
    assert abs(out[0]["psi_total"]) < 1e-12


def test_psi_detects_shift(ctx, spark):
    ref = spark.createDataFrame([(float(i % 10),) for i in range(1000)], ["v"])
    cur = spark.createDataFrame([(float(i % 5),) for i in range(1000)], ["v"])
    out = run_op(ctx, "drift.psi", [ref, cur], column="v", min=0, max=10,
                 bins=10).collect()
    total = out[0]["psi_total"]
    assert total > 0.25  # half the mass vanished: clearly shifted
    # reference python check on one populated bin
    r = {x["bin"]: x for x in out}
    p_ref, p_cur = r[0]["p_ref"], r[0]["p_cur"]
    assert r[0]["psi_bin"] == pytest.approx((p_cur - p_ref) * math.log(p_cur / p_ref))


def test_psi_empty_bins_smoothed(ctx, spark):
    ref = spark.createDataFrame([(1.0,), (9.0,)], ["v"])
    cur = spark.createDataFrame([(1.0,)], ["v"])
    out = run_op(ctx, "drift.psi", [ref, cur], column="v", min=0, max=10,
                 bins=5).collect()
    assert all(math.isfinite(r["psi_bin"]) for r in out)
    assert len(out) == 5  # spine materializes empty bins


def test_psi_clamps_out_of_range(ctx, spark):
    ref = spark.createDataFrame([(-5.0,), (50.0,)], ["v"])
    out = run_op(ctx, "drift.psi", [ref, ref], column="v", min=0, max=10,
                 bins=4).collect()
    by_bin = {r["bin"]: r["n_ref"] for r in out}
    assert by_bin[0] == 1 and by_bin[3] == 1  # edges absorb the outliers


def test_psi_config_errors(ctx, spark):
    df = spark.createDataFrame([(1.0,)], ["v"])
    with pytest.raises(ConfigError):
        run_op(ctx, "drift.psi", [df, df], column="v", min=5, max=5)
    with pytest.raises(ConfigError):
        run_op(ctx, "drift.psi", [df, df], column="v", min=0, max=1, bins=1)
    # min without max (or vice versa) is an error; BOTH absent is the
    # documented derive-from-reference default
    with pytest.raises(ConfigError):
        run_op(ctx, "drift.psi", [df, df], column="v", min=0)


def test_psi_empty_reference_fails_loudly(ctx, spark):
    """Derived-bounds mode with an empty/all-NULL reference must not
    silently report PSI 0 ('stable')."""
    import pytest as _pytest

    ref = spark.createDataFrame([], "v DOUBLE")
    cur = spark.createDataFrame([(1.0,), (2.0,)], "v DOUBLE")
    out = run_op(ctx, "drift.psi", [ref, cur], column="v", bins=4)
    with _pytest.raises(Exception, match="no non-null values"):
        out.collect()
