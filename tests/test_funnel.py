"""Tests for event.funnel (datapipe/funnel.py)."""

from __future__ import annotations

from datetime import datetime

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def _ts(h, m=0, s=0):
    return datetime(2024, 1, 1, h, m, s)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # u1 converts in order
        (1, "A", _ts(1)), (1, "B", _ts(2)), (1, "C", _ts(3)),
        # u2 wrong order (C before B)
        (2, "A", _ts(1)), (2, "C", _ts(2)), (2, "B", _ts(3)),
        # u3 stops at B
        (3, "A", _ts(1)), (3, "B", _ts(2)),
        # u4 never starts (B C only)
        (4, "B", _ts(1)), (4, "C", _ts(2)),
        # u5 converts only via the SECOND A's window, first-touch says no
        (5, "A", _ts(0)), (5, "A", _ts(6)), (5, "B", _ts(7)), (5, "C", _ts(8)),
        # u6 same-timestamp B (ties need strictly-later events)
        (6, "A", _ts(1)), (6, "B", _ts(1)),
        # u7 noise events between steps
        (7, "A", _ts(1)), (7, "X", _ts(2)), (7, "B", _ts(3)), (7, "X", _ts(4)), (7, "C", _ts(5)),
    ]
    return spark.createDataFrame(rows, ["uid", "et", "ts"])


def _funnel(ctx, df, **kw):
    cfg = dict(steps=["A", "B", "C"], by="uid", type_column="et", ts_column="ts")
    cfg.update(kw)
    return {r["uid"]: r for r in run_op(ctx, "event.funnel", [df], **cfg).collect()}


def test_funnel_progress(ctx, events):
    out = _funnel(ctx, events)
    assert out[1]["steps_completed"] == 3 and out[1]["converted"]
    assert out[2]["steps_completed"] == 2  # C before B doesn't count, B matches
    assert out[3]["steps_completed"] == 2
    assert 4 not in out  # never reached step 1
    assert out[6]["steps_completed"] == 1  # same-ts B not strictly later
    assert out[7]["steps_completed"] == 3  # noise ignored
    assert out[1]["first_ts"] == _ts(1) and out[1]["last_ts"] == _ts(3)


def test_funnel_first_touch_window(ctx, events):
    # 3h window from FIRST A: u5's chain from t=0 can't reach B at t=7
    out = _funnel(ctx, events, within_seconds=3 * 3600)
    assert out[5]["steps_completed"] == 1 and not out[5]["converted"]
    # without a window u5 still anchors at t=0 but B(7h) > A(0h) works
    out2 = _funnel(ctx, events)
    assert out2[5]["steps_completed"] == 3
    assert out2[5]["first_ts"] == _ts(0)


def test_funnel_converted_only(ctx, events):
    out = _funnel(ctx, events, include_incomplete=False)
    assert set(out) == {1, 5, 7}


def test_funnel_partition_invariance(ctx, events):
    a = {(u, r["steps_completed"]) for u, r in _funnel(ctx, events).items()}
    b = {(u, r["steps_completed"]) for u, r in _funnel(ctx, events.repartition(7)).items()}
    assert a == b


def test_funnel_two_steps(ctx, events):
    out = _funnel(ctx, events, steps=["B", "C"])
    assert out[4]["steps_completed"] == 2  # u4 starts at B now
    assert out[2]["steps_completed"] == 1  # B at t3, no later C


def test_funnel_config_errors(ctx, events):
    with pytest.raises(ConfigError):
        _funnel(ctx, events, steps=["A"])
    with pytest.raises(ConfigError):
        run_op(ctx, "event.funnel", [events], steps=["A", "B"])


# -- retention.cohort -------------------------------------------------------

@pytest.fixture(scope="module")
def activity(spark):
    day = 86400
    rows = []
    # cohort week 0: users 1,2,3; user1 returns wk1+wk2, user2 wk1, user3 never
    for uid, weeks in [(1, [0, 1, 2]), (2, [0, 1]), (3, [0])]:
        for w in weeks:
            rows.append((uid, datetime(2024, 1, 4 + 7 * w, 12)))
    # cohort week 1: user 4, returns wk2
    for w in [1, 2]:
        rows.append((4, datetime(2024, 1, 4 + 7 * w, 12)))
    return spark.createDataFrame(rows, ["uid", "ts"])


def test_retention_matrix(ctx, activity):
    out = run_op(ctx, "retention.cohort", [activity], by="uid",
                 ts_column="ts", interval_seconds=604800)
    rows = {(r["cohort_ts"].day, r["period"]): (r["active_users"], r["cohort_size"],
                                                r["retention"]) for r in out.collect()}
    cohorts = sorted({d for d, _ in rows})
    c0, c1 = cohorts[0], cohorts[1]
    assert rows[(c0, 0)] == (3, 3, 1.0)
    assert rows[(c0, 1)][0] == 2 and rows[(c0, 1)][2] == pytest.approx(2 / 3)
    assert rows[(c0, 2)][0] == 1
    assert rows[(c1, 0)] == (1, 1, 1.0) and rows[(c1, 1)][0] == 1


def test_retention_max_periods_and_dedup(ctx, spark):
    # duplicate events in one period count once
    df = spark.createDataFrame(
        [(1, datetime(2024, 1, 1, h)) for h in (1, 2, 3)]
        + [(1, datetime(2024, 3, 1))], ["uid", "ts"])
    out = run_op(ctx, "retention.cohort", [df], by="uid", ts_column="ts",
                 interval_seconds=604800, max_periods=1)
    rows = {r["period"]: r["active_users"] for r in out.collect()}
    assert rows == {0: 1}  # period-0 dupes collapse; March visit capped away


def test_retention_config_errors(ctx, activity):
    with pytest.raises(ConfigError):
        run_op(ctx, "retention.cohort", [activity], by="uid")
    with pytest.raises(ConfigError):
        run_op(ctx, "retention.cohort", [activity], by="uid",
               ts_column="ts", interval_seconds=0)


# -- sessionize.assign ------------------------------------------------------

def test_sessionize_gap_labeling(ctx, spark):
    rows = [
        (1, datetime(2024, 1, 1, 10, 0)), (1, datetime(2024, 1, 1, 10, 20)),
        (1, datetime(2024, 1, 1, 12, 0)),   # > 1h gap -> new session
        (2, datetime(2024, 1, 1, 9, 0)),
    ]
    df = spark.createDataFrame(rows, ["uid", "ts"])
    out = run_op(ctx, "sessionize.assign", [df], by="uid", ts_column="ts",
                 gap_seconds=3600)
    got = sorted((r["uid"], r["ts"].hour, r["session_id"]) for r in out.collect())
    assert got == [(1, 10, 0), (1, 10, 0), (1, 12, 1), (2, 9, 0)]


def test_sessionize_ties_share_session(ctx, spark):
    t = datetime(2024, 1, 1, 10)
    later = datetime(2024, 1, 1, 13)
    df = spark.createDataFrame(
        [(1, t), (1, t), (1, t), (1, later), (1, later)], ["uid", "ts"])
    for reps in (1, 7):
        out = run_op(ctx, "sessionize.assign", [df.repartition(reps)], by="uid",
                     ts_column="ts", gap_seconds=3600).collect()
        sids = {r["ts"].hour: set() for r in out}
        for r in out:
            sids[r["ts"].hour].add(r["session_id"])
        assert sids[10] == {0} and sids[13] == {1}  # each tie group one session


def test_sessionize_global_id(ctx, spark):
    df = spark.createDataFrame([(7, datetime(2024, 1, 1))], ["uid", "ts"])
    out = run_op(ctx, "sessionize.assign", [df], by="uid", ts_column="ts",
                 gap_seconds=60, global_id=True).collect()
    assert out[0]["session_id"] == "7#0"


def test_sessionize_config_errors(ctx, spark):
    df = spark.createDataFrame([(1, datetime(2024, 1, 1))], ["uid", "ts"])
    with pytest.raises(ConfigError):
        run_op(ctx, "sessionize.assign", [df], by="uid", ts_column="ts")
    with pytest.raises(ConfigError):
        run_op(ctx, "sessionize.assign", [df], by="uid", ts_column="ts",
               gap_seconds=0)
