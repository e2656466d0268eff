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
