"""ctx.persist scoping: op decision-table persists are released by
the compiler after the sinks run (r14; VERDICT r13 #6).

Ops persist multi-consumer decision tables (ks_test's spine, bm25's
postings, ...) so ONE pipeline run shares the work between its own
consumers. In a long-lived multi-query session those pins must not
accumulate — the compiler drains ctx.persisted after the sink
actions, so `getPersistentRDDs()` returns to its pre-run population.
"""

from __future__ import annotations

import json

from conveyor_spark.compiler import run_pipeline
from conveyor_spark.config.spec import parse_spec
from conveyor_spark.registry import OpContext


def _persistent_ids(spark) -> set[int]:
    return {
        int(k) for k in
        spark.sparkContext._jsc.getPersistentRDDs().keySet().toArray()
    }


def test_scoped_persists_released_after_run(spark, tmp_path):
    ref = tmp_path / "ref.json"
    cur = tmp_path / "cur.json"
    ref.write_text("\n".join(json.dumps({"v": i % 7}) for i in range(50)))
    cur.write_text("\n".join(json.dumps({"v": i % 5}) for i in range(50)))
    out = tmp_path / "out.jsonl"
    spec = parse_spec({
        "pipeline": {"name": "scoped-persist"},
        "stages": [
            {"id": "ref", "function": "json.read",
             "config": {"path": str(ref), "format": "jsonl"}},
            {"id": "cur", "function": "json.read",
             "config": {"path": str(cur), "format": "jsonl"}},
            # stats.ks_test unconditionally ctx.persists its grouped
            # count spine — the representative decision-table op
            {"id": "ks", "function": "stats.ks_test",
             "inputs": ["ref", "cur"], "config": {"column": "v"}},
            {"id": "w", "function": "json.write", "inputs": ["ks"],
             "config": {"path": str(out), "format": "jsonl"}},
        ],
    })
    before = _persistent_ids(spark)
    result = run_pipeline(spark, spec)
    assert not result.errors
    assert out.read_text().strip()  # the sink actually ran
    leftover = _persistent_ids(spark) - before
    assert leftover == set(), (
        f"pipeline left {len(leftover)} persisted RDDs pinned: the "
        "compiler must drain ctx.persisted after the sinks"
    )


def test_persist_still_lives_across_consumers_within_a_run(spark):
    """ctx.persist returns a persisted frame usable by multiple
    consumers inside the run — release only happens at drain time."""
    ctx = OpContext(spark=spark)
    df = ctx.persist(spark.range(10))
    assert df.storageLevel.useMemory  # marked
    assert df.count() == 10
    assert df.agg({"id": "sum"}).collect()[0][0] == 45
    ctx.release_persisted()
    assert not df.storageLevel.useMemory  # released
    assert ctx.persisted == []
