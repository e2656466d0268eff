"""Snapshot maintenance ops: `table.upsert` and `diff.apply`.

Parquet tables have no MERGE; the scalable equivalent is
merge-as-rewrite: join the current snapshot with a (much smaller)
change set and write the next snapshot. These two ops are the
relational core of that loop — upsert produces the next snapshot,
diff audits what changed between two of them (the regression check
after a pipeline change: "the refactor altered 12 rows, all in
column x").

Scale design: both are single equi-joins on the key. The change set
in an upsert is typically tiny next to the snapshot — Spark
broadcasts it when it fits (AQE decides); the snapshot itself never
shuffles in that case. diff joins two snapshots of similar size —
a shuffle join on the key, with column comparison as codegen'd
struct equality (NULL-safe), no Python.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, register


def _keys(config: dict[str, Any], op: str) -> list[str]:
    keys = config.get("key")
    if not keys:
        raise ConfigError(f"{op} requires 'key'")
    return [keys] if isinstance(keys, str) else list(keys)


@register("table.upsert", kind="transform", min_inputs=2, max_inputs=2,
          doc="Merge a change set into a snapshot (upsert + optional delete)")
def table_upsert(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    """inputs = [snapshot, changes]. Rows in ``changes`` replace
    snapshot rows with the same key; new keys are inserted; snapshot
    rows without a change pass through. ``delete_column`` (optional):
    a boolean column in the change set — true rows DELETE the key
    instead of upserting (the column itself is not emitted).

    Schemas must match on the emitted columns (the change set may
    carry the delete flag extra). One equi-join; the change side
    broadcasts when small (AQE)."""
    snapshot, changes = inputs
    keys = _keys(config, "table.upsert")
    delete_col = config.get("delete_column")
    change_cols = [c for c in changes.columns if c != delete_col]
    if set(change_cols) != set(snapshot.columns):
        raise ConfigError(
            "table.upsert: change-set columns must match the snapshot "
            f"(snapshot {sorted(snapshot.columns)}, changes {sorted(change_cols)})"
        )
    if delete_col and delete_col not in changes.columns:
        raise ConfigError(f"table.upsert: delete_column {delete_col!r} not in change set")

    # kept snapshot rows: anti-join against ALL change keys (updates
    # and deletes both retire the old row)
    kept = snapshot.join(changes.select(*keys), keys, "left_anti")
    incoming = changes
    if delete_col:
        incoming = incoming.filter(
            ~F.coalesce(F.col(delete_col), F.lit(False))
        ).drop(delete_col)
    return kept.unionByName(incoming.select(*snapshot.columns))


@register("diff.apply", kind="transform", min_inputs=2, max_inputs=2,
          doc="Row-level diff of two snapshots (added/removed/changed)")
def diff_apply(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    """inputs = [before, after]. Output: key columns + ``diff_status``
    in (added, removed, changed) + ``changed_columns`` (array of the
    non-key columns whose values differ; empty for added/removed).
    Unchanged rows are omitted (``include_unchanged=true`` keeps them
    with status 'unchanged').

    Comparison is NULL-safe (<=> semantics): NULL -> NULL is
    unchanged, NULL -> value is a change. One full outer equi-join;
    per-column compares are codegen'd expressions.
    """
    before, after = inputs
    keys = _keys(config, "diff.apply")
    if set(before.columns) != set(after.columns):
        raise ConfigError(
            "diff.apply: snapshots must share a schema "
            f"({sorted(before.columns)} vs {sorted(after.columns)})"
        )
    value_cols = [c for c in before.columns if c not in keys]
    b = before.select(
        *[F.col(c).alias(f"__b_{c}") if c not in keys else F.col(c) for c in before.columns]
    )
    a = after.select(
        *[F.col(c).alias(f"__a_{c}") if c not in keys else F.col(c) for c in after.columns]
    )
    # presence markers: "any value column non-null" is unreliable
    # (rows can be legitimately all-NULL), so join explicit flags
    b2 = b.withColumn("__in_b", F.lit(True))
    a2 = a.withColumn("__in_a", F.lit(True))
    j = b2.join(a2, keys, "full_outer")
    changed_arr = F.filter(
        F.array(*[
            F.when(~F.col(f"__b_{c}").eqNullSafe(F.col(f"__a_{c}")), F.lit(c))
            for c in value_cols
        ]) if value_cols else F.array().cast("array<string>"),
        lambda x: x.isNotNull(),
    )
    status = (
        F.when(F.col("__in_b").isNull(), F.lit("added"))
        .when(F.col("__in_a").isNull(), F.lit("removed"))
        .when(F.size(changed_arr) > 0, F.lit("changed"))
        .otherwise(F.lit("unchanged"))
    )
    out = j.select(
        *keys,
        status.alias("diff_status"),
        F.when(status == "changed", changed_arr)
        .otherwise(F.array().cast("array<string>"))
        .alias("changed_columns"),
    )
    if not config.get("include_unchanged", False):
        out = out.filter(F.col("diff_status") != "unchanged")
    return out
