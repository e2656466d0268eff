"""sort.apply — multi-column sort.

Reference: src/modules/transforms/sort.rs:78-136 (``columns``,
per-column ``descending``: bool|[bool], ``nulls_last``).

Scale note: a global sort is a range-partitioned shuffle (Spark
samples ranges, then sorts within partitions) — fine, but pair it
with ``limit`` (top-k) whenever possible: Catalyst rewrites
sort+limit into TakeOrderedAndProject, which never materializes the
full sorted dataset.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register


def _as_list(v: Any) -> list[Any]:
    return [v] if not isinstance(v, (list, tuple)) else list(v)


@register(
    "sort.apply", kind="transform", doc="Sort by columns (per-column direction)",
    params=[
        P("columns", "array",
          desc="Sort columns (or use the reference-spec alias 'by')"),
        P("by", "array", desc="Reference-spec alias for columns"),
        P("descending", "any", default=False,
          desc="Sort direction: one boolean or a per-column array"),
        P("nulls_last", "boolean", default=False, desc="Null placement"),
        P("limit", "integer", min=1,
          desc="Top-k fast path (TakeOrderedAndProject, no full sort)"),
    ],
    example={"columns": ["amount desc"], "limit": 10},
    tags=["sort", "relational"],
)
def sort_apply(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    df = inputs[0]
    # `by` is the reference's documented key (docs/builtin-functions.md)
    columns = config.get("columns") or config.get("by")
    if not columns:
        raise ConfigError("sort.apply requires 'columns' (alias: 'by')")
    cols = _as_list(columns)
    desc = _as_list(config.get("descending", False))
    if len(desc) == 1:
        desc = desc * len(cols)
    if len(desc) != len(cols):
        raise ConfigError("sort.apply: 'descending' length must match 'columns'")
    # "amount desc" / "name asc" spell the direction inline (the
    # registered example and SQL habit); the suffix wins over the
    # positional 'descending' flag for that column
    from conveyor_spark.ordering import split_dir

    for i, c in enumerate(cols):
        if isinstance(c, str):
            name, is_desc = split_dir(c)
            if name != c.strip():
                cols[i] = name
                desc[i] = is_desc
    nulls_last = bool(config.get("nulls_last", False))
    order = []
    for c, d in zip(cols, desc):
        col = F.col(c)
        if d:
            order.append(col.desc_nulls_last() if nulls_last else col.desc())
        else:
            order.append(col.asc_nulls_last() if nulls_last else col.asc())
    out = df.orderBy(*order)
    if (n := config.get("limit")) is not None:
        out = out.limit(int(n))  # sort+limit => TakeOrderedAndProject
    return out


@register(
    "limit.apply", kind="transform", doc="Keep first N rows",
    params=[
        P("n", "integer", min=0, desc="Row cap"),
        P("limit", "integer", min=0, desc="Alias for n"),
    ],
    example={"n": 100},
    tags=["relational"],
)
def limit_apply(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    n = config.get("n", config.get("limit"))
    if n is None:
        raise ConfigError("limit.apply requires 'n'")
    return inputs[0].limit(int(n))
