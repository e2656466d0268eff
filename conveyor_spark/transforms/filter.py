"""filter.apply — row filtering.

Reference: src/modules/transforms/filter.rs:88-205. Single predicate
``column OP value`` with operators == = != <> > >= < <=, substring
``contains``, and list ``in``. Literal coercion: string/int/float/bool
(filter.rs:208-216).

Spark-first: every predicate becomes a Catalyst expression so it can
push down to the parquet scan (PushedFilters). As an extension beyond
the reference's single-predicate grammar, an ``expr`` config key
accepts a full boolean SQL expression (``F.expr``), superseding
column/operator/value.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register

_OPS = {"==", "=", "!=", "<>", ">", ">=", "<", "<=", "contains", "in", "not_in", "is_null", "not_null"}


def build_predicate(column: str, operator: str, value: Any) -> Column:
    c = F.col(column)
    if operator in ("==", "="):
        return c == F.lit(value)
    if operator in ("!=", "<>"):
        return c != F.lit(value)
    if operator == ">":
        return c > F.lit(value)
    if operator == ">=":
        return c >= F.lit(value)
    if operator == "<":
        return c < F.lit(value)
    if operator == "<=":
        return c <= F.lit(value)
    if operator == "contains":
        return c.contains(value)
    if operator == "in":
        if not isinstance(value, (list, tuple)):
            raise ConfigError("filter.apply 'in' requires a list value")
        return c.isin(list(value))
    if operator == "not_in":
        if not isinstance(value, (list, tuple)):
            raise ConfigError("filter.apply 'not_in' requires a list value")
        return ~c.isin(list(value))
    if operator == "is_null":
        return c.isNull()
    if operator == "not_null":
        return c.isNotNull()
    raise ConfigError(f"filter.apply: unknown operator {operator!r} (expected one of {sorted(_OPS)})")


@register(
    "filter.apply", kind="transform", streaming_capable=True,
    doc="Filter rows by predicate",
    params=[
        P("column", desc="Column for the simple-predicate form"),
        P("operator", default="==",
          allowed=("==", "=", "!=", "<>", ">", ">=", "<", "<=", "contains",
                   "in", "not_in", "is_null", "not_null"),
          desc="Comparison operator"),
        P("value", "any", desc="Comparison value (list for in/not_in)"),
        P("expr", desc="Full SQL predicate (alternative to column/operator/value)"),
    ],
    example={"expr": "status = 'active' AND amount > 100"},
    tags=["filter", "relational"],
)
def filter_apply(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    df = inputs[0]
    if expr := config.get("expr"):
        # extension: full boolean expression
        return df.filter(F.expr(expr))
    column = config.get("column")
    if not column:
        raise ConfigError("filter.apply requires 'column' (or 'expr')")
    operator = config.get("operator", "==")
    value = config.get("value")
    return df.filter(build_predicate(column, operator, value))
