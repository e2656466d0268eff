"""json.extract — dot-path extraction from a JSON-string column.

Reference: src/modules/transforms/json_extract.rs:69-132 — parse a
JSON string column, walk a dot path, emit a new *string* column (null
on missing path / parse failure).

Spark-first: ``get_json_object(col, '$.a.b')`` — a JVM-side codegen'd
expression (no Python). Reference semantics preserved: result is
always a string column; missing -> null.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, register


def dot_path_to_jsonpath(path: str) -> str:
    """``a.b.c`` -> ``$.a.b.c`` (reference walks raw dot segments)."""
    if path.startswith("$"):
        return path
    return "$." + path


@register("json.extract", kind="transform", streaming_capable=True, doc="Extract dot-path from JSON string column")
def json_extract(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    df = inputs[0]
    column = config.get("column")
    path = config.get("path")
    output_column = config.get("output_column")
    if not column or not path or not output_column:
        raise ConfigError("json.extract requires 'column', 'path', 'output_column'")
    return df.withColumn(
        output_column, F.get_json_object(F.col(column), dot_path_to_jsonpath(path))
    )
