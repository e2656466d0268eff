"""Shared driver-side records -> DataFrame conversion for the small
connector reads (http.get, stdin.read, the mongodb pymongo fallback).
One implementation of the union-of-keys schema so a fix lands in all
three paths at once.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Row, SparkSession


def records_to_dataframe(
    spark: SparkSession, records: list[Any], empty_schema: str = "raw STRING"
) -> DataFrame:
    """Union-of-keys rows; missing keys become NULL. Non-dict records
    (a JSON array of scalars, a bare string line) land in a single
    ``value`` column instead of crashing the key scan."""
    if not records:
        return spark.createDataFrame([], empty_schema)
    norm = [r if isinstance(r, dict) else {"value": r} for r in records]
    keys: list[str] = []
    for r in norm:
        for k in r:
            if k not in keys:
                keys.append(k)
    rows = [Row(**{k: r.get(k) for k in keys}) for r in norm]
    return spark.createDataFrame(rows)
