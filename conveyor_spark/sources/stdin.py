"""stdin.read — read stdin once, parse json/jsonl/csv/raw.

Reference: src/modules/sources/stdin.rs:84-97. Driver-side read (stdin
is inherently single-stream) then parallelize into a DataFrame.
"""

from __future__ import annotations

import io
import json as _json
import sys
from typing import Any

from pyspark.sql import DataFrame

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register


def _parse_records(text: str, fmt: str, headers: bool, delimiter: str) -> list[dict[str, Any]]:
    if fmt == "json":
        payload = _json.loads(text)
        if not isinstance(payload, list):
            raise ConfigError("stdin.read format=json expects a JSON array")
        return payload
    if fmt == "jsonl":
        return [_json.loads(line) for line in text.splitlines() if line.strip()]
    if fmt == "csv":
        import csv as _csv

        reader = _csv.reader(io.StringIO(text), delimiter=delimiter)
        rows = list(reader)
        if not rows:
            return []
        if headers:
            head, body = rows[0], rows[1:]
        else:
            head = [f"column_{i}" for i in range(len(rows[0]))]
            body = rows
        return [dict(zip(head, r)) for r in body]
    if fmt == "raw":
        return [{"raw": text}]
    raise ConfigError(f"stdin.read: unknown format {fmt!r}")


@register(
    "stdin.read", kind="source", doc="Read all of stdin once (json/jsonl/csv/raw)",
    params=[
        P("format", default="json", allowed=("json", "jsonl", "csv", "raw"),
          desc="Input parsing"),
        P("headers", "boolean", default=True, desc="CSV: first line is a header row"),
        P("delimiter", default=",", desc="CSV field delimiter"),
    ],
    example={"format": "jsonl"},
    tags=["stdin", "pipe"],
)
def stdin_read(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    # default "json" = the reference's documented default
    fmt = config.get("format", "json")
    headers = bool(config.get("headers", True))
    delimiter = str(config.get("delimiter", ","))
    text = config.get("_text")  # test hook: bypass real stdin
    if text is None:
        text = sys.stdin.read()
    records = _parse_records(text, fmt, headers, delimiter)
    from conveyor_spark.sources.records import records_to_dataframe

    return records_to_dataframe(ctx.spark, records)
