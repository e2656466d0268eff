"""stdout.write — print table/json/jsonl/csv preview.

Reference: src/modules/sinks/stdout.rs (formats table|json|jsonl|csv,
``limit`` preview, ``pretty``, ``delimiter``).
"""

from __future__ import annotations

import contextlib
import io
import json as _json
import sys
from typing import Any

from pyspark.sql import DataFrame

from conveyor_spark.registry import OpContext, P, register


@register(
    "stdout.write", kind="sink", doc="Print DataFrame to stdout",
    params=[
        P("format", default="table", allowed=("table", "json", "jsonl", "csv"),
          desc="Rendering"),
        P("limit", "integer", min=1, desc="Preview row cap (default 20 for table)"),
        P("pretty", "boolean", default=False, desc="Indent JSON output"),
        P("delimiter", default=",", desc="CSV field delimiter"),
    ],
    example={"format": "table", "limit": 20},
    tags=["stdout", "preview"],
)
def stdout_write(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> None:
    df = inputs[0]
    fmt = config.get("format", "table")
    limit = config.get("limit")
    pretty = bool(config.get("pretty", False))
    delimiter = str(config.get("delimiter", ","))
    out = config.get("_out", sys.stdout)  # test hook
    if limit is not None:
        df = df.limit(int(limit))
    if fmt == "table":
        # df.show() is the only public renderer (prints to stdout on
        # classic and Connect alike); capture it so `_out` test hooks
        # and redirected pipelines see the same bytes.
        n = int(limit) if limit is not None else 20
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.show(n=n, truncate=20)
        out.write(buf.getvalue())
        return None
    rows = [r.asDict(recursive=True) for r in df.toLocalIterator()]
    if fmt == "json":
        out.write(_json.dumps(rows, indent=2 if pretty else None, default=str) + "\n")
    elif fmt == "jsonl":
        for r in rows:
            out.write(_json.dumps(r, default=str) + "\n")
    elif fmt == "csv":
        import csv as _csv

        buf = io.StringIO()
        writer = _csv.writer(buf, delimiter=delimiter)
        writer.writerow(df.columns)
        for r in rows:
            writer.writerow([r[c] for c in df.columns])
        out.write(buf.getvalue())
    return None
