"""parquet.read — columnar scan (engine-native extension).

The reference has no parquet source; this is the primary scan for our
Spark engine (driver testdata is parquet). Filter pushdown + column
pruning reach the scan automatically when stages compose lazily.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, register


@register("parquet.read", kind="source", doc="Read parquet file(s)/directory")
def parquet_read(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    path = config.get("path")
    if not path:
        raise ConfigError("parquet.read requires 'path'")
    return ctx.spark.read.parquet(path)


@register("parquet.write", kind="sink", doc="Write DataFrame as parquet")
def parquet_write(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> None:
    path = config.get("path")
    if not path:
        raise ConfigError("parquet.write requires 'path'")
    df = inputs[0]
    writer = df.write.mode(config.get("mode", "overwrite"))
    if parts := config.get("partition_by"):
        writer = writer.partitionBy(*([parts] if isinstance(parts, str) else parts))
    writer.parquet(path)
    return None
