"""chunk.apply — group every N rows into one array-of-structs row.

Reference: src/modules/transforms/chunk.rs:62-113 — batch N rows
(1..10000, default 100) into a `records` array column (for batch-API
sinks like http.fetch batch mode).

Distributed semantics: "every N rows" needs a total order. With an
``order_by`` we use a global row_number; without one we preserve the
reference's arrival-order intent per partition via
``spark_partition_id + per-partition row_number`` — deterministic for
a given layout and shuffle-free (each partition chunks locally; no
global sort of 100 TB just to batch rows).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register


@register(
    "chunk.apply", kind="transform", doc="Batch every N rows into an array column",
    params=[
        P("batch_size", "integer", default=100, min=1, desc="Rows per chunk"),
        P("order_by", "array", required=True,
          desc="Deterministic global ordering for chunk assignment"),
        P("output_column", default="records", desc="Array column name"),
    ],
    example={"batch_size": 500, "order_by": ["id"]},
    tags=["batching"],
)
def chunk_apply(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    df = inputs[0]
    batch_size = int(config.get("batch_size", 100))
    if not 1 <= batch_size <= 10000:
        raise ConfigError("chunk.apply: batch_size must be in 1..10000 (chunk.rs:62-113)")
    output_column = config.get("output_column", "records")
    order_by = config.get("order_by")
    if order_by:
        cols = [order_by] if isinstance(order_by, str) else list(order_by)
        # Two-phase global index — NOT Window.orderBy (single-task
        # funnel; see transforms/global_index.py).
        from conveyor_spark.transforms.global_index import global_sequence

        seq = global_sequence(df, cols, "__gseq")
        grouped = (
            seq.withColumn("__chunk", F.floor(F.col("__gseq") / batch_size))
            .groupBy("__chunk")
            .agg(F.collect_list(F.struct(*df.columns)).alias(output_column))
            .withColumnRenamed("__chunk", "chunk_id")
        )
        return grouped
    # Partition-local chunking: no global order requested. Capture the
    # partition id and a stable intra-partition id FIRST, then chunk.
    tagged = df.withColumn("__pid", F.spark_partition_id()).withColumn(
        "__mid", F.monotonically_increasing_id()
    )
    w = Window.partitionBy("__pid").orderBy("__mid")
    seq = F.row_number().over(w) - 1
    return (
        tagged.withColumn("__chunk", F.floor(seq / batch_size))
        .groupBy("__pid", "__chunk")
        .agg(F.collect_list(F.struct(*df.columns)).alias(output_column))
        .select(
            F.concat_ws("-", F.col("__pid"), F.col("__chunk")).alias("chunk_id"),
            output_column,
        )
    )
