"""Per-group statistical outlier detection (`anomaly.zscore`).

Corpus quality filtering at the distribution level: "drop documents
whose length is >3σ from their language's mean", "flag users whose
event value is anomalous for their cohort". Complements the per-row
heuristics in text.quality — those look at one row, this looks at a
row against its group.

Scale design: ONE shuffle on the group key. Group moments ride a
window-partition aggregate (no orderBy -> whole-group frame, no
single-partition WindowExec, no join back). Moments are computed
from exact integer/decimal sums (sum, sum of squares, count) and
only divided at the end — deterministic on any partitioning and
bit-identical to an oracle that follows the same formula (Spark's
stddev_samp and a float sum would both be partition-order dependent).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register


@register(
    "anomaly.zscore", kind="transform", doc="Per-group z-score outlier flag/filter",
    params=[
        P("column", required=True, desc="Numeric column"),
        P("by", "array", desc="Per-group stats; global when omitted"),
        P("threshold", "float", default=3.0, min=0, desc="|z| cutoff"),
        P("mode", default="flag", allowed=("flag", "filter"),
          desc="Add flag columns vs drop outliers"),
        P("output_column", default="zscore", desc="Z-score column"),
        P("flag_column", default="is_outlier", desc="Outlier flag column"),
    ],
    example={"column": "value", "by": ["sensor_id"], "threshold": 3.0},
    tags=["anomaly", "quality", "datapipe"],
)
def anomaly_zscore(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    """z = (x - mean_group) / std_group, flagged when |z| > threshold.

    Config: ``column`` (numeric, required), ``by`` (group columns;
    empty = whole-table stats via a literal group), ``threshold``
    (default 3.0), ``mode`` = flag (default: adds ``zscore`` double +
    ``is_outlier`` boolean) | filter (keeps only |z| <= threshold),
    ``output_column`` (default "zscore"), ``flag_column`` (default
    "is_outlier").

    Variance is the sample variance from exact sums:
    (sumsq - sum^2/n) / (n-1). Integer inputs sum exactly (DECIMAL
    accumulators), so mean/std/z are identical double expressions in
    any engine and any partition order. Groups of size 1 (or zero
    variance) get z = 0.0 and never flag. NULL values get NULL z and
    never flag (and are excluded from the moments).
    """
    df = inputs[0]
    column = config.get("column")
    if not column:
        raise ConfigError("anomaly.zscore requires 'column'")
    by = config.get("by") or []
    if isinstance(by, str):
        by = [by]
    threshold = float(config.get("threshold", 3.0))
    mode = config.get("mode", "flag")
    if mode not in ("flag", "filter"):
        raise ConfigError("anomaly.zscore: mode must be flag|filter")
    z_col = config.get("output_column", "zscore")
    flag_col = config.get("flag_column", "is_outlier")

    # exact accumulation at DECIMAL(18,3): the square stays (37,6),
    # inside 38 digits, so BOTH Spark and an oracle engine keep it
    # exact — (38,6) squared overflows 38 and Spark rounds while
    # DuckDB silently promotes to double, diverging in the last ulp.
    # Domain: |x| < 10^15 at millidecimal resolution (plenty for
    # lengths/counts/scores; z-scores are scale-free anyway).
    x = F.col(column).cast("decimal(18,3)")
    if by:
        # grouped: window-partition aggregate — one shuffle on the
        # group key, whole-group frame, no join back
        w = Window.partitionBy(*[F.col(c) for c in by])
        n = F.count(x).over(w).cast("double")
        s = F.sum(x).over(w).cast("double")
        s2 = F.sum(x * x).over(w).cast("double")
        staged = df
    else:
        # whole-table: a single-row aggregate broadcast back (an
        # unpartitioned window would funnel all rows into one task)
        totals = df.agg(
            F.count(x).alias("__n"), F.sum(x).alias("__s"), F.sum(x * x).alias("__s2")
        )
        staged = df.crossJoin(F.broadcast(totals))
        n = F.col("__n").cast("double")
        s = F.col("__s").cast("double")
        s2 = F.col("__s2").cast("double")
    mean = s / n
    var = F.when(n > 1, (s2 - s * mean) / (n - F.lit(1.0))).otherwise(F.lit(0.0))
    std = F.sqrt(var)
    xv = F.col(column).cast("double")
    z = F.when(std > 0, (xv - mean) / std).otherwise(
        F.when(xv.isNotNull(), F.lit(0.0))
    )
    flagged = staged.withColumn(z_col, z)
    if not by:
        flagged = flagged.drop("__n", "__s", "__s2")
    if mode == "filter":
        return flagged.filter(
            F.col(z_col).isNull() | (F.abs(F.col(z_col)) <= threshold)
        ).drop(z_col)
    return flagged.withColumn(
        flag_col, F.coalesce(F.abs(F.col(z_col)) > threshold, F.lit(False))
    )
