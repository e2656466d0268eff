"""Scalable global row indexing — the two-phase bucket-offset scheme.

``Window.orderBy(...)`` with no partitionBy funnels every row through
ONE task (Spark logs "No Partition Defined for Window operation") —
correct on a laptop, a stall at 100 TB. The ops that need a global
row sequence (count-based window.apply, ordered chunk.apply — the
reference computes both from single-node arrival order,
src/core/streaming.rs:75-135 and src/modules/transforms/chunk.rs:62-113)
instead use:

1. a DETERMINISTIC order-contiguous bucket id, computed per row as a
   pure function of the first order key: a monotonic numeric
   surrogate, linearly mapped between the key's exact min/max (a
   lazy one-row aggregate, broadcast). Pure-function bucketing is
   the load-bearing choice: ``repartitionByRange`` +
   ``spark_partition_id`` is NOT safe here, because the range
   boundaries are sampled with a per-RDD seed — two plan branches
   that recompute the exchange (column pruning makes their subtrees
   differ, so ReuseExchange cannot kick in) can disagree on the
   partitioning and silently corrupt the offsets.
2. partition-LOCAL ``row_number`` over Window.partitionBy(bucket) —
   one parallel hash shuffle, the only full-data movement.
3. per-bucket counts: a tiny aggregate (<= num_buckets rows) off a
   key-pruned scan.
4. cumulative offsets over those rows via a triangular broadcast
   self-join (NOT an unpartitioned window — even a P-row one would
   re-introduce the single-partition WindowExec this module exists
   to kill).
5. broadcast the offsets back; global seq = offset + local row_number.

Correctness under skew: a hot key imbalances buckets (slow task) but
never breaks the index — equal surrogates share a bucket, so buckets
stay order-contiguous and offset + local rank is the exact global
rank for any total order.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError

_BKT = "__gidx_bkt"
_LRN = "__gidx_lrn"
_OFF = "__gidx_off"
_CNT = "__gidx_cnt"
_MIN = "__gidx_min"
_MAX = "__gidx_max"

_NUMERIC = {"tinyint", "smallint", "int", "bigint", "float", "double", "boolean"}


def _surrogate(df: DataFrame, col: str) -> Column:
    """Monotonic DOUBLE surrogate of the column (order-preserving,
    possibly lossy — collisions only coarsen buckets, never reorder)."""
    dtype = dict(df.dtypes).get(col)
    if dtype is None:
        raise ConfigError(f"global index: unknown order column {col!r}")
    if dtype in _NUMERIC or dtype.startswith("decimal"):
        return F.col(col).cast("double")
    if dtype in ("timestamp", "timestamp_ntz"):
        return F.col(col).cast("double")
    if dtype == "date":
        return F.datediff(F.col(col), F.lit("1970-01-01")).cast("double")
    if dtype == "string":
        # First 7 bytes, zero-padded (left-aligned so 'b' > 'ab'), as
        # an integer: byte order == UTF8String comparison order.
        return F.expr(
            f"CAST(conv(hex(rpad(substring(CAST(`{col}` AS BINARY), 1, 7), 7, x'00')), 16, 10) AS DOUBLE)"
        )
    raise ConfigError(
        f"global index: order column {col!r} has unsupported type {dtype} "
        "(numeric, decimal, timestamp, date, boolean or string)"
    )


def global_sequence(
    df: DataFrame, order_cols: list[str], index_column: str = "__seq"
) -> DataFrame:
    """Add a 0-based BIGINT global row index ordered by ``order_cols``.

    All other columns pass through unchanged. The plan contains no
    unpartitioned WindowExec; the only full-data shuffle is the hash
    exchange for the bucket-local row_number.
    """
    spark = df.sparkSession
    n_buckets = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    cols = [F.col(c) for c in order_cols]
    sur = _surrogate(df, order_cols[0])

    # Exact min/max: deterministic however the aggregation is
    # partitioned or retried — unlike sampled range boundaries.
    stats = df.agg(F.min(sur).alias(_MIN), F.max(sur).alias(_MAX))
    span = F.col(_MAX) - F.col(_MIN)
    bucket = (
        F.when(sur.isNull(), F.lit(-1))  # nulls sort first in ASC
        .when(span > 0, F.least(
            F.floor((sur - F.col(_MIN)) / span * n_buckets), F.lit(n_buckets - 1)
        ))
        .otherwise(F.lit(0))
        .cast("int")
    )
    tagged = (
        df.join(F.broadcast(stats))  # 1-row cross join: no data movement
        .withColumn(_BKT, bucket)
        .drop(_MIN, _MAX)
    )

    counts = tagged.groupBy(_BKT).agg(F.count(F.lit(1)).alias(_CNT))
    x, y = counts.alias("x"), counts.alias("y")
    offsets = (
        x.join(F.broadcast(y), F.col(f"y.{_BKT}") < F.col(f"x.{_BKT}"), "left")
        .groupBy(F.col(f"x.{_BKT}").alias(_BKT))
        .agg(F.coalesce(F.sum(F.col(f"y.{_CNT}")), F.lit(0)).alias(_OFF))
    )

    local = F.row_number().over(Window.partitionBy(_BKT).orderBy(*cols))
    seq = tagged.withColumn(_LRN, local)
    out = seq.join(F.broadcast(offsets), on=_BKT)
    return (
        out.withColumn(index_column, (F.col(_OFF) + F.col(_LRN) - 1).cast("bigint"))
        .drop(_BKT, _LRN, _OFF)
    )
