"""Distributed k-means over embedding columns (Lloyd's algorithm).

The clustering stage of an embedding pipeline: trains the coarse
quantizer whose assignments feed ``knn.ivf`` (its ``bucket_column``),
drives ``dedup.embedding``-style partitioning, and answers "what's in
this corpus" topic analysis.

Spark-first design (the MLlib KMeans shape, re-expressed on the
DataFrame API): centroids are a driver-side list of k x dim doubles —
k is small by definition — embedded as literals into a pure-codegen
assignment expression, so each Lloyd iteration is ONE distributed
pass: per-row argmin (zero shuffle) + one groupBy(cluster, dim)
aggregate (the only shuffle, k x dim result rows collected back).
Nothing quadratic, no Python in the row path.

Determinism (the oracle contract): a centroid is a MEAN of doubles —
a partition-order SUM would move the result between runs. Instead
each component is floor-quantized to 1/2^20 and summed as int64:
exact in any order, in any engine. The mean (int / exact double
product) and the per-row distance folds (left-to-right zip_with)
are then bit-identical everywhere, so cluster assignments replay
exactly — including in the DuckDB oracle, which unrolls the same
iterations in SQL. The 2^-20 quantization (~1e-6 per component per
iteration) is far below any embedding's noise floor; ties in argmin
break to the lowest cluster index.

Init is the first k vectors by id: reproducible by construction
(kmeans++ would need a seeded RNG shared with the oracle; a frozen
training pipeline wants the pure function of the data anyway).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register

_Q = 1048576.0  # 2^20: component quantization for exact int64 sums


def _dist_expr(vec, centroid: list[float]):
    """Squared L2 distance, folded left-to-right over dims — the
    deterministic order the oracle replays."""
    c = F.array(*[F.lit(float(x)) for x in centroid])
    return F.aggregate(
        F.zip_with(
            vec, c,
            lambda x, cc: (x.cast("double") - cc) * (x.cast("double") - cc),
        ),
        F.lit(0.0),
        lambda acc, d: acc + d,
    )


@register(
    "embedding.kmeans", kind="transform",
    doc="k-means clustering over an embedding column (Lloyd's)",
    params=[
        P("id_column", required=True, desc="Vector id column"),
        P("column", default="embedding", desc="array<float|double> column"),
        P("k", "integer", required=True, min=1, desc="Number of clusters"),
        P("iterations", "integer", default=5, min=1,
          desc="Lloyd iterations (fixed count: reproducible plans)"),
        P("dim", "integer", min=1,
          desc="Vector dimensionality (default: inferred from data)"),
        P("output", default="assign", allowed=("assign", "centroids"),
          desc="assign: input + cluster column; centroids: k rows"),
        P("output_column", default="cluster", desc="Assignment column"),
    ],
    example={"id_column": "doc_id", "column": "embedding", "k": 2,
             "iterations": 2},
    tags=["embedding", "clustering", "ann", "datapipe"],
)
def embedding_kmeans(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    """See module docstring for the design. Config: ``k``,
    ``iterations`` (fixed count — convergence-based stopping would
    make the plan data-dependent), ``output`` = "assign" (default:
    every input row + ``cluster``; rows with NULL/mis-sized/NULL-
    holding vectors get NULL) or "centroids" (k rows: cluster,
    centroid array<double>, size). Empty clusters keep their previous
    centroid (the standard Lloyd fallback).

    Scale: per iteration one codegen'd argmin pass + one (cluster,
    dim)-keyed aggregate whose k x dim output collects to the driver
    — at 1e9 vectors x dim 64 x k 1024 that is 65k result rows, not
    data. Driver-side centroid state is how Spark MLlib's own KMeans
    iterates; the quantized-int64 sums additionally make our
    centroids independent of partitioning, which MLlib's double sums
    are not."""
    df = inputs[0]
    id_column = config.get("id_column")
    if not id_column:
        raise ConfigError("embedding.kmeans requires 'id_column'")
    column = config.get("column", "embedding")
    if column not in df.columns:
        raise ConfigError(f"embedding.kmeans: no column {column!r}")
    k = config.get("k")
    if not k or int(k) < 1:
        raise ConfigError("embedding.kmeans requires 'k' >= 1")
    k = int(k)
    iterations = int(config.get("iterations", 5))
    if iterations < 1:
        raise ConfigError("embedding.kmeans: iterations must be >= 1")
    output = config.get("output", "assign")
    if output not in ("assign", "centroids"):
        raise ConfigError("embedding.kmeans: output must be assign|centroids")
    out_col = config.get("output_column", "cluster")

    vec = F.col(column)
    dim = config.get("dim")
    if dim is None:
        row = df.filter(vec.isNotNull()).select(F.size(vec)).first()
        if row is None:
            raise ConfigError("embedding.kmeans: no non-null vectors")
        dim = row[0]
    dim = int(dim)

    clean = df.filter(
        vec.isNotNull() & (F.size(vec) == dim)
        & ~F.exists(vec, lambda x: x.isNull())
    ).select(F.col(id_column).alias("__kid"), vec.alias("__v"))

    init = clean.orderBy("__kid").limit(k).select("__v").collect()
    if len(init) < k:
        raise ConfigError(
            f"embedding.kmeans: k={k} but only {len(init)} usable vectors"
        )
    centroids: list[list[float]] = [[float(x) for x in r[0]] for r in init]
    sizes: list[int] = [0] * k

    assigned = None
    for _ in range(iterations):
        dists = F.array(*[_dist_expr(F.col("__v"), c) for c in centroids])
        # first index of the min — ties break to the lowest cluster
        cluster = (F.array_position(dists, F.array_min(dists)) - 1).cast("int")
        assigned = clean.select("__kid", "__v", cluster.alias("__c"))
        stats = (
            assigned.select("__c", F.posexplode("__v").alias("__d", "__x"))
            .groupBy("__c", "__d")
            .agg(
                F.sum(
                    F.floor(F.col("__x").cast("double") * F.lit(_Q))
                ).alias("__s"),
                F.count(F.lit(1)).alias("__n"),
            )
            .collect()
        )
        new_c = [list(c) for c in centroids]  # empty cluster: keep old
        sizes = [0] * k
        for r in stats:
            new_c[r["__c"]][r["__d"]] = r["__s"] / (_Q * r["__n"])
            sizes[r["__c"]] = r["__n"]
        centroids = new_c

    if output == "centroids":
        return ctx.spark.createDataFrame(
            [(j, centroids[j], sizes[j]) for j in range(k)],
            f"{out_col} INT, centroid ARRAY<DOUBLE>, size LONG",
        )
    result = assigned.select("__kid", F.col("__c").alias(out_col))
    return df.join(
        result, df[id_column] == result["__kid"], "left"
    ).drop("__kid")
