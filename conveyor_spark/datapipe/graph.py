"""graph.pagerank — link-graph rank over an edge table.

Web-corpus curation uses link-graph centrality as a document quality
prior (pages many pages point at are worth more training epochs);
this brings that signal into the engine as a first-class op over a
plain (src, dst) edge DataFrame. Not in the reference (its surface
stops at relational ETL) — same family as dedup.components.

Two precision modes:

- ``precision='float'`` (default): standard double arithmetic.
  Fast, but float sums depend on partition merge order, so two runs
  of the SAME job can differ in final ulps — fine for ranking,
  unverifiable bit-for-bit.
- ``precision='exact'``: fixed-point integer arithmetic at
  ``scale_factor`` (default 10^12). Every share is one floor
  division, sums are exact integers — the result is IDENTICAL
  across partitionings, retries, engines. This is what q111's
  DuckDB oracle checks, and the mode to run when pipeline outputs
  must be reproducible byte-for-byte.

Semantics (both modes): damping d, uniform teleport, fixed
``iterations`` (the web-curation usage wants a few power iterations,
not convergence detection); dangling-node mass is dropped (the
simplified variant — ranks then sum to < 1, relative order is what
matters for weighting). Nodes = distinct(src) ∪ distinct(dst).

Scale: per iteration ONE join (ranks ⋈ edges on src, both sides
hash-partitioned on the key) and ONE aggregation by dst — the
textbook distributed power iteration. Lineage is truncated per
round with localCheckpoint exactly like dedup.components; edges are
computed once and checkpointed. Skewed in-degree (every page links
to the hub) lands on AQE skew handling; out-degree skew is free
(contribution is computed per-edge map-side after the join).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register


@register(
    "graph.pagerank", kind="transform",
    doc="PageRank over a (src, dst) edge table",
    params=[
        P("src_column", default="src", desc="Edge source column"),
        P("dst_column", default="dst", desc="Edge destination column"),
        P("iterations", "integer", default=10, min=1,
          desc="Power iterations (fixed count)"),
        P("damping", "float", default=0.85, min=0.0, max=1.0,
          desc="Damping factor d (teleport probability 1-d)"),
        P("precision", default="float", allowed=("float", "exact"),
          desc="float = doubles (fast); exact = fixed-point integers "
               "(bit-reproducible across partitionings/retries/engines)"),
        P("scale_factor", "integer", default=10**12, min=1000,
          desc="Fixed-point scale (precision=exact)"),
        P("output_column", default="rank", desc="Rank column name"),
    ],
    example={"src_column": "src", "dst_column": "dst", "iterations": 5},
    tags=["graph", "datapipe", "quality"],
)
def graph_pagerank(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    df = inputs[0]
    src = config.get("src_column", "src")
    dst = config.get("dst_column", "dst")
    if src not in df.columns or dst not in df.columns:
        raise ConfigError(
            f"graph.pagerank needs edge columns {src!r}/{dst!r} in the input "
            f"(have {df.columns}); set src_column/dst_column"
        )
    n_iter = int(config.get("iterations", 10))
    damping = float(config.get("damping", 0.85))
    precision = config.get("precision", "float")
    scale = int(config.get("scale_factor", 10**12))
    out_col = config.get("output_column", "rank")
    if out_col == "node":
        raise ConfigError("graph.pagerank: output_column cannot be 'node'")

    edges = (
        df.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
        .where(F.col("src").isNotNull() & F.col("dst").isNotNull())
        .distinct()
        .localCheckpoint(eager=False)
    )
    nodes = (
        edges.select(F.col("src").alias("node"))
        .union(edges.select(F.col("dst").alias("node")))
        .distinct()
        .localCheckpoint(eager=False)
    )
    n = nodes.count()
    if n == 0:
        return nodes.withColumn(out_col, F.lit(None).cast(
            "long" if precision == "exact" else "double"))

    # out-table (src, dst, deg) computed ONCE: each iteration then
    # pays one join + one aggregation, not a degrees re-join
    out_edges = (
        edges.join(
            edges.groupBy("src").agg(F.count("*").alias("deg")), "src"
        )
        .localCheckpoint(eager=False)
    )

    # Lineage-truncation cadence (r13 optimization): under AQE,
    # localCheckpoint — eager or not — executes the whole upstream
    # plan (AdaptiveSparkPlanExec materializes every query stage when
    # its RDD is requested), so a per-iteration checkpoint turns the
    # power iteration into n_iter sequential driver-blocking job
    # cascades (measured: q111 build 10.8 s / 37 jobs at 5
    # iterations). Checkpoint every _CKPT_EVERY rounds instead — the
    # MLlib ALS/Pregel interval pattern — and never on the last round
    # (the caller's action executes the final plan; re-materializing
    # it at build time would just run the job twice). Lineage depth
    # stays bounded at _CKPT_EVERY joins+aggregates, which Catalyst
    # analyzes in milliseconds. Measured: q111 5.0 s -> 1.5 s
    # end-to-end, 37 -> 9 jobs; values bit-identical (checkpointing
    # is semantically transparent, and exact mode is partition-order
    # independent by construction).
    ckpt_every = 5

    def _truncate(df_i: DataFrame, it: int) -> DataFrame:
        if it != n_iter - 1 and (it + 1) % ckpt_every == 0:
            return df_i.localCheckpoint(eager=False)
        return df_i

    if precision == "exact":
        # integer damping as a rational d_num/d_den so any float the
        # spec writes (0.85) maps to exact integer arithmetic
        d_num = int(round(damping * 10_000))
        d_den = 10_000
        base = (scale * (d_den - d_num)) // (d_den * n)
        # internal rank column name is reserved (__pr) so a user
        # output_column can never collide with the join's src/dst/deg
        ranks = nodes.withColumn("__pr", F.lit(scale // n).cast("long"))
        for it in range(n_iter):
            contrib = (
                ranks.join(out_edges, ranks["node"] == out_edges["src"])
                # ONE floor division per edge: (r * d_num) div (d_den * deg)
                .select(
                    F.col("dst").alias("node"),
                    F.expr(
                        f"((__pr * {d_num}L) div ({d_den}L * deg))"
                    ).alias("share"),
                )
                .groupBy("node")
                .agg(F.sum("share").alias("inflow"))
            )
            ranks = (
                nodes.join(contrib, "node", "left")
                .select(
                    "node",
                    (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0)))
                    .cast("long").alias("__pr"),
                )
            )
            ranks = _truncate(ranks, it)
        return ranks.select("node", F.col("__pr").alias(out_col))
    # float mode
    base = (1.0 - damping) / n
    ranks = nodes.withColumn("__pr", F.lit(1.0 / n))
    for it in range(n_iter):
        contrib = (
            ranks.join(out_edges, ranks["node"] == out_edges["src"])
            .select(
                F.col("dst").alias("node"),
                (F.col("__pr") * damping / F.col("deg")).alias("share"),
            )
            .groupBy("node")
            .agg(F.sum("share").alias("inflow"))
        )
        ranks = (
            nodes.join(contrib, "node", "left")
            .select(
                "node",
                (F.lit(base) + F.coalesce(F.col("inflow"), F.lit(0.0)))
                .alias("__pr"),
            )
        )
        ranks = _truncate(ranks, it)
    return ranks.select("node", F.col("__pr").alias(out_col))
