"""dedup.components — connected components over duplicate pairs.

The last stage of the dedup pipeline the pair-emitting ops
(dedup.minhash / dedup.ngram_jaccard / dedup.embedding) feed: pairs
say "a duplicates b"; components turn that into clusters so exactly
one canonical document per cluster survives. (The reference never got
this far — its dedup story stops at distinct.apply; this is the
standard production step, cf. the union-find pass in web-dedup
pipelines.)

Algorithm: iterative min-label propagation. label(v) starts as v;
each round takes the min of a vertex's label and its neighbors'
labels — after d rounds every vertex in a component of diameter d
carries the component's min id. LSH/jaccard duplicate clusters are
near-cliques (diameter 2-3), so convergence is fast; the loop stops
early when no label changes.

Scale notes: each round is one shuffle join of (edge, label) — no
driver-side graph. `localCheckpoint` truncates lineage per round
(iterative joins otherwise stack exponentially deep plans). This op
RUNS JOBS when it executes its convergence loop (inherent to
iterative algorithms — same contract as GraphX/GraphFrames); pass
`iterations=k` for a fully lazy unrolled k-round plan instead.

Output: (id, component, is_canonical) — component is the min id of
the cluster; keep rows where is_canonical, or anti-join the rest.
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register


def _propagate(und: DataFrame, labels: DataFrame) -> DataFrame:
    """One round: label(v) <- min(label(v), min over neighbors).
    Carries the previous label as ``__old`` so convergence is a
    filter on the materialized round — not an extra join job."""
    neighbor_min = (
        und.join(labels, und["dst"] == labels["id"])
        .groupBy("src")
        .agg(F.min("label").alias("__nmin"))
    )
    return (
        labels.join(neighbor_min, labels["id"] == neighbor_min["src"], "left")
        .select(
            "id",
            F.least(F.col("label"), F.coalesce(F.col("__nmin"), F.col("label"))).alias("label"),
            F.col("label").alias("__old"),
        )
    )


@register(
    "dedup.components", kind="transform",
    doc="Connected components over duplicate pairs",
    params=[
        P("pair_a", default="id_a", desc="Edge column A"),
        P("pair_b", default="id_b", desc="Edge column B"),
        P("iterations", "integer", min=1,
          desc="Fixed iteration count (skips convergence checks)"),
        P("max_iterations", "integer", default=20, min=1,
          desc="Convergence-mode bound (graph diameter)"),
        P("rounds_per_check", "integer", default=2, min=1,
          desc="Propagation rounds per materialize+convergence check "
               "(labels are monotone, so batched checks stay exact)"),
    ],
    example={"pair_a": "id_a", "pair_b": "id_b"},
    tags=["dedup", "graph", "datapipe"],
)
def dedup_components(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    pairs = inputs[0]
    col_a = config.get("pair_a", "id_a")
    col_b = config.get("pair_b", "id_b")
    if col_a not in pairs.columns or col_b not in pairs.columns:
        raise ConfigError(
            f"dedup.components needs pair columns {col_a!r}/{col_b!r} in the input "
            f"(have {pairs.columns}); set pair_a/pair_b"
        )
    edges = pairs.select(F.col(col_a).alias("src"), F.col(col_b).alias("dst"))

    fixed = config.get("iterations")
    if fixed is None:
        # Checkpoint EDGES, not the undirected union: the union's two
        # branches would otherwise each re-run the (expensive) pair
        # producer — minhash + jaccard-verify evaluated twice before
        # the loop even starts.
        edges = edges.localCheckpoint(eager=False)
    und = edges.union(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    labels = (
        und.select(F.col("src").alias("id")).distinct().withColumn("label", F.col("id"))
    )

    if fixed is not None:
        # fully lazy unrolled plan (no convergence actions)
        k = int(fixed)
        if k < 1:
            raise ConfigError("dedup.components: iterations must be >= 1")
        for _ in range(k):
            labels = _propagate(und, labels).drop("__old")
    else:
        max_iterations = int(config.get("max_iterations", 20))
        # Batch propagation rounds between materializations: labels
        # only ever decrease, so if the LAST round of a batch changed
        # nothing its input was already a fixed point — checking only
        # that round is exact, and each skipped check saves a
        # localCheckpoint + count job. Duplicate clusters are
        # near-cliques (diameter 2-3), so batch=2 usually converges
        # in ONE materialization cycle instead of three or four.
        batch = max(1, int(config.get("rounds_per_check", 2)))
        labels = labels.localCheckpoint(eager=True)
        done = 0
        while done < max_iterations:
            stepped = labels
            for _ in range(min(batch, max_iterations - done)):
                stepped = _propagate(und, stepped.drop("__old"))
                done += 1
            new_labels = stepped.localCheckpoint(eager=True)
            # convergence = scan of the just-materialized round
            changed = (
                new_labels.filter(F.col("label") != F.col("__old")).limit(1).count()
            )
            labels = new_labels.drop("__old")
            if changed == 0:
                break
        else:
            raise ConfigError(
                f"dedup.components did not converge in {max_iterations} rounds "
                "(a long duplicate chain?); raise max_iterations"
            )

    return labels.select(
        F.col("id"),
        F.col("label").alias("component"),
        (F.col("id") == F.col("label")).alias("is_canonical"),
    )
