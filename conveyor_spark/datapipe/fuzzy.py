"""join.fuzzy — approximate string matching between two tables.

Entity-resolution primitive (match customer names against a vendor
list, merge near-identical product titles). Not in the reference;
standard in data-cleaning pipelines.

Scale design: never a cross join. Candidates come from a q-gram
posting-list join (two id+gram tables shuffle, the full rows never
do); the exact Levenshtein runs ONLY on candidate pairs, with a
length prefilter and Spark's thresholded levenshtein (early-exits
the DP past `max_distance`). Completeness: a pair at edit distance
<= k shares at least one q-gram when the shorter string has more
than (k+1)*q - 1 characters (each edit destroys at most q grams) —
for q=3, k=2 that is strings of 9+ chars; shorter strings need a
smaller ``ngram``. ``max_df`` prunes stop-gram posting lists (same
knob and trade as dedup.ngram_jaccard: bounded lists, documented
recall loss on pairs whose every shared gram is hot).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, register
from conveyor_spark.datapipe.dedup import char_ngrams_expr


@register(
    "join.fuzzy",
    kind="transform",
    min_inputs=2,
    max_inputs=2,
    doc="Edit-distance pairs via q-gram blocking + Levenshtein verify",
)
def join_fuzzy(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    """inputs = [left, right]. Config: ``on`` (left string column),
    ``right_on`` (default = on), ``id_column`` / ``right_id_column``
    (default = id_column), ``max_distance`` (default 2), ``ngram``
    (default 3), ``max_df`` (optional hot-gram pruning fraction).

    Output: (id_a, id_b, s_a, s_b, distance) — one row per candidate
    pair within distance; self-join callers should filter
    ``id_a < id_b`` downstream. Matching is case-insensitive (grams
    and distance both computed on lowercased strings)."""
    if len(inputs) != 2:
        raise ConfigError("join.fuzzy needs [left, right] inputs")
    left, right = inputs
    on = config.get("on")
    id_column = config.get("id_column")
    if not on or not id_column:
        raise ConfigError("join.fuzzy requires 'on' and 'id_column'")
    right_on = config.get("right_on", on)
    right_id = config.get("right_id_column", id_column)
    k = int(config.get("max_distance", 2))
    if k < 0:
        raise ConfigError("join.fuzzy: max_distance must be >= 0")
    q = int(config.get("ngram", 3))
    max_df = config.get("max_df")

    def grams(df: DataFrame, idc: str, sc: str, ids: str, ss: str) -> DataFrame:
        base = df.select(
            F.col(idc).alias(ids), F.lower(F.col(sc).cast("string")).alias(ss)
        )
        g = base.select(ids, ss, F.explode(char_ngrams_expr(ss, q)).alias("__gram"))
        return g

    lg = grams(left, id_column, on, "id_a", "s_a")
    rg = grams(right, right_id, right_on, "id_b", "s_b")
    if max_df is not None:
        # prune grams present in more than max_df of the RIGHT side
        # (the posting-list side that explodes); broadcast keep-list
        frac = float(max_df)
        if not (0 < frac <= 1):
            raise ConfigError("join.fuzzy: max_df must be in (0, 1]")
        # cap computed lazily (1-row broadcast aggregate, no action at
        # plan build — same pattern as dedup.ngram_jaccard)
        totals = right.agg(F.count(F.lit(1)).alias("__total"))
        cap = F.greatest(F.floor(F.lit(frac) * F.col("__total")), F.lit(1))
        keep = (
            rg.groupBy("__gram").agg(F.count_distinct("id_b").alias("__df"))
            .join(F.broadcast(totals))
            .filter(F.col("__df") <= cap)
            .select("__gram")
        )
        lg = lg.join(F.broadcast(keep), "__gram", "left_semi")
        rg = rg.join(F.broadcast(keep), "__gram", "left_semi")

    cand = (
        lg.join(rg, "__gram")
        .select("id_a", "s_a", "id_b", "s_b")
        .distinct()
        # cheap prefilter: |len(a) - len(b)| > k can never be within k
        .filter(F.abs(F.length("s_a") - F.length("s_b")) <= k)
    )
    # thresholded levenshtein early-exits the DP past k (returns -1)
    dist = F.levenshtein(F.col("s_a"), F.col("s_b"), k)
    return (
        cand.withColumn("distance", dist)
        .filter(F.col("distance") >= 0)
        .select("id_a", "id_b", "s_a", "s_b", "distance")
    )
