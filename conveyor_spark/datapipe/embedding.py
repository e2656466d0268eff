"""Embedding-column hygiene ops: L2 normalization and int8
quantization.

The prep stages in front of every similarity/ANN pass (knn.*,
dedup.embedding, embedding.lsh): normalize once so cosine becomes a
plain dot product downstream, and quantize for storage — int8
symmetric quantization cuts an embedding corpus to ~1/4 the bytes
(100 TB of float32 vectors -> 25 TB), which at scale is the
difference between a corpus that fits the cluster's disks and one
that doesn't.

Both are pure per-row JVM array expressions (aggregate/transform
higher-order functions) — whole-stage codegen, zero shuffle, linear
in rows x dim. Floating-point determinism: folds run left-to-right
over the array in both Spark and DuckDB, so results are bit-identical
cross-engine (see queries.py determinism notes).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register
from conveyor_spark.datapipe.dedup import let_expr


def _as_double(v: Column) -> Column:
    return F.transform(v, lambda x: x.cast("double"))


def _l2_norm(v: Column) -> Column:
    """sqrt(sum x^2), left-fold in array order (deterministic)."""
    return F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))


@register(
    "embedding.normalize", kind="transform", doc="L2-normalize a vector column",
    params=[
        P("column", default="embedding", desc="Vector column (array<float>)"),
        P("output_column", desc="Result column (default: in place)"),
        P("norm_column", desc="Also emit the original L2 norm here"),
    ],
    example={"column": "embedding", "norm_column": "l2"},
    tags=["embedding", "datapipe"],
)
def embedding_normalize(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    """Config: ``column`` (default "embedding"), ``output_column``
    (default: overwrite), ``norm_column`` (optional: also emit the
    pre-normalization L2 norm — a useful quality signal: near-zero
    norms are degenerate embeddings). Zero vectors pass through
    unchanged (norm 0 would divide by zero; ANSI mode makes that an
    error, and "still zero" is the sane answer).

    Output is array<double>: normalized values are derived floats,
    and double keeps the downstream dot products exact enough to
    compare across engines."""
    df = inputs[0]
    column = config.get("column", "embedding")
    out_col = config.get("output_column", column)
    if norm_col := config.get("norm_column"):
        df = df.withColumn(norm_col, _l2_norm(_as_double(F.col(column))))
    # bind the norm with a real `let` — an outer expression referenced
    # inside a transform() lambda re-evaluates PER ELEMENT (NOTES.md
    # playbook #8), turning O(dim) into O(dim^2)
    normalized = let_expr(
        _l2_norm(_as_double(F.col(column))),
        lambda nrm: F.when(nrm == 0.0, _as_double(F.col(column))).otherwise(
            F.transform(_as_double(F.col(column)), lambda x: x / nrm)
        ),
    )
    return df.withColumn(out_col, normalized)


@register(
    "embedding.quantize", kind="transform",
    doc="Symmetric int8 quantization of a vector column",
    params=[
        P("column", default="embedding", desc="Vector column (array<float>)"),
        P("output_column", desc="Result column (default: <column>_q8)"),
        P("scale_column", desc="Dequant scale column (default: <column>_scale)"),
    ],
    example={"column": "embedding"},
    tags=["embedding", "datapipe"],
)
def embedding_quantize(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    """Per-row symmetric scalar quantization: scale = max|x| / 127,
    q_i = round(x_i / scale) in [-127, 127] as array<tinyint>, plus
    the scale for dequantization. Config: ``column`` (default
    "embedding"), ``output_column`` (default "<column>_q8"),
    ``scale_column`` (default "<column>_scale"). All-zero vectors get
    scale 0 and all-zero codes (no division).

    4x smaller than float32 at <1% cosine error for typical
    normalized embeddings; dequantize with q * scale."""
    df = inputs[0]
    column = config.get("column", "embedding")
    out_col = config.get("output_column", f"{column}_q8")
    scale_col = config.get("scale_column", f"{column}_scale")
    v = _as_double(F.col(column))
    # materialize the scale ONCE as a named column, then reference it in
    # the code expression — inlining it twice would re-run the
    # array_max(transform(...)) fold per row for both outputs
    df = df.withColumn(scale_col, F.array_max(F.transform(v, F.abs)) / F.lit(127.0))
    s = F.col(scale_col)
    quantized = F.when(
        s == 0.0,
        F.transform(v, lambda x: F.lit(0).cast("tinyint")),
    ).otherwise(
        F.transform(
            v,
            lambda x: F.greatest(
                F.lit(-127.0), F.least(F.lit(127.0), F.round(x / s))
            ).cast("tinyint"),
        )
    )
    return df.withColumn(out_col, quantized)
