"""embedding.lsh — random-hyperplane (SimHash-for-vectors) signatures.

The scale path for embedding similarity: each vector gets a b-bit
signature, bit j = sign(<v, r_j>) with r_j a deterministic Rademacher
(+1/-1) vector derived from md5 parity of "plane:dim" — reproducible
across engines/runs with no RNG state. The sign vectors are computed
ON THE DRIVER and embedded as array literals (bits x dim tiny ints),
so the per-row work is just b fused multiply-adds over the embedding
— pure JVM expressions, no shuffle.

P[bit_j(a) = bit_j(b)] = 1 - angle(a,b)/pi: Hamming-close signatures
<=> cosine-close vectors. Group by the signature (or bit-bands) for
candidate buckets; verify with exact cosine (dedup.embedding / knn).
"""

from __future__ import annotations

import hashlib
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register


def rademacher_sign(plane: int, dim: int) -> float:
    """Deterministic +1/-1: parity of the last md5 hex nibble of
    "plane:dim" (mirror in SQL: ('0x'||substr(md5(...),32,1))::INT%2)."""
    nibble = int(hashlib.md5(f"{plane}:{dim}".encode()).hexdigest()[31], 16)
    return 1.0 if nibble % 2 == 0 else -1.0


def sign_matrix(bits: int, dim: int) -> list[list[float]]:
    return [[rademacher_sign(j, i) for i in range(dim)] for j in range(bits)]


def signature_expr(column: str, bits: int, dim: int):
    """The b-bit hyperplane signature as one JVM expression (reused by
    embedding.lsh and knn.lsh).

    Built as a single SQL string parsed by ONE F.expr call: the
    obvious Column-API construction (a per-bit loop of F.lit arrays +
    zip_with folds) makes ~bits*dim py4j round-trips — measured 4+
    seconds of DRIVER time at bits=24, dim=64 PER QUERY BUILD, before
    any executor ran. The arithmetic and fold order are identical
    (left fold of x*s, then sum of (dot>0)*2^j), so results — and the
    DuckDB oracle parity — are unchanged."""
    planes = sign_matrix(bits, dim)
    plane_sql = ",".join(
        "array(" + ",".join(f"{s:.1f}D" for s in row) + ")" for row in planes
    )
    powers_sql = ",".join(f"{2**j}L" for j in range(bits))
    return F.expr(
        f"aggregate(zip_with("
        f"transform(array({plane_sql}), p -> "
        f"aggregate(zip_with(`{column}`, p, (x, s) -> CAST(x AS DOUBLE) * s), "
        f"0.0D, (a, v) -> a + v)), "
        f"array({powers_sql}), "
        f"(d, w) -> CAST(d > 0.0D AS BIGINT) * w), "
        f"CAST(0 AS BIGINT), (a, v) -> a + v)"
    )


def signature_frame(
    df: DataFrame, id_column: str, id_out: str, column: str,
    bits: int, dim: int, method: str = "fold",
) -> DataFrame:
    """(id, __sig) signature frame for banding — the shared entry for
    ops that use signatures INTERNALLY (knn.lsh candidate buckets).

    method='fold': the JVM higher-order expression (signature_expr) —
    bit-reproducible against the DuckDB oracle, but interpreted (HOFs
    don't codegen): ~0.25 ms/row at bits=24/dim=64.

    method='gemm': one (N x dim) @ (dim x bits) BLAS multiply per
    Arrow batch — two orders of magnitude less CPU per row, the right
    default at 100 TB where signatures are billions of rows of pure
    compute. Sign-identical to 'fold' unless a dot product sits
    within float-rounding distance (~1e-13) of zero: real embedding
    corpora have margins many orders larger (test data: >= 8.8e-6;
    Hypothesis parity test in test_embedding_ops.py), and LSH
    BUCKETING only needs within-run consistency anyway. Keep 'fold'
    where the signature itself is the op's OUTPUT (embedding.lsh)."""
    if method == "fold":
        return df.select(
            F.col(id_column).alias(id_out),
            signature_expr(column, bits, int(dim)).alias("__sig"),
        )
    if method != "gemm":
        raise ConfigError(f"signature method must be fold|gemm, got {method!r}")
    import numpy as np

    planes_t = np.array(sign_matrix(bits, int(dim)), dtype=np.float64).T
    powers = np.array([2**j for j in range(bits)], dtype=np.int64)

    def run(batches):
        import pandas as pd

        for pdf in batches:
            vecs = pdf[column]
            # wrong-length/NULL vectors produce NULL signatures on the
            # fold path and never survive the band equi-join — drop
            # them here for the same candidate set
            ok = vecs.map(
                lambda v: v is not None and len(v) == planes_t.shape[0]
            ).to_numpy()
            if not ok.any():
                continue
            X = np.array(vecs[ok].tolist(), dtype=np.float64)
            sigs = ((X @ planes_t) > 0.0) @ powers
            yield pd.DataFrame(
                {id_out: pdf[id_column][ok].to_numpy(), "__sig": sigs}
            )

    schema = f"`{id_out}` {dict(df.dtypes)[id_column]}, __sig BIGINT"
    return df.select(id_column, column).mapInPandas(run, schema)


@register(
    "embedding.lsh", kind="transform",
    doc="Random-hyperplane LSH signature for vectors",
    params=[
        P("column", default="embedding", desc="Vector column (array<float>)"),
        P("output_column", default="lsh_sig", desc="Signature column"),
        P("bits", "integer", default=16, min=1, max=63, desc="Hyperplanes (sig bits)"),
        P("dim", "integer", min=1,
          desc="Vector dimensionality — pass it to keep the plan job-free"),
        P("infer_dim", "boolean", default=False,
          desc="Opt in to a one-row job that infers dim"),
    ],
    example={"column": "embedding", "bits": 16, "dim": 64},
    tags=["embedding", "lsh", "datapipe"],
)
def embedding_lsh(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    df = inputs[0]
    column = config.get("column", "embedding")
    bits = int(config.get("bits", 16))
    output_column = config.get("output_column", "lsh_sig")
    dim = config.get("dim")
    if dim is None:
        if not config.get("infer_dim"):
            raise ConfigError(
                "embedding.lsh requires 'dim' (the embedding length). Inferring it "
                "runs a Spark job at plan-build time; opt in with infer_dim=true."
            )
        first = df.select(F.size(F.col(column)).alias("d")).first()
        if first is None:
            return df.withColumn(output_column, F.lit(None).cast("bigint"))
        dim = first["d"]
    dim = int(dim)

    from conveyor_spark.datapipe.dedup import widen

    df = widen(ctx, df, config)
    return df.withColumn(output_column, signature_expr(column, bits, dim))
