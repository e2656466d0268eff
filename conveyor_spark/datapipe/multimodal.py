"""Multimodal column plumbing: image/audio/video as opaque binary.

Pattern: media lives as a `binary` column + typed metadata struct;
decode / feature-extract / resize / frame-sample run as Arrow-batched
``mapInPandas`` so each executor processes whole record batches with
the (heavy) media library imported once per partition.

The container has no image/audio libs, so the actual decoders are
STUBS: ``codec='fake'`` produces deterministic metadata from the
bytes themselves (size, md5-derived pseudo-dimensions) — making the
Spark-side plumbing (schema, batching, partitioning) fully testable —
while ``codec='real'`` raises NotImplementedError at the exact seam
where PIL/librosa/av would plug in.
"""

from __future__ import annotations

import hashlib
from typing import Any, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import types as T

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, register

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("format", T.StringType()),
        T.StructField("n_bytes", T.LongType()),
    ]
)


def _fake_image_meta(data: bytes) -> dict[str, Any]:
    # Deterministic pseudo-decode: dimensions derived from content hash.
    h = hashlib.md5(data).digest()
    return {
        "width": 64 + h[0] % 192,
        "height": 64 + h[1] % 192,
        "format": ["png", "jpeg", "webp"][h[2] % 3],
        "n_bytes": len(data),
    }


@register("media.decode", kind="transform", doc="Decode binary media -> metadata struct (stubbed)")
def media_decode(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    df = inputs[0]
    column = config.get("column")
    if not column:
        raise ConfigError("media.decode requires 'column'")
    codec = config.get("codec", "fake")
    output_column = config.get("output_column", "media_meta")
    from conveyor_spark.datapipe.dedup import widen

    df = widen(ctx, df, config)  # decode parallelism = one Python worker per partition
    out_schema = T.StructType(df.schema.fields + [T.StructField(output_column, IMAGE_META_SCHEMA)])
    in_columns = df.columns

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        # real decoders would be imported HERE, once per partition:
        #   from PIL import Image
        if codec == "real":
            raise NotImplementedError(
                "real media decoding requires PIL/librosa/av — not in this container"
            )

        for pdf in batches:
            pdf = pdf.copy()
            pdf[output_column] = [
                _fake_image_meta(bytes(v)) if v is not None else None for v in pdf[column]
            ]
            yield pd.DataFrame(pdf, columns=in_columns + [output_column])

    return df.mapInPandas(run, out_schema)


@register("media.frame_sample", kind="transform", doc="Sample N pseudo-frames per video (stubbed)")
def frame_sample(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    """Explode each binary 'video' into n deterministic frame rows
    (frame_idx, frame_hash). Real impl would decode with av/ffmpeg at
    the marked seam; the batching/explode plumbing is real."""
    df = inputs[0]
    column = config.get("column")
    id_column = config.get("id_column")
    if not column or not id_column:
        raise ConfigError("media.frame_sample requires 'column' and 'id_column'")
    n_frames = int(config.get("n_frames", 4))
    codec = config.get("codec", "fake")
    from conveyor_spark.datapipe.dedup import widen

    df = widen(ctx, df, config)
    out_schema = T.StructType(
        [
            df.schema[id_column],
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("frame_hash", T.StringType()),
        ]
    )

    def run(batches: Iterator) -> Iterator:
        import pandas as pd

        if codec == "real":
            raise NotImplementedError("real frame sampling requires av/ffmpeg")
        for pdf in batches:
            out_ids, out_idx, out_hash = [], [], []
            for rid, data in zip(pdf[id_column], pdf[column]):
                if data is None:
                    continue
                for i in range(n_frames):
                    out_ids.append(rid)
                    out_idx.append(i)
                    out_hash.append(hashlib.md5(bytes(data) + str(i).encode()).hexdigest())
            yield pd.DataFrame(
                {id_column: out_ids, "frame_idx": out_idx, "frame_hash": out_hash}
            )

    return df.mapInPandas(run, out_schema)
