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
from conveyor_spark.registry import OpContext, P, register

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


@register(
    "media.decode", kind="transform",
    doc="Decode binary media -> metadata struct (stubbed)",
    params=[
        P("column", required=True, desc="Binary media column"),
        P("codec", default="fake", allowed=("fake", "real"),
          desc="real needs PIL/av (NotImplementedError in this container); "
               "fake is a deterministic stand-in with the same plumbing"),
        P("output_column", default="media_meta", desc="Decoded-struct column"),
    ],
    example={"column": "content", "codec": "fake"},
    tags=["multimodal", "datapipe"],
)
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


@register(
    "media.frame_sample", kind="transform",
    doc="Sample N pseudo-frames per video (stubbed)",
    params=[
        P("column", required=True, desc="Binary media column"),
        P("id_column", required=True, desc="Media row id"),
        P("n_frames", "integer", default=4, min=1, desc="Frames per item"),
        P("codec", default="fake", allowed=("fake", "real"),
          desc="real needs av (NotImplementedError in this container)"),
    ],
    example={"column": "content", "id_column": "path", "n_frames": 8},
    tags=["multimodal", "datapipe"],
)
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


MAGIC_HEX = {
    "png": "89504E470D0A1A0A",
    "jpeg": "FFD8FF",
    "gif": "47494638",
    "pdf": "25504446",
}


@register(
    "media.metadata", kind="transform",
    doc="Sniff media container format from magic bytes (pure JVM)",
    params=[
        P("column", required=True, desc="Binary media column"),
        P("output_column", default="media", desc="Metadata struct column"),
    ],
    example={"column": "content"},
    tags=["multimodal", "datapipe"],
)
def media_metadata(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    """Container-format sniffing WITHOUT decoding: match the file's
    magic bytes (PNG/JPEG/GIF/PDF, RIFF-wrapped WAV/AVI/WEBP, MP4
    ftyp) and record byte size. Unlike media.decode this needs no
    media library at all — the whole op is codegen'd string/binary
    expressions over the hex prefix (hex() then substring, which both
    Spark and DuckDB support on blobs via the hex string), so it runs
    at scan speed and is the right FIRST pass over a crawled media
    corpus: route rows by sniffed format, quarantine unknowns, size-
    filter — before any expensive decode.

    Config: ``column`` (binary, required), ``output_column`` prefix
    (default ``media``): adds ``<prefix>_format`` and
    ``<prefix>_bytes``.
    """
    from pyspark.sql import functions as F

    df = inputs[0]
    column = config.get("column")
    if not column:
        raise ConfigError("media.metadata requires 'column'")
    prefix = config.get("output_column", "media")
    hexp = F.substring(F.hex(F.col(column)), 1, 24)
    fmt = F.lit("unknown")
    # RIFF container: bytes 1-4 'RIFF', 9-12 name the wrapped format
    riff_kind = F.substring(hexp, 17, 8)
    fmt = (
        F.when(hexp.startswith(MAGIC_HEX["png"]), "png")
        .when(hexp.startswith(MAGIC_HEX["jpeg"]), "jpeg")
        .when(hexp.startswith(MAGIC_HEX["gif"]), "gif")
        .when(hexp.startswith(MAGIC_HEX["pdf"]), "pdf")
        .when(
            hexp.startswith("52494646"),
            F.when(riff_kind == "57415645", "wav")
            .when(riff_kind == "57454250", "webp")
            .when(riff_kind == "41564920", "avi")
            .otherwise("riff"),
        )
        .when(F.substring(hexp, 9, 8) == "66747970", "mp4")
        .otherwise("unknown")
    )
    return df.withColumn(f"{prefix}_format", fmt).withColumn(
        f"{prefix}_bytes", F.length(F.col(column)).cast("bigint")
    )
