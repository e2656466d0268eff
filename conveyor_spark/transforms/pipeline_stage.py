"""stage.pipeline — sub-pipeline composition by spec inlining.

Reference: src/modules/stages/pipeline.rs:51-194 — runs a sub-pipeline
(external ``file`` or ``inline`` TOML) as a single stage. The
reference returns the *input* unchanged (TODO at pipeline.rs:186-193);
we implement the documented intent instead — the sub-pipeline's
terminal output is returned — and note the delta.

Implementation is spec-level: the child spec compiles against the
same SparkSession, its source/terminal stages folding into the parent
plan lazily (one Catalyst plan end to end, no materialization at the
composition boundary). The parent's input DataFrame is exposed to the
child as the input of any child stage with ``inputs = ["__parent__"]``.
"""

from __future__ import annotations

import tomllib
from typing import Any

from pyspark.sql import DataFrame

from conveyor_spark.errors import ConfigError
from conveyor_spark.registry import OpContext, P, register


@register(
    "stage.pipeline", kind="transform", min_inputs=0, max_inputs=1,
    doc="Run a sub-pipeline as one stage",
    params=[
        P("file", desc="Path to a sub-pipeline TOML"),
        P("inline", "any", desc="Inline sub-pipeline (TOML string or table)"),
    ],
    example={"file": "pipelines/cleanup.toml"},
    tags=["composition"],
)
def stage_pipeline(ctx: OpContext, inputs: list[DataFrame], config: dict[str, Any]) -> DataFrame:
    from conveyor_spark.compiler import compile_pipeline
    from conveyor_spark.config.spec import parse_spec

    if path := config.get("file"):
        with open(path, "rb") as f:  # noqa: PTH123
            data = tomllib.load(f)
    elif inline := config.get("inline"):
        data = tomllib.loads(inline) if isinstance(inline, str) else dict(inline)
    else:
        raise ConfigError("stage.pipeline requires 'file' or 'inline'")

    # Splice the parent's input in as a pseudo-stage. Detect the
    # reference STRUCTURALLY — only an `inputs` entry of "__parent__"
    # counts (the string appearing in some config VALUE must not
    # trigger the splice).
    parent_df = inputs[0] if inputs else None
    uses_parent = any(
        "__parent__" in (raw.get("inputs") or [])
        for raw in data.get("stages", [])
    )
    splice_name = None
    if uses_parent:
        # register the passthrough source under a UNIQUE per-call name:
        # a fixed name would let two concurrently-compiled pipelines
        # overwrite each other's closure and silently read the wrong
        # parent DataFrame; the entry is removed after compile so the
        # registry never pins the DataFrame
        import uuid

        from conveyor_spark.registry import REGISTRY, Op

        # uuid, NOT id(data): the dict is rebound below, CPython can
        # recycle the address for a concurrent call's dict and the
        # "unique" names would collide
        splice_name = f"__parent_input_{uuid.uuid4().hex}__"
        data = dict(data)
        data["stages"] = [
            {"id": "__parent__", "function": splice_name, "inputs": []},
            *data["stages"],
        ]

        def _parent_src(c: OpContext, ins: list[DataFrame], cfg: dict[str, Any]) -> DataFrame:
            if parent_df is None:
                raise ConfigError("stage.pipeline child uses __parent__ but stage has no input")
            return parent_df

        REGISTRY[splice_name] = Op(
            name=splice_name, fn=_parent_src, kind="source", min_inputs=0, max_inputs=0
        )
    try:
        spec = parse_spec(data)
        result = compile_pipeline(ctx.spark, spec)
    finally:
        if splice_name is not None:
            from conveyor_spark.registry import REGISTRY

            REGISTRY.pop(splice_name, None)
    # Terminal output = the unique stage no other stage consumes.
    consumed = {i for s in spec.stages for i in s.inputs}
    terminals = [sid for sid in result.outputs if sid not in consumed]
    if not terminals:
        # all-sink child: reference quirk — return parent input
        if parent_df is not None:
            return parent_df
        raise ConfigError("stage.pipeline child produced no output")
    return result.outputs[terminals[-1]]
