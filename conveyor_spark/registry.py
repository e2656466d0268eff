"""Function registry: stage-function name -> operator.

Mirrors the reference's built-in registry (src/modules/mod.rs:16-120,
23 functions) plus our Spark-first extensions (join/union/window/...).

Operator calling convention (uniform so the compiler can fold any
stage):

    fn(ctx: OpContext, inputs: list[DataFrame], config: dict) -> DataFrame | None

- sources ignore ``inputs``;
- single-input transforms use ``inputs[0]``;
- multi-input ops (join, union, ...) use the whole list (ordered as
  the stage's ``inputs`` spec — the reference models fan-in
  structurally but never consumes it, src/core/stage.rs:38-42);
- sinks return None (reference: produces_output() = false,
  src/modules/sinks/csv.rs:76-78).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Callable, Optional

from pyspark.sql import DataFrame, SparkSession

from conveyor_spark.errors import FunctionNotFound


@dataclass
class OpContext:
    """Execution context handed to every operator."""

    spark: SparkSession
    variables: dict[str, str] = field(default_factory=dict)
    # observe.apply stashes {obs, stage, df, exprs} here; the compiler
    # drains them into RunResult.metrics after the sinks run
    observations: dict[str, Any] = field(default_factory=dict)
    # set by the compiler before each op call (ops that need to know
    # their own stage id, e.g. observe.apply's lineage tracking)
    stage_id: Optional[str] = None


OpFn = Callable[[OpContext, list[DataFrame], dict[str, Any]], Optional[DataFrame]]


@dataclass(frozen=True)
class Op:
    name: str
    fn: OpFn
    kind: str  # "source" | "transform" | "sink"
    min_inputs: int = 1
    max_inputs: int | None = 1  # None = unbounded
    produces_output: bool = True
    streaming_capable: bool = False
    doc: str = ""


REGISTRY: dict[str, Op] = {}


def register(
    name: str,
    kind: str,
    *,
    min_inputs: int | None = None,
    max_inputs: int | None | str = "default",
    produces_output: bool | None = None,
    streaming_capable: bool = False,
    doc: str = "",
) -> Callable[[OpFn], OpFn]:
    """Decorator registering an operator under its stage-function name."""

    if min_inputs is None:
        min_inputs = 0 if kind == "source" else 1
    if max_inputs == "default":
        max_inputs = 0 if kind == "source" else 1
    if produces_output is None:
        produces_output = kind != "sink"

    def deco(fn: OpFn) -> OpFn:
        REGISTRY[name] = Op(
            name=name,
            fn=fn,
            kind=kind,
            min_inputs=min_inputs,
            max_inputs=max_inputs,  # type: ignore[arg-type]
            produces_output=produces_output,
            streaming_capable=streaming_capable,
            doc=doc or (fn.__doc__ or "").strip().splitlines()[0] if fn.__doc__ else doc,
        )
        return fn

    return deco


def get_function(name: str) -> Op:
    """Resolve a function name (reference: src/core/dag_builder.rs:196-269)."""
    # Import operator modules lazily so `import conveyor_spark` stays cheap
    _ensure_loaded()
    try:
        return REGISTRY[name]
    except KeyError:
        raise FunctionNotFound(
            f"unknown function {name!r}; available: {sorted(REGISTRY)}"
        ) from None


_LOADED = False


def _ensure_loaded() -> None:
    global _LOADED
    if _LOADED:
        return
    # Importing these modules runs their @register decorators.
    from conveyor_spark import sources, sinks, transforms, datapipe  # noqa: F401

    _LOADED = True
