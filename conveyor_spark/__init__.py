"""conveyor_spark — a PySpark-native analytics/ETL engine.

A from-scratch re-expression of the capabilities of yoonhoGo/conveyor
(a Rust+Polars TOML-pipeline CLI) on top of Apache Spark:

- Pipelines are declarative specs (TOML/dict) compiled into *lazy*
  DataFrame plans; Catalyst replaces the reference's per-stage
  materializing DAG executor (reference: src/core/dag_executor.rs).
- Every reference operator (SURVEY.md §2) is a registered function
  ``name -> Op``; operators compose DataFrame->DataFrame and stay
  JVM-side wherever Spark builtins can express the semantics.
- Beyond the reference surface: joins, set ops, window functions,
  pivot, time/session windows, and large-scale training-data ops
  (dedup, similarity search, text analysis, multimodal plumbing).
"""

from conveyor_spark.session import get_spark
from conveyor_spark.registry import REGISTRY, get_function, register

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "REGISTRY",
    "get_function",
    "register",
    "run_pipeline",
    "load_spec",
    "__version__",
]


def __getattr__(name: str):
    # Library entry points, imported lazily so `import conveyor_spark`
    # stays cheap (compiler pulls in the full operator registry).
    if name == "run_pipeline":
        from conveyor_spark.compiler import run_pipeline

        return run_pipeline
    if name == "load_spec":
        from conveyor_spark.config.spec import load_spec

        return load_spec
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
