"""CLI: ``python -m conveyor_spark run|validate|functions``.

Mirrors the reference CLI verbs (src/main.rs:125-146): ``run`` a
pipeline TOML, ``validate`` it without executing, ``functions`` lists
the registry (reference: ``conveyor functions list``).
"""

from __future__ import annotations

import argparse
import sys

from conveyor_spark.config.spec import load_spec
from conveyor_spark.errors import ConveyorError


def main(argv: list[str] | None = None) -> int:
    parser = argparse.ArgumentParser(prog="conveyor-spark")
    sub = parser.add_subparsers(dest="cmd", required=True)
    p_run = sub.add_parser("run", help="run a pipeline TOML")
    p_run.add_argument("pipeline")
    p_run.add_argument("--master", default=None)
    p_val = sub.add_parser("validate", help="validate a pipeline TOML")
    p_val.add_argument("pipeline")
    sub.add_parser("functions", help="list registered functions")
    args = parser.parse_args(argv)

    if args.cmd == "functions":
        from conveyor_spark.registry import REGISTRY, _ensure_loaded

        _ensure_loaded()
        for name, op in sorted(REGISTRY.items()):
            print(f"{name:24s} [{op.kind}] {op.doc}")
        return 0

    try:
        spec = load_spec(args.pipeline)
    except ConveyorError as exc:
        print(f"invalid pipeline: {exc}", file=sys.stderr)
        return 2
    if args.cmd == "validate":
        print(f"pipeline {spec.name!r} OK ({len(spec.stages)} stages)")
        return 0

    from conveyor_spark.compiler import run_pipeline
    from conveyor_spark.session import get_spark

    spark = get_spark(app_name=f"conveyor:{spec.name}", master=args.master)
    try:
        result = run_pipeline(spark, spec)
    except ConveyorError as exc:
        print(f"pipeline failed: {exc}", file=sys.stderr)
        return 1
    if result.errors:
        for sid, err in result.errors.items():
            print(f"stage {sid} failed (continue): {err}", file=sys.stderr)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
