"""CLI: ``python -m conveyor_spark run|validate|functions|scaffold|add-stage``.

Mirrors the reference CLI verbs (src/main.rs:125-180): ``run`` a
pipeline TOML, ``validate`` it without executing, ``functions`` lists
the registry (reference: ``conveyor functions list``), ``scaffold``
emits a runnable starter TOML (src/cli/scaffold.rs) and ``add-stage``
appends a validated stage block (src/cli/add_stage.rs) — flag-driven
here instead of interactive prompts, so authoring works in scripts.
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
    p_sc = sub.add_parser("scaffold", help="write a runnable starter pipeline TOML")
    p_sc.add_argument("output", nargs="?", default="pipeline.toml")
    p_sc.add_argument("--name", default="my_pipeline")
    p_sc.add_argument("--description", default="A data processing pipeline")
    p_sc.add_argument("--force", action="store_true", help="overwrite an existing file")
    p_add = sub.add_parser("add-stage", help="append a stage to a pipeline TOML")
    p_add.add_argument("pipeline")
    p_add.add_argument("--id", required=True, dest="stage_id")
    p_add.add_argument("--function", required=True)
    p_add.add_argument("--input", action="append", default=[], dest="stage_inputs",
                       help="upstream stage id (repeatable)")
    p_add.add_argument("--config", action="append", default=[], dest="config_pairs",
                       metavar="KEY=VALUE", help="config entry (JSON value or bare string)")
    args = parser.parse_args(argv)

    if args.cmd == "scaffold":
        from conveyor_spark.scaffold import scaffold_pipeline

        try:
            for p in scaffold_pipeline(args.output, args.name, args.description, args.force):
                print(f"wrote {p}")
        except ConveyorError as exc:
            print(f"scaffold failed: {exc}", file=sys.stderr)
            return 2
        print(f"run it: python -m conveyor_spark run {args.output}")
        return 0

    if args.cmd == "add-stage":
        from conveyor_spark.scaffold import add_stage

        try:
            add_stage(args.pipeline, args.stage_id, args.function,
                      args.stage_inputs, args.config_pairs)
        except ConveyorError as exc:
            print(f"add-stage failed: {exc}", file=sys.stderr)
            return 2
        print(f"added stage {args.stage_id!r} ({args.function}) to {args.pipeline}")
        return 0

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
