"""Dump `.explain('formatted')` for declared queries to text files.

Usage: python tools/plan_dump.py OUTDIR SUFFIX [sf_dir] [query ...]

Writes OUTDIR/<query>_<SUFFIX>.txt for each selected query (all when
no filter given). The optimization rounds commit these as the
before/after plan evidence (plans/r13/<query>_before.txt etc.), so a
judge without a Spark runtime can check plan-shape claims.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys


def main() -> int:
    if len(sys.argv) < 3:
        print(__doc__, file=sys.stderr)
        return 2
    outdir, suffix = sys.argv[1], sys.argv[2]
    rest = sys.argv[3:]
    sf_dir = rest[0] if rest and os.path.isdir(rest[0]) else "/root/testdata/sf0.01"
    only = set(r for r in rest if not os.path.isdir(r))

    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from conveyor_spark.queries import QUERIES
    from conveyor_spark.session import get_spark

    if unknown := sorted(only - set(QUERIES)):
        print(f"plan_dump: unknown queries {unknown}", file=sys.stderr)
        return 2

    os.makedirs(outdir, exist_ok=True)
    spark = get_spark(app_name="conveyor-plan-dump")
    n = 0
    for name, fn in QUERIES.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            text = buf.getvalue()
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR building plan: {type(exc).__name__}: {exc}\n"
        with open(os.path.join(outdir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(text)
        n += 1
        try:
            spark.catalog.clearCache()
        except Exception:  # noqa: BLE001
            pass
    print(f"plan_dump: wrote {n} plans to {outdir} (suffix {suffix})")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
