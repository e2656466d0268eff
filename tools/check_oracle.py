"""Local replica of the driver's DuckDB-oracle comparison.

Runs every __spark_entry__ query at a given sf dir, runs its oracle
SQL in DuckDB over the same parquet, and compares row count, column
names, and an order-insensitive value hash. Usage:

    python tools/check_oracle.py [sf_dir] [query ...]

When run over the full suite (no query filter), also writes
CORRECTNESS_full.json at the repo root — all rows, in the driver's
CORRECTNESS_r{N}.json schema — so every round ships a complete
correctness artifact (the driver's own file caps at 50 entries).
"""

from __future__ import annotations

import decimal
import hashlib
import json
import math
import sys
import time

import duckdb

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


def norm_cell(v) -> str:
    # hot path: called once per CELL on both engines' results — keep
    # it import-free and exception-free
    if v is None:
        return "<null>"
    if isinstance(v, float):
        if math.isnan(v):
            return "nan"
        # hash the exact double bits — our determinism bar
        return repr(v)
    if isinstance(v, decimal.Decimal):
        return repr(float(v))
    return str(v)


def frame_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted(
        "\x1f".join(norm_cell(r[i]) for i in order) for r in rows
    )
    h = hashlib.sha256()
    for line in lines:
        h.update(line.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    # Pin the COMPARISON BASIS to UTC. Timestamps are instants and the
    # engines agree on them, but this harness hashes their NAIVE string
    # forms: PySpark's collect() renders TimestampType through the
    # Python process timezone (datetime.fromtimestamp), while DuckDB
    # returns naive UTC values — on a TZ=Asia/Tokyo host the identical
    # instant hashes differently (measured: 14 time-window queries
    # "fail" purely by rendering). tzset() before either engine starts
    # makes the harness host-TZ-independent; the engine itself is
    # unaffected (session tz is already UTC).
    import os
    import time as _time

    os.environ["TZ"] = "UTC"
    _time.tzset()

    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])

    sys.path.insert(0, "/root/repo")
    import __spark_entry__ as e
    from conveyor_spark.session import get_spark

    spark = get_spark(app_name="oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        # a table may be one file OR a directory of files (the
        # multi-file layout every real corpus has); Spark's reader
        # handles both transparently, DuckDB needs the glob
        path = f"{sf_dir}/{t}.parquet"
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')"
        )

    qs, oracles = e.queries(), e.oracle_sql()
    if unknown := sorted(only - set(qs)):
        # a typo'd name silently checked NOTHING and printed "N pass"
        print(f"check_oracle: unknown queries {unknown}", file=sys.stderr)
        return 2
    n_pass = n_fail = n_rows_only = 0
    report: dict[str, dict] = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        rec = {
            "rows_match": None, "schema_match": None, "hash_match": None,
            "spark_rows": None, "oracle_rows": None, "err": None,
        }
        report[name] = rec
        try:
            sdf = fn(spark, sf_dir)
            scols = sdf.columns
            srows = [tuple(r) for r in sdf.collect()]
        except Exception as exc:
            rec["err"] = f"{type(exc).__name__}: {str(exc)[:500]}"
            print(f"FAIL {name}: spark error: {type(exc).__name__}: {str(exc)[:300]}")
            n_fail += 1
            continue
        finally:
            # release query-internal caches (e.g. q160's collapsed
            # names): each builder invocation registers a fresh
            # entry the caller never sees, and a 160-query loop
            # would otherwise accumulate them for the session
            try:
                spark.catalog.clearCache()
            except Exception:  # noqa: BLE001 — Connect w/o catalog
                pass
        rec["spark_rows"] = len(srows)
        if name not in oracles:
            # no oracle => UNVERIFIED, not "rows matched": record None
            # so the artifact can't be read as a pass
            rec["rows_match"] = None
            n_rows_only += 1
            print(f"okNO {name}: rows={len(srows)} (no oracle — rows-only) [{time.time()-t0:.1f}s]")
            continue
        try:
            cur = con.execute(oracles[name])
            ocols = [d[0] for d in cur.description]
            orows = cur.fetchall()
        except Exception as exc:
            rec["err"] = f"duckdb: {str(exc)[:500]}"
            print(f"FAIL {name}: duckdb error: {str(exc)[:300]}")
            n_fail += 1
            continue
        rec["oracle_rows"] = len(orows)
        rec["schema_match"] = sorted(scols) == sorted(ocols)
        rec["rows_match"] = len(srows) == len(orows)
        problems = []
        if not rec["schema_match"]:
            problems.append(f"cols spark={sorted(scols)} oracle={sorted(ocols)}")
        if not rec["rows_match"]:
            problems.append(f"rowcount spark={len(srows)} oracle={len(orows)}")
        if not problems:
            sh, oh = frame_hash(scols, srows), frame_hash(ocols, orows)
            rec["hash_match"] = sh == oh
            if sh != oh:
                problems.append(f"hash {sh} != {oh}")
                # show a sample diff
                sset = {"\x1f".join(norm_cell(c) for c in r) for r in srows}
                oset = {"\x1f".join(norm_cell(c) for c in r) for r in orows}
                for x in sorted(sset - oset)[:2]:
                    problems.append(f"  spark-only: {x[:160]}")
                for x in sorted(oset - sset)[:2]:
                    problems.append(f"  oracle-only: {x[:160]}")
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name}: rows={len(srows)} [{time.time()-t0:.1f}s]")
            n_pass += 1
    extra = f", {n_rows_only} rows-only (unverified)" if n_rows_only else ""
    print(f"\n{n_pass} pass, {n_fail} fail{extra}")
    if not only:
        import os
        out = os.environ.get(
            "SPARK_GRAFT_ORACLE_OUT", "/root/repo/CORRECTNESS_full.json"
        )
        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "queries": report}, f, indent=2)
        print(f"wrote {out} ({len(report)} rows)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
