#!/usr/bin/env python
"""Compare two bench artifacts with host-window normalization.

Usage: python tools/bench_compare.py OLD.json NEW.json [--threshold 2.0]

Round-over-round BENCH files are produced on different host windows
that wobble 2-4x (round 5's "q80 regression" was exactly this). Each
artifact carries a ``calibration`` entry — q01 run first, the same
plan every round — so the calibration ratio approximates the
host-speed ratio. This script scales OLD's per-query times by
(new_calib / old_calib) before comparing, then flags queries whose
normalized ratio exceeds the threshold, and queries present on only
one side.

Exit code 1 if any query regressed past the threshold (for use as a
round-close gate), 0 otherwise.
"""

from __future__ import annotations

import argparse
import json
import re
import sys


def _load(path: str) -> dict:
    """Accept either bench.py's own JSON line or the driver's archive
    wrapper ({n, rc, tail, parsed}): `parsed` when it's populated,
    else query times regex-scraped from the (possibly truncated)
    `tail` string."""
    with open(path) as f:
        d = json.load(f)
    if "queries" in d:
        return d
    if d.get("parsed"):
        return d["parsed"]
    tail = d.get("tail", "")
    queries = {
        m.group(1): float(m.group(2))
        for m in re.finditer(r'"(q\d+[a-z0-9_]*)":\s*(-?\d+(?:\.\d+)?)', tail)
    }
    out: dict = {"queries": queries}
    cm = re.search(r'"calibration":\s*{[^}]*"sec":\s*(\d+(?:\.\d+)?)', tail)
    if cm:
        out["calibration"] = {"sec": float(cm.group(1))}
    return out


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("old")
    ap.add_argument("new")
    ap.add_argument("--threshold", type=float, default=2.0,
                    help="flag normalized slowdowns beyond this ratio")
    args = ap.parse_args()

    old = _load(args.old)
    new = _load(args.new)

    oc = (old.get("calibration") or {}).get("sec")
    nc = (new.get("calibration") or {}).get("sec")
    if oc and nc and oc > 0 and nc > 0:
        host = nc / oc
        print(f"calibration: old {oc:.2f}s new {nc:.2f}s -> host factor {host:.2f}x")
    else:
        host = 1.0
        print("calibration missing in one artifact; comparing raw times")

    oq, nq = old.get("queries", {}), new.get("queries", {})
    only_old = sorted(set(oq) - set(nq))
    only_new = sorted(set(nq) - set(oq))
    common = sorted(set(oq) & set(nq))

    rows = []
    broken = []  # worked in OLD, errors in NEW — worst regression
    for q in common:
        a, b = oq[q], nq[q]
        if b is not None and b < 0 and (a is not None and a >= 0):
            broken.append(q)
            rows.append((q, a, b, None))
            continue
        if a is None or b is None or a < 0 or b < 0:
            rows.append((q, a, b, None))
            continue
        # bench rounds to 1ms; a recorded 0.0 just means sub-resolution
        norm = b / (max(a, 0.001) * host)
        rows.append((q, a, b, norm))

    regressed = [(q, a, b, r) for q, a, b, r in rows if r is not None and r > args.threshold]
    improved = [(q, a, b, r) for q, a, b, r in rows if r is not None and r < 1 / args.threshold]

    tot_old = sum(v for v in oq.values() if v and v > 0)
    tot_new = sum(v for v in nq.values() if v and v > 0)
    ratio = f"{tot_new / (tot_old * host):.2f}x" if tot_old > 0 else "n/a"
    print(f"totals: old {tot_old:.1f}s ({len(oq)} queries) "
          f"new {tot_new:.1f}s ({len(nq)} queries) "
          f"normalized ratio {ratio}")

    for title, items in (("REGRESSED", regressed), ("improved", improved)):
        for q, a, b, r in sorted(items, key=lambda t: -(t[3] or 0)):
            print(f"  {title} {q}: {a:.2f}s -> {b:.2f}s ({r:.2f}x normalized)")
    for q in only_old:
        print(f"  removed: {q}")
    for q in only_new:
        print(f"  added: {q} ({nq[q]:.2f}s)")
    errs = [q for q, a, b, r in rows if r is None and q not in broken]
    for q in errs:
        print(f"  not comparable (error/missing time): {q}")
    for q in broken:
        print(f"  BROKEN {q}: ran in old ({oq[q]:.2f}s), errors in new")
    if only_old:
        # a query VANISHING from the suite also fails the gate — a
        # regression can't hide behind a deletion
        print(f"  gate: {len(only_old)} queries removed from the suite")

    return 1 if (regressed or broken or only_old) else 0


if __name__ == "__main__":
    sys.exit(main())
