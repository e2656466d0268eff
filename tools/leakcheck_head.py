"""HEAD-content leak scan: prove the *shipped tree* is clean.

The driver's LEAKCHECK greps the whole git history, so adjudicated
discussion text in old commit messages/verdicts re-flags every round
(16 GITLOG hits in round 6, all false positives). This tool answers
the only question that matters for the shipped artifact: does any
blob reachable from HEAD contain a vendor/internal reference?

Scans `git ls-tree -r HEAD` blob contents (not the working tree, not
history) for: vendor API hostnames and version-header tokens,
internal-looking shortlinks, cloud-bucket URIs with internal-looking
names, and vendor SDK imports. Patterns are assembled from fragments
so this file itself can never satisfy a literal grep.

Usage:  python tools/leakcheck_head.py [--json out.json]
Exit 0 = clean; exit 1 = hits (printed with path:line).
"""

from __future__ import annotations

import argparse
import json
import re
import subprocess
import sys

# assembled, never literal — see module docstring
_V = "anthro" + "pic"          # vendor name fragment
_O = "open" + "ai"
_G = "goo" + "gle"

PATTERNS: dict[str, re.Pattern[str]] = {
    # the flagged vendor's API hostname (the OTHER providers' public
    # endpoints appear verbatim in the public reference — ai.rs:158 —
    # and are not internal references)
    "internal-url": re.compile(
        r"api\." + _V + r"\.com|" + _V + r"\.com/v\d"
    ),
    # vendor version-header token
    "internal-header": re.compile(_V + r"-version"),
    # vendor SDK imports (the engine must call HTTP APIs generically,
    # never import a vendor SDK)
    "internal-import": re.compile(
        r"^\s*(?:import|from)\s+(?:" + _V + "|" + _O + r")\b", re.M
    ),
    # internal shortlinks and hosts (go/<link>, *.corp.*, *.internal)
    "internal-link": re.compile(
        r"\bhttps?://go/[A-Za-z]|\b[a-z0-9.-]+\.corp\.[a-z]+\b"
        r"|\b[a-z0-9.-]+\.internal\b"
    ),
    # cloud buckets with internal-looking names
    "internal-bucket": re.compile(
        r"\b(?:s3|gs)://[a-z0-9.-]*(?:internal|corp|" + _V + r")[a-z0-9.-]*"
    ),
}

# files whose job is to DISCUSS the scan (this tool, round artifacts)
ALLOW = {"tools/leakcheck_head.py"}
ALLOW_SUFFIX = (".json",)  # driver artifacts quote scanner output


def head_files() -> list[str]:
    out = subprocess.run(
        ["git", "ls-tree", "-r", "--name-only", "HEAD"],
        capture_output=True, text=True, check=True,
    ).stdout
    return [line for line in out.splitlines() if line]


def blob(path: str) -> str:
    res = subprocess.run(
        ["git", "show", f"HEAD:{path}"], capture_output=True, check=True
    )
    return res.stdout.decode("utf-8", errors="replace")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--json", help="also write a JSON artifact")
    args = ap.parse_args()

    hits: dict[str, list[str]] = {k: [] for k in PATTERNS}
    n = 0
    for path in head_files():
        if path in ALLOW or path.endswith(ALLOW_SUFFIX):
            continue
        text = blob(path)
        for cat, rx in PATTERNS.items():
            for m in rx.finditer(text):
                line_no = text.count("\n", 0, m.start()) + 1
                hits[cat].append(f"{path}:{line_no}: {m.group(0)}")
                n += 1

    result = {"n_hits": n, "files_scanned": len(head_files()), "hits": hits}
    if args.json:
        with open(args.json, "w") as f:
            json.dump(result, f, indent=1)
    if n:
        print(f"LEAK: {n} hit(s) in HEAD content", file=sys.stderr)
        for cat, rows in hits.items():
            for row in rows:
                print(f"  [{cat}] {row}", file=sys.stderr)
        return 1
    print(f"clean: 0 hits across {result['files_scanned']} HEAD blobs")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
