"""Regenerate tests/api_fingerprint.json from the live registry.

The fingerprint pins every registered op's public surface — name,
kind, input arity, and each param's (name, type, required, default,
allowed, min, max) — so tests/test_api_stability.py fails when a
release changes an op's contract silently. Workflow for an
INTENTIONAL change:

    python tools/gen_api_fingerprint.py
    # then record the change under "Changelog" in docs/STABILITY.md

Run from the repo root.
"""

from __future__ import annotations

import json
import pathlib

from conveyor_spark.registry import REGISTRY, _ensure_loaded


def fingerprint() -> dict:
    _ensure_loaded()
    out = {}
    for name in sorted(REGISTRY):
        op = REGISTRY[name]
        out[name] = {
            "kind": op.kind,
            "min_inputs": op.min_inputs,
            "max_inputs": op.max_inputs,
            "params": [
                {
                    "name": p.name,
                    "type": p.type,
                    "required": p.required,
                    "default": p.default,
                    "allowed": list(p.allowed) if p.allowed else None,
                    "min": p.min,
                    "max": p.max,
                }
                for p in op.params
            ],
        }
    return out


if __name__ == "__main__":
    path = pathlib.Path(__file__).resolve().parents[1] / "tests" / "api_fingerprint.json"
    fp = fingerprint()
    path.write_text(json.dumps(fp, indent=1, sort_keys=True) + "\n")
    print(f"wrote {path} ({len(fp)} ops)")
