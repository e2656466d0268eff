"""Registry freeze: the op API surface may only change deliberately.

179 registered ops are a real public API. This test compares the
live registry against the checked-in fingerprint
(tests/api_fingerprint.json); any drift — an op renamed or removed, a
param renamed, retyped, re-defaulted, or its allowed/min/max bounds
moved — fails with a per-op diff. To change the API on purpose:

    python tools/gen_api_fingerprint.py
    # and record the change under "Changelog" in docs/STABILITY.md

docs/STABILITY.md declares which guarantees each tier carries
(stable names never repurposed; params append-only for stable ops).
ADDING a new op or a new OPTIONAL param is allowed by policy but
still updates the fingerprint, so the diff shows up in review.
"""

from __future__ import annotations

import json
import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1] / "tools"))

from gen_api_fingerprint import fingerprint  # noqa: E402

_PINNED = pathlib.Path(__file__).resolve().parent / "api_fingerprint.json"


def test_registry_matches_pinned_fingerprint():
    pinned = json.loads(_PINNED.read_text())
    live = fingerprint()

    removed = sorted(set(pinned) - set(live))
    added = sorted(set(live) - set(pinned))
    changed = {}
    for name in set(pinned) & set(live):
        if pinned[name] != live[name]:
            p_params = {p["name"]: p for p in pinned[name]["params"]}
            l_params = {p["name"]: p for p in live[name]["params"]}
            diffs = []
            for k in ("kind", "min_inputs", "max_inputs"):
                if pinned[name][k] != live[name][k]:
                    diffs.append(f"{k}: {pinned[name][k]} -> {live[name][k]}")
            for pn in sorted(set(p_params) | set(l_params)):
                if p_params.get(pn) != l_params.get(pn):
                    diffs.append(
                        f"param {pn}: {p_params.get(pn)} -> {l_params.get(pn)}")
            changed[name] = diffs

    assert not removed and not changed, (
        "Op API drifted from tests/api_fingerprint.json.\n"
        f"removed: {removed}\n"
        + "\n".join(f"changed {n}: {d}" for n, d in changed.items())
        + "\nIf intentional: python tools/gen_api_fingerprint.py and add a "
          "Changelog entry to docs/STABILITY.md."
    )
    # additions are policy-legal but must still be pinned
    assert not added, (
        f"new ops not yet pinned: {added} — run "
        "python tools/gen_api_fingerprint.py"
    )
