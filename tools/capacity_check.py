"""Validated capacity model over the committed scale-probe corpus.

Round 11 left 20+ SCALE_PROBE artifacts spanning 4x..1024x replication
— zero-spill snapshots, spill onsets, and knob-restored reruns. This
tool turns those snapshots into a FALSIFIABLE model:

  1. For every probed query it fits the closed form
         shuffle_write_mb = a * n^beta
     (log-log least squares) over the ZERO-SPILL observations of the
     latest round, where n is the actual built row count of the
     query's primary table (the artifacts record it — the Zipf cap
     makes nominal scale a lie past ~64x). Groups with fewer than 3
     distinct n become value anchors instead of laws.
  2. It records the max deviation factor of the fit (the error bar),
     a per-group check tolerance = max(2.0, maxdev * 1.25), and the
     single-box wall: the n at which the law crosses the probe's
     2048 MB shuffle cap (divide by executor count on a real
     cluster — shuffle is per-executor-parallel).
  3. Every SPILLED observation must be accounted for: it is either in
     scale_probe.SPILL_EXPECTED (output-bound pair class), has a
     knob-restored sibling variant (KNOB_RESTORED), or carries a
     documented-onset annotation (DOCUMENTED_ONSETS, pointing at
     docs/SCALE_EVIDENCE.md). An unexplained spill FAILS the run.
  4. `--check ARTIFACT.json` validates a NEW probe artifact against
     the committed CAPACITY_MODEL.json: each zero-spill observation
     must land within its group's tolerance of the law (extrapolation
     beyond the fitted n-range is allowed and marked — that is the
     point), and each spill must be classified. Exit 1 on deviation:
     "zero-spill at 256x" snapshots become a model that future rounds
     can break.

Usage:
    python tools/capacity_check.py                 # fit + self-validate, write CAPACITY_MODEL.json
    python tools/capacity_check.py --check F.json  # validate a new artifact against the model
"""
from __future__ import annotations

import argparse
import glob
import json
import math
import os
import re
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# primary replicated table per query (n in the closed form).
# Default: documents.
TABLE_OF = {
    "q121_knn_pq": "embeddings", "q126_knn_pq_pretrained": "embeddings",
    "q162_pq_encode_gemm": "embeddings",
    "q127_embedding_pca": "embeddings", "q132_semdedup": "embeddings",
    "q151_bitext_lsh_blocked": "embeddings",
    "q152_knn_lsh_scaled": "embeddings", "q68_knn_lsh": "embeddings",
    "q151x_bitext_finer_block": "embeddings",
    "q151x_bitext_block1024": "embeddings",
    "q152x_lsh_occupancy256": "embeddings",
    "q152x_lsh_occupancy1024": "embeddings",
    "q152x_lsh_pq1024": "embeddings",
    "q64_fuzzy_join": "part", "q160_fuzzy_join_candidates": "part",
}

# Spill onsets with a measured restoring knob: the onset query ->
# the probe-variant(s) that rerun the same job zero-spill (or at the
# documented floor) with the knob turned. SCALE_PROBE_r11_x{256,1024}
# + _knobs are the evidence pairs.
KNOB_RESTORED = {
    "q28_dedup_minhash": ["q28x_minhash_star"],
    "q152_knn_lsh_scaled": ["q152x_lsh_occupancy256",
                            "q152x_lsh_occupancy1024", "q152x_lsh_pq1024"],
    "q151_bitext_lsh_blocked": ["q151x_bitext_finer_block",
                                "q151x_bitext_block1024"],
}

# Onsets whose cost is the documented DELIVERABLE (output-/edge-bound
# — no knob restores them because the bytes are the answer), plus the
# measured boundary notches of the knob variants themselves. Each
# reason points at the standing documentation.
DOCUMENTED_ONSETS = {
    "q52_jaccard_candidates":
        "candidate-pair agg is output-bound under capped-Zipf clusters "
        "(~C(cluster,2) pairs by semantics); scale doctrine: collapse "
        "exact dups first — docs/SCALE_EVIDENCE.md",
    "q53_dedup_components":
        "edge/output-bound: shuffle ~= edge count x skinny width; the "
        "cost IS the deliverable — docs/SCALE_EVIDENCE.md",
    "q152x_lsh_occupancy256":
        "1024x notch of the 256x knob setting (occupancy drifts back); "
        "restored by q152x_lsh_occupancy1024 / q152x_lsh_pq1024 — "
        "SCALE_PROBE_r11_x1024_knobs",
    "q152x_lsh_occupancy1024":
        "sort overhead on the n-linear candidate stream (9.7 MB on a "
        "2.6 GB exchange); residual decomposed in "
        "SCALE_PROBE_r11_x1024_knobs; width cut by q152x_lsh_pq1024",
    "q152x_lsh_pq1024":
        "residual sort overhead of the code-width candidate stream at "
        "1024x on one box — SCALE_PROBE_r12_x1024_pq",
    "q151x_bitext_finer_block":
        "1024x notch of the 256x block setting; restored by "
        "q151x_bitext_block1024 — SCALE_PROBE_r11_x1024_knobs",
    "q151x_bitext_block1024":
        "single-box 8 GB-heap floor of the linear per-block GEMM "
        "stream at 1024x — SCALE_PROBE_r11_x1024_knobs",
    "q68_knn_lsh":
        "demo-envelope config (bits=24 pinned by its oracle): 64x "
        "spill onset measured r09 and kept as the anti-case; the "
        "occupancy-scaled sibling q152_knn_lsh_scaled is the scale "
        "path — scale_probe.py HEAVY_SET comment",
    "q128_mine_bitext":
        "demo-envelope config (coarse 10-label blocking): 64x spill "
        "onset measured r09 and kept as the anti-case; the composite-"
        "blocked sibling q151_bitext_lsh_blocked is the scale path — "
        "SCALE_PROBE_r09_x64_emb",
}


def _round_of(path: str) -> int:
    m = re.search(r"_r(\d+)", os.path.basename(path))
    return int(m.group(1)) if m else 0


def _tag_of(path: str) -> str:
    base = os.path.basename(path)
    for t in ("s3", "mem4g"):
        if t in base:
            return t
    return ""


def _round_calibrations() -> dict[int, float]:
    """q01 calibration seconds per round from the committed local
    bench artifacts — the host-speed proxy for probe artifacts that
    predate the in-artifact calibration (scale_probe records its own
    from r13 on). Approximate (the bench and the probe of one round
    ran in different sessions of the same container window); the
    wall-law error bars carry the residual."""
    cal = {}
    for path in glob.glob(os.path.join(REPO, "BENCH_local_r*.json")):
        try:
            with open(path) as f:
                d = json.load(f)
            sec = (d.get("calibration") or {}).get("sec")
            if sec:
                cal[_round_of(path)] = float(sec)
        except (OSError, ValueError):
            continue
    return cal


def load_observations(pattern: str = "SCALE_PROBE_*.json") -> list[dict]:
    obs = []
    round_cal = _round_calibrations()
    for path in sorted(glob.glob(os.path.join(REPO, pattern))):
        with open(path) as f:
            d = json.load(f)
        rows = d.get("rows") or {}
        rnd = _round_of(path)
        # prefer the artifact's own calibration (r13+), else the same
        # round's bench calibration; None = wall not normalizable
        calib = (d.get("calibration") or {}).get("sec") \
            or round_cal.get(rnd)
        for q, m in (d.get("queries") or {}).items():
            if not isinstance(m, dict) or m.get("error"):
                continue
            if m.get("shuffle_write_mb") is None:
                continue
            sec = m.get("sec")
            obs.append({
                "artifact": os.path.basename(path),
                "round": rnd, "tag": _tag_of(path),
                "query": q, "scale": d.get("scale"),
                "n": rows.get(TABLE_OF.get(q, "documents")),
                "shuffle_mb": m["shuffle_write_mb"],
                "spill_mb": m.get("spilled_disk_mb", 0.0) or 0.0,
                "sec": sec,
                # wall time in CALIBRATION UNITS (q01 = 1.0): the
                # host-speed-free quantity the wall laws are fitted in
                "norm_sec": (sec / calib) if (sec and calib) else None,
            })
    return obs


def fit_points(obs: list[dict]) -> list[dict]:
    """Latest-round, untagged, zero-spill observations per (query,
    scale) — ALL observations of that round enter (two artifacts of
    one round measuring the same point differently is attribution
    noise the error bar must carry, not hide)."""
    latest: dict = {}
    for o in obs:
        if o["tag"] or o["spill_mb"] > 0 or not o["n"]:
            continue
        key = (o["query"], o["scale"])
        cur = latest.get(key, -1)
        if o["round"] > cur:
            latest[key] = o["round"]
    return [
        o for o in obs
        if not o["tag"] and o["spill_mb"] == 0 and o["n"]
        and latest.get((o["query"], o["scale"])) == o["round"]
    ]


def _power_fit(pairs: list[tuple[float, float]], floor: float):
    """log-log least squares over (n, y) pairs -> (a, beta, maxdev)."""
    xs = [math.log(n) for n, _ in pairs]
    ys = [math.log(max(y, floor)) for _, y in pairs]
    cnt = len(xs)
    mx, my = sum(xs) / cnt, sum(ys) / cnt
    sxx = sum((x - mx) ** 2 for x in xs)
    beta = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / sxx
    a = math.exp(my - beta * mx)
    maxdev = 1.0
    for n, y in pairs:
        pred = a * n ** beta
        maxdev = max(maxdev, max(pred, y) / max(min(pred, y), floor))
    return a, beta, maxdev


def _fit_wall(points: list[dict]) -> dict | None:
    """wall_sec ~= a * n^beta in CALIBRATION UNITS over the same
    points — the time dimension of the model (VERDICT r12 task 2).
    Wall is noisier than shuffle bytes (GC, JIT warmup, scheduler
    wobble survive the host normalization), so the tolerance floor
    is higher; fewer than 3 distinct n -> anchors, informational."""
    pts = [(p["n"], p["norm_sec"]) for p in points if p["norm_sec"]]
    ns = sorted({n for n, _ in pts})
    if not pts:
        return None
    # wall needs LEVERAGE a shuffle fit does not: shuffle bytes are
    # deterministic per plan, but normalized wall carries cold-JVM /
    # page-cache wobble (measured ~25% between consecutive runs on
    # one host), so a log-log fit over a narrow n-span (< 2x) is
    # noise amplification — q113's 1.3x-span points fitted beta=-2.
    if len(ns) < 3 or ns[-1] < 2 * ns[0]:
        vals: dict = {}
        for n, s in pts:
            vals.setdefault(n, []).append(s)
        return {"kind": "anchor",
                "anchors": {str(n): round(max(v), 3)
                            for n, v in vals.items()},
                "n_points": len(pts), "tolerance_factor": 3.0,
                "unit": "q01-calibration-units"}
    a, beta, maxdev = _power_fit(pts, 1e-3)
    return {
        "kind": "law", "a": a, "beta": round(beta, 4),
        "n_points": len(pts), "n_range": [ns[0], ns[-1]],
        "max_dev_factor": round(maxdev, 3),
        "tolerance_factor": max(2.5, round(maxdev * 1.5, 2)),
        "unit": "q01-calibration-units",
    }


def fit_group(points: list[dict]) -> dict:
    """Power-law fit (or anchor) for one query's points."""
    ns = sorted({p["n"] for p in points})
    wall = _fit_wall(points)
    # all-zero shuffle: the strongest claim there is — stays zero
    if all(p["shuffle_mb"] < 1.0 for p in points):
        out = {"kind": "zero", "n_points": len(points),
               "n_range": [ns[0], ns[-1]],
               "tolerance_mb": 1.0}
        if wall:
            out["wall"] = wall
        return out
    if len(ns) < 3:
        vals = {}
        for p in points:
            vals.setdefault(p["n"], []).append(p["shuffle_mb"])
        out = {"kind": "anchor", "n_points": len(points),
               "anchors": {str(n): round(max(v), 2)
                           for n, v in vals.items()},
               "tolerance_factor": 2.0}
        if wall:
            out["wall"] = wall
        return out
    a, beta, maxdev = _power_fit(
        [(p["n"], p["shuffle_mb"]) for p in points], 1e-3)
    # laws earn their tolerance: the floor is 1.5 when the fit itself
    # is tight (r12 task 4 asked for sub-2.0 gates on fitted groups),
    # and only a loose fit keeps the legacy 2.0
    tol = max(1.5, round(maxdev * 1.25, 2))
    wall_n = (2048.0 / a) ** (1.0 / beta) if beta > 0 else None
    out = {
        "kind": "law", "a": a, "beta": round(beta, 4),
        "n_points": len(points), "n_range": [ns[0], ns[-1]],
        "max_dev_factor": round(maxdev, 3),
        "tolerance_factor": tol,
        "wall_n_2048mb": int(wall_n) if wall_n else None,
    }
    if wall:
        out["wall"] = wall
    return out


def predict(model: dict, n: int) -> float | None:
    if model["kind"] == "law":
        return model["a"] * n ** model["beta"]
    return None


def classify_spill(o: dict, by_artifact: dict) -> str | None:
    """Return the documented reason for a spilled observation, or
    None if the spill is unexplained (a failure)."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from scale_probe import SPILL_EXPECTED  # noqa: PLC0415

    q = o["query"]
    if q in SPILL_EXPECTED:
        return "SPILL_EXPECTED: output-bound pair class (scale_probe.py)"
    if q in DOCUMENTED_ONSETS:
        return DOCUMENTED_ONSETS[q]
    if q in KNOB_RESTORED:
        sibs = KNOB_RESTORED[q]
        return (f"onset with measured restoring knob(s): {', '.join(sibs)} "
                "(see the matching _knobs artifact)")
    return None


def check_observation(o: dict, models: dict) -> tuple[bool, str]:
    """One observation against the committed model."""
    m = models.get(o["query"])
    if m is None:
        return True, "no model (new query) — informational"
    if o["spill_mb"] > 0:
        reason = classify_spill(o, {})
        if reason:
            return True, f"spill documented: {reason}"
        return False, (f"UNEXPLAINED spill {o['spill_mb']} MB — not in "
                       "SPILL_EXPECTED/KNOB_RESTORED/DOCUMENTED_ONSETS")
    tol_scale = 1.5 if o["tag"] else 1.0  # s3/mem4g: attribution shifts
    # tagged (s3/mem4g) runs execute under different memory/partition
    # confs where AQE legitimately coalesces BELOW the law — a
    # capacity model is an upper envelope for planning, so undershoot
    # on a tagged run passes one-sided; untagged undershoot still
    # fails two-sided (it means the plan improved and the model is
    # stale — refit deliberately)
    one_sided = bool(o["tag"])
    if m["kind"] == "zero":
        ok = o["shuffle_mb"] <= m["tolerance_mb"] * (2 if o["tag"] else 1)
        return ok, (f"zero-class: {o['shuffle_mb']} MB "
                    f"(cap {m['tolerance_mb']})")
    if m["kind"] == "anchor":
        anchors = {int(k): v for k, v in m["anchors"].items()}
        if o["n"] not in anchors:
            return True, "anchor class, new n — informational"
        ref = anchors[o["n"]]
        dev = max(ref, o["shuffle_mb"]) / max(min(ref, o["shuffle_mb"]), 1e-3)
        ok = dev <= m["tolerance_factor"] * tol_scale or (
            one_sided and o["shuffle_mb"] <= ref)
        return ok, (f"anchor {ref} MB, observed {o['shuffle_mb']} MB "
                    f"(dev {dev:.2f}x, tol {m['tolerance_factor']})")
    pred = predict(m, o["n"])
    dev = max(pred, o["shuffle_mb"]) / max(min(pred, o["shuffle_mb"]), 1e-3)
    extra = "" if m["n_range"][0] <= o["n"] <= m["n_range"][1] \
        else " [extrapolated]"
    ok = dev <= m["tolerance_factor"] * tol_scale or (
        one_sided and o["shuffle_mb"] <= pred)
    wall_msg = ""
    w = m.get("wall")
    if ok and w and w.get("kind") == "law" and o.get("norm_sec"):
        wpred = w["a"] * o["n"] ** w["beta"]
        wdev = max(wpred, o["norm_sec"]) / max(
            min(wpred, o["norm_sec"]), 1e-3)
        wok = wdev <= w["tolerance_factor"] * tol_scale or (
            one_sided and o["norm_sec"] <= wpred)
        wall_msg = (f"; wall law {wpred:.2f} cal-units, observed "
                    f"{o['norm_sec']:.2f} (dev {wdev:.2f}x, "
                    f"tol {w['tolerance_factor']})")
        if not wok:
            return False, (f"WALL deviation{wall_msg} — host-normalized "
                           "time off the fitted law")
    return ok, (f"law predicts {pred:.1f} MB at n={o['n']}, observed "
                f"{o['shuffle_mb']} MB (dev {dev:.2f}x, "
                f"tol {m['tolerance_factor']}){extra}{wall_msg}")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", default=None,
                    help="validate ONE artifact against CAPACITY_MODEL.json")
    ap.add_argument("--out", default=os.path.join(REPO, "CAPACITY_MODEL.json"))
    args = ap.parse_args()

    if args.check:
        with open(os.path.join(REPO, "CAPACITY_MODEL.json")) as f:
            models = json.load(f)["models"]
        obs = load_observations(os.path.basename(args.check))
        if not obs:
            print(f"capacity_check: no observations in {args.check}",
                  file=sys.stderr)
            return 2
        failures = 0
        for o in obs:
            ok, msg = check_observation(o, models)
            print(f"{'PASS' if ok else 'FAIL'} {o['query']}@x{o['scale']}: "
                  f"{msg}")
            failures += 0 if ok else 1
        print(f"{len(obs) - failures} pass, {failures} fail")
        return 1 if failures else 0

    obs = load_observations()
    pts = fit_points(obs)
    by_query: dict[str, list[dict]] = {}
    for p in pts:
        by_query.setdefault(p["query"], []).append(p)
    models = {q: fit_group(ps) for q, ps in sorted(by_query.items())}

    # self-validation: EVERY committed observation must be accounted
    # for — within its model, a documented spill, or a named
    # superseded-plan exclusion (older round, same key re-measured
    # better later).
    # supersession is cross-tag: an s3/mem4g run of an OLD round
    # measured the old plan too — any later-round observation of the
    # same (query, scale) supersedes it
    latest_round: dict = {}
    for o in obs:
        key = (o["query"], o["scale"])
        latest_round[key] = max(latest_round.get(key, 0), o["round"])
    failures, superseded = 0, 0
    for o in obs:
        key = (o["query"], o["scale"])
        if o["round"] < latest_round[key]:
            ok, msg = check_observation(o, models)
            if not ok:
                superseded += 1  # plan improved since (q64 r07-r09 class)
                continue
        ok, msg = check_observation(o, models)
        if not ok:
            failures += 1
            print(f"FAIL {o['artifact']} {o['query']}@x{o['scale']}: {msg}")
    print(f"{len(obs)} observations: {failures} fail, "
          f"{superseded} superseded-plan history excluded "
          f"(older rounds re-measured better by later plans)")

    artifact = {
        "models": models,
        "fit_observations": len(pts),
        "total_observations": len(obs),
        "superseded_history": superseded,
        "note": (
            "shuffle_write_mb ~= a * n^beta per query over zero-spill "
            "latest-round observations; n = built rows of the query's "
            "primary table. tolerance_factor is the future-check gate; "
            "wall_n_2048mb is the n at which the law crosses the probe's "
            "single-box 2048 MB shuffle cap (divide by executor count on "
            "a real cluster). Spilled observations are classified "
            "(SPILL_EXPECTED / KNOB_RESTORED / DOCUMENTED_ONSETS), "
            "never fitted."
        ),
    }
    with open(args.out, "w") as f:
        json.dump(artifact, f, indent=1, sort_keys=True)
    print(f"wrote {args.out} ({len(models)} models)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
