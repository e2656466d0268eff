"""The capacity model must stay green over the committed probe
corpus — every observation fitted, documented, or named-superseded —
and must actually falsify: an inflated observation fails."""
from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


@pytest.fixture(scope="module")
def capacity():
    import capacity_check as cc
    return cc


def test_all_committed_observations_accounted_for(capacity):
    obs = capacity.load_observations()
    assert len(obs) > 200  # the corpus is large; an empty glob is a bug
    pts = capacity.fit_points(obs)
    by_query: dict = {}
    for p in pts:
        by_query.setdefault(p["query"], []).append(p)
    models = {q: capacity.fit_group(ps) for q, ps in by_query.items()}

    latest: dict = {}
    for o in obs:
        key = (o["query"], o["scale"])
        latest[key] = max(latest.get(key, 0), o["round"])
    for o in obs:
        if o["round"] < latest[(o["query"], o["scale"])]:
            continue  # superseded-plan history (checked informationally)
        ok, msg = capacity.check_observation(o, models)
        assert ok, f"{o['artifact']} {o['query']}@x{o['scale']}: {msg}"


def test_family_exponents_match_design_claims(capacity):
    """The fitted laws must agree with the documented family shapes:
    scan/linear families ~n, driver-bounded families sublinear,
    fixed-knob candidate families superlinear (that is WHY the
    occupancy knobs exist)."""
    obs = capacity.load_observations()
    pts = capacity.fit_points(obs)
    by_query: dict = {}
    for p in pts:
        by_query.setdefault(p["query"], []).append(p)
    models = {q: capacity.fit_group(ps) for q, ps in by_query.items()}

    linear = ["q80_decontam_bloom", "q83_pack_sequences", "q121_knn_pq",
              "q122_dsir_select"]
    for q in linear:
        assert models[q]["kind"] == "law" and \
            0.85 <= models[q]["beta"] <= 1.15, (q, models[q])
    sublinear = ["q127_embedding_pca", "q160_fuzzy_join_candidates"]
    for q in sublinear:
        assert models[q]["kind"] == "law" and models[q]["beta"] < 0.6, \
            (q, models[q])
    fixed_knob_candidates = ["q152_knn_lsh_scaled",
                             "q151_bitext_lsh_blocked",
                             "q28_dedup_minhash"]
    for q in fixed_knob_candidates:
        assert models[q]["kind"] == "law" and models[q]["beta"] > 1.3, \
            (q, models[q])
    for q in ["q117_text_perplexity", "q132_semdedup", "q138_cdc_chunk"]:
        assert models[q]["kind"] == "zero", (q, models[q])


def test_fitted_wall_reproduces_measured_onset(capacity):
    """The q152 law fitted on the zero-spill points (n <= 57.7k) puts
    the single-box 2048 MB wall at ~190k vectors — the x256 probe ran
    n=156k and WAS the measured spill onset. The model is predictive,
    not descriptive."""
    obs = capacity.load_observations()
    pts = capacity.fit_points(obs)
    q152 = [p for p in pts if p["query"] == "q152_knn_lsh_scaled"]
    m = capacity.fit_group(q152)
    assert m["kind"] == "law"
    assert 100_000 <= m["wall_n_2048mb"] <= 400_000, m


def test_model_falsifies_inflated_observation(capacity):
    obs = capacity.load_observations()
    pts = capacity.fit_points(obs)
    by_query: dict = {}
    for p in pts:
        by_query.setdefault(p["query"], []).append(p)
    models = {q: capacity.fit_group(ps) for q, ps in by_query.items()}
    fake = dict(next(o for o in obs
                     if o["query"] == "q80_decontam_bloom"
                     and o["spill_mb"] == 0))
    fake["shuffle_mb"] *= 3
    ok, _ = capacity.check_observation(fake, models)
    assert not ok
    fake2 = dict(fake)
    fake2["shuffle_mb"] = fake["shuffle_mb"] / 3  # the real value
    ok2, _ = capacity.check_observation(fake2, models)
    assert ok2


def test_wall_laws_fitted_and_falsify(capacity):
    """The time dimension (r13): wall laws exist for the wide-span
    families, carry sane exponents, and actually fail a
    host-normalized observation off the law."""
    obs = capacity.load_observations()
    pts = capacity.fit_points(obs)
    by_query: dict = {}
    for p in pts:
        by_query.setdefault(p["query"], []).append(p)
    models = {q: capacity.fit_group(ps) for q, ps in by_query.items()}

    laws = {q: m["wall"] for q, m in models.items()
            if m.get("wall", {}).get("kind") == "law"}
    assert len(laws) >= 10  # the probe corpus is calibration-rich
    # linear-scan families walk the data: wall grows with n, but
    # never faster than ~their shuffle beta + GC headroom
    for q in ("q121_knn_pq", "q80_decontam_bloom", "q83_pack_sequences"):
        assert 0 < laws[q]["beta"] < 1.3, (q, laws[q])
    # the six r12 anchor groups all carry a wall model now (law where
    # the n-span gives leverage, anchors otherwise — never absent)
    for q in ("q113_dedup_substring", "q126_knn_pq_pretrained",
              "q128_mine_bitext", "q140_winnow_pairs",
              "q151x_bitext_finer_block", "q152x_lsh_occupancy256"):
        assert models[q]["kind"] == "law", q          # shuffle law
        assert models[q].get("wall") is not None, q   # time model

    # falsification: a normalized wall 8x off the law fails even
    # when the shuffle bytes are exactly right
    base = next(o for o in obs if o["query"] == "q80_decontam_bloom"
                and o["spill_mb"] == 0 and o["norm_sec"])
    fake = dict(base)
    fake["norm_sec"] *= 8
    ok, msg = capacity.check_observation(fake, models)
    assert not ok and "WALL" in msg
    ok2, _ = capacity.check_observation(dict(base), models)
    assert ok2


def test_wall_law_requires_leverage(capacity):
    """A <2x n-span must yield wall ANCHORS, not a law — cold-JVM
    wobble over a narrow span once fitted beta=-2 (q113)."""
    pts = [
        {"n": 10000, "norm_sec": 2.0, "shuffle_mb": 10.0, "spill_mb": 0},
        {"n": 12000, "norm_sec": 1.4, "shuffle_mb": 12.0, "spill_mb": 0},
        {"n": 15000, "norm_sec": 2.6, "shuffle_mb": 15.0, "spill_mb": 0},
    ]
    wall = capacity._fit_wall(pts)
    assert wall["kind"] == "anchor"
    wide = [dict(p, n=p["n"] * f) for p, f in zip(pts, (1, 4, 16))]
    assert capacity._fit_wall(wide)["kind"] == "law"
