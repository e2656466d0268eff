"""Differential tests for the scale probe's semantic pair-stream
floors (tools/scale_probe.py PAIR_EMITTING).

The probe's pass/fail at 64x depends on these DuckDB aggregates being
EXACT counts of each op's pair stream — a floor that overcounts makes
the cap vacuous, one that undercounts makes the probe cry wolf. Each
test builds a tiny corpus, computes the floor via the probe's SQL,
and compares against a brute-force Python replay of the same
construction (tokenize -> shingle/gram -> prune -> count pairs).
"""

from __future__ import annotations

import itertools
import math
import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from scale_probe import (  # noqa: E402
    _floor_q51,
    _floor_q64,
    _floor_q113,
    _floor_q140,
)

DOCS = [
    (0, "the quick brown fox jumps over the lazy dog again and again"),
    (1, "the quick brown fox jumps over the lazy dog again and again"),
    (2, "the quick brown fox leaps over a sleepy cat once more today"),
    (3, "completely different text with no overlap whatsoever here now"),
    (4, "the quick brown fox jumps over the lazy dog again and again"),
    (5, "short doc"),
    (6, "the " * 20 + "end of repeated tokens stream"),
]

PARTS = [
    (0, "small ring"), (101, "small ring"), (202, "small ring 2"),
    (303, "red bolt"), (404, "hot bolt"), (505, "red ring"),
    (5, "small ring"), (6, "blue gear"), (7, "blue gear"),
    (8, "old anvil"),
]


@pytest.fixture()
def con(tmp_path):
    c = duckdb.connect()
    c.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    c.executemany("INSERT INTO documents VALUES (?, ?)", DOCS)
    c.execute("CREATE TABLE part(p_partkey BIGINT, p_name VARCHAR)")
    c.executemany("INSERT INTO part VALUES (?, ?)", PARTS)
    yield c
    c.close()


def _toks(s: str) -> list[str]:
    return [t for t in s.lower().split() if t]


def _pairs_from_postings(postings: dict) -> int:
    """postings: key -> list of ids (with multiplicity).
    Cross-id pair count = sum over keys of pairs with id_a < id_b."""
    total = 0
    for ids in postings.values():
        for a, b in itertools.combinations(sorted(ids), 2):
            if a < b:
                total += 1
    return total


def test_floor_q51_matches_bruteforce(con):
    # word 3-shingles, distinct per doc, drop shingles with
    # df > max(floor(0.05*n), 1); pair stream = sum C(df, 2)
    n = len(DOCS)
    cap = max(math.floor(0.05 * n), 1)
    df: dict[str, set] = {}
    for doc_id, text in DOCS:
        tk = _toks(text)
        sh = {" ".join(tk[i:i + 3]) for i in range(max(len(tk) - 2, 0))}
        for s in sh:
            df.setdefault(s, set()).add(doc_id)
    expect = sum(
        len(ids) * (len(ids) - 1) // 2
        for ids in df.values() if len(ids) <= cap
    )
    assert int(_floor_q51(con) or 0) == expect


def test_floor_q64_matches_bruteforce(con):
    # 4-grams of lowered p_name; keep grams with catalog
    # count-distinct-id <= max(floor(0.05*N), 1); floor =
    # sum over kept grams of df_probe * df_catalog
    n = len(PARTS)
    cap = max(math.floor(0.05 * n), 1)
    cat: dict[str, set] = {}
    probe: dict[str, set] = {}
    for pk, name in PARTS:
        s = name.lower()
        grams = {s[i:i + 4] for i in range(max(len(s) - 3, 1))}
        for g in grams:
            cat.setdefault(g, set()).add(pk)
            if pk % 101 == 0:
                probe.setdefault(g, set()).add(pk)
    expect = sum(
        len(cat[g]) * len(probe.get(g, ()))
        for g in cat if len(cat[g]) <= cap
    )
    assert int(_floor_q64(con) or 0) == expect


def test_floor_q113_matches_bruteforce(con):
    # 15-token window postings (one per position), gram doc-frequency
    # pruning at 0.05 over docs with >= 15 tokens; cross-id matches =
    # (T^2 - sum_id cnt^2) / 2 per kept gram
    base = [(d, _toks(t)) for d, t in DOCS if len(_toks(t)) >= 15]
    n = len(base)
    cap = max(math.floor(0.05 * n), 1)
    posts: dict[str, list] = {}
    for doc_id, tk in base:
        for i in range(len(tk) - 14):
            posts.setdefault(" ".join(tk[i:i + 15]), []).append(doc_id)
    expect = 0
    for g, ids in posts.items():
        if len(set(ids)) > cap:
            continue
        t = len(ids)
        ss = sum(c * c for c in
                 (ids.count(d) for d in set(ids)))
        expect += (t * t - ss) // 2
    assert int(_floor_q113(con) or 0) == expect


def test_floor_q140_matches_bruteforce(con):
    # winnow k=4 w=5 selection (md5-encoded window-min, reversed-pos
    # tie-break), distinct fingerprints per doc; floor = sum C(df, 2)
    import hashlib

    df: dict[int, set] = {}
    for doc_id, text in DOCS:
        tk = _toks(text)
        if len(tk) < 4:
            grams = []
        else:
            grams = [" ".join(tk[i:i + 4]) for i in range(len(tk) - 3)]
        keys = [
            hashlib.md5(g.encode()).hexdigest()[:15] + "#"
            + str(999999999999 - i).zfill(12)
            for i, g in enumerate(grams)
        ]
        sel = set()
        if keys:
            for j in range(max(len(keys) - 5, 0) + 1):
                sel.add(min(keys[j:j + 5]))
        fps = {int(k[:15], 16) for k in sel}
        for f in fps:
            df.setdefault(f, set()).add(doc_id)
    expect = sum(
        len(ids) * (len(ids) - 1) // 2 for ids in df.values()
    )
    assert int(_floor_q140(con) or 0) == expect
