"""text.winnow vs a literal-Python transcription of the
Schleimer-Wilkerson-Aiken selection rule (min hash per window,
rightmost on ties), plus the paper's detection guarantee."""

from __future__ import annotations

import hashlib

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "a different sentence the quick brown fox jumps entirely"),
    (3, "short doc"),
    (4, ""),
    (5, "rep rep rep rep rep rep"),  # equal hashes: rightmost-tie rule
]


def _h(gram: str) -> int:
    return int(hashlib.md5(gram.encode()).hexdigest()[:15], 16)


def _py_winnow(text: str, k: int, w: int) -> set[tuple[int, int]]:
    toks = [t for t in text.lower().split() if t]
    if len(toks) < k:
        return set()
    hashes = [_h(" ".join(toks[i:i + k])) for i in range(len(toks) - k + 1)]
    n = len(hashes)
    out = set()
    for j in range(max(n - w, 0) + 1):
        win = hashes[j:j + w]
        m = min(win)
        # rightmost minimal position
        pos = j + max(i for i, h in enumerate(win) if h == m)
        out.add((pos, m))
    return out


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id LONG, text STRING")


@pytest.mark.parametrize("k,w", [(3, 4), (1, 1), (2, 8), (4, 2)])
def test_winnow_matches_reference(ctx, docs, k, w):
    out = run_op(ctx, "text.winnow", [docs], column="text",
                 id_column="doc_id", k=k, window=w)
    got: dict[int, set] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], set()).add((r["pos"], r["fingerprint"]))
    for i, text in DOCS:
        assert got.get(i, set()) == _py_winnow(text, k, w), (i, k, w)


def test_winnow_detection_guarantee(ctx, spark):
    # two docs sharing a run of >= window + k - 1 tokens must share a
    # selected fingerprint — the property the algorithm exists for
    shared = "alpha beta gamma delta epsilon zeta eta"  # 7 tokens
    rows = [
        (1, "x y z " + shared + " p q"),
        (2, shared + " completely unrelated tail words"),
    ]
    d = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    out = run_op(ctx, "text.winnow", [d], column="text",
                 id_column="doc_id", k=3, window=5)  # t = 5 + 3 - 1 = 7
    fps = {}
    for r in out.collect():
        fps.setdefault(r["doc_id"], set()).add(r["fingerprint"])
    assert fps[1] & fps[2], "guaranteed shared fingerprint missing"


def test_winnow_short_docs_and_errors(ctx, docs, spark):
    out = run_op(ctx, "text.winnow", [docs], column="text",
                 id_column="doc_id", k=3, window=4)
    ids = {r["doc_id"] for r in out.collect()}
    assert 4 not in ids          # empty doc: nothing
    assert 3 not in ids          # 2 tokens < k=3: nothing
    # doc shorter than the window still fingerprints (clipped window)
    d = spark.createDataFrame([(9, "a b c d")], "doc_id LONG, text STRING")
    short = run_op(ctx, "text.winnow", [d], column="text",
                   id_column="doc_id", k=3, window=10)
    assert {(r["pos"], r["fingerprint"]) for r in short.collect()} == \
        _py_winnow("a b c d", 3, 10)
    with pytest.raises(ConfigError, match="column"):
        run_op(ctx, "text.winnow", [docs], id_column="doc_id")
    with pytest.raises(ConfigError, match="distinct"):
        run_op(ctx, "text.winnow", [docs], column="text",
               id_column="doc_id", pos_column="doc_id")


def test_winnow_null_text_emits_nothing(ctx, spark):
    # review finding: under ANSI, size(NULL tokens)=NULL fell through
    # the < k guard and every NULL-text doc emitted md5('') at pos 0 —
    # collapsing all NULL docs into one bogus duplicate cluster
    d = spark.createDataFrame(
        [(1, None), (2, None), (3, "real words here okay")],
        "doc_id LONG, text STRING")
    out = run_op(ctx, "text.winnow", [d], column="text",
                 id_column="doc_id", k=3, window=4)
    assert {r["doc_id"] for r in out.collect()} == {3}
