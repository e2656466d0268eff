"""text.cdc_chunk vs a literal-Python transcription of the boundary
rule, plus the content-defined property the op exists for: an edit
only perturbs chunks near the edit site."""

from __future__ import annotations

import hashlib

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def _h(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)


def _py_cdc(text: str, k: int, divisor: int):
    toks = [t for t in text.lower().split() if t]
    n = len(toks)
    if n == 0:
        return []
    bpos = [
        i for i in range(k - 1, n)
        if _h(" ".join(toks[i - k + 1:i + 1])) % divisor == 0
    ]
    starts = [0] + [p + 1 for p in bpos]
    ends = bpos + [n - 1]
    out = []
    for s, e in zip(starts, ends):
        if s > e:
            continue
        chunk = " ".join(toks[s:e + 1])
        out.append((len(out), chunk, e - s + 1, _h(chunk)))
    return out


WORDS = ("alpha beta gamma delta epsilon zeta eta theta iota kappa "
         "lam mu nu xi omicron pi rho sigma tau upsilon").split()


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (1, " ".join(WORDS * 3)),
        (2, "short"),
        (3, ""),
        (4, " ".join(WORDS[i % len(WORDS)] for i in range(0, 97, 1))),
    ]
    return spark.createDataFrame(rows, "doc_id LONG, text STRING")


@pytest.mark.parametrize("k,divisor", [(3, 4), (1, 2), (2, 8)])
def test_cdc_matches_reference(ctx, docs, k, divisor):
    out = run_op(ctx, "text.cdc_chunk", [docs], column="text",
                 id_column="doc_id", k=k, divisor=divisor)
    got: dict[int, list] = {}
    for r in out.collect():
        got.setdefault(r["doc_id"], []).append(
            (r["chunk_index"], r["chunk"], r["chunk_tokens"], r["chunk_hash"]))
    for row in docs.collect():
        exp = _py_cdc(row["text"], k, divisor)
        assert sorted(got.get(row["doc_id"], [])) == exp, (k, divisor, row["doc_id"])


def test_cdc_insertion_robustness(ctx, spark):
    # inserting a sentence mid-document must leave the chunk-hash
    # multiset identical outside the edit neighborhood — the property
    # fixed-size chunking lacks
    base = " ".join(WORDS * 5)  # 100 tokens
    toks = base.split()
    edited = " ".join(toks[:50] + ["INSERTED", "NOISE", "HERE"] + toks[50:])
    d = spark.createDataFrame(
        [(1, base), (2, edited)], "doc_id LONG, text STRING")
    out = run_op(ctx, "text.cdc_chunk", [d], column="text",
                 id_column="doc_id", k=2, divisor=8)
    hashes: dict[int, list] = {1: [], 2: []}
    for r in out.collect():
        hashes[r["doc_id"]].append(r["chunk_hash"])
    shared = set(hashes[1]) & set(hashes[2])
    # the python reference tells us exactly how many chunks to expect
    exp_base = {h for *_, h in _py_cdc(base, 2, 8)}
    exp_edit = {h for *_, h in _py_cdc(edited, 2, 8)}
    assert shared == exp_base & exp_edit
    # at least the chunks fully before/after the edit must survive
    assert len(shared) >= len(exp_base) - 2


def test_cdc_errors(ctx, docs):
    with pytest.raises(ConfigError, match="column"):
        run_op(ctx, "text.cdc_chunk", [docs], id_column="doc_id")
    with pytest.raises(ConfigError, match="divisor"):
        run_op(ctx, "text.cdc_chunk", [docs], column="text",
               id_column="doc_id", divisor=1)
    with pytest.raises(ConfigError, match="collides"):
        run_op(ctx, "text.cdc_chunk", [docs], column="text",
               id_column="doc_id", output_column="chunk_hash")


def test_cdc_null_text_emits_nothing(ctx, spark):
    d = spark.createDataFrame(
        [(1, None), (2, "some real tokens here")],
        "doc_id LONG, text STRING")
    out = run_op(ctx, "text.cdc_chunk", [d], column="text",
                 id_column="doc_id", k=2, divisor=4)
    assert {r["doc_id"] for r in out.collect()} == {2}
