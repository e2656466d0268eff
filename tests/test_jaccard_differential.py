"""dedup.ngram_jaccard vs a literal-Python reference of the
documented semantics, across seeded random corpora.

The q30/q51/q52 oracles pin three fixed corpora; this differential
sweeps randomized small-vocabulary corpora (small vocab forces heavy
GRAM sharing — the regime where the round-9 restructure could go
wrong: 128-bit hash keys, two-phase hot detection, the PPJoin
size-ratio filter, candidate threshold, string verify). For every
corpus and max_df, three computations must agree exactly:

  1. the default (hash-counted) path,
  2. verify=True (string-exact recount),
  3. a brute-force Python replay of the documented semantics —
     distinct word shingles, hot grams = df > max(floor(max_df*n),1)
     dropped from NUMERATORS only, FULL-size denominators, pairs with
     jaccard >= threshold.
"""

from __future__ import annotations

import math
import random
from itertools import combinations

import pytest

from tests.conftest import run_op

VOCAB = ["spark", "join", "row", "key", "scan", "agg", "sort", "hash"]


def _gen_corpus(seed: int, n_docs: int):
    rng = random.Random(seed)
    docs = []
    for i in range(n_docs):
        if i > 0 and rng.random() < 0.4:
            # near-dup of an earlier doc: perturb a few tokens
            base = docs[rng.randrange(i)][1].split()
            for _ in range(rng.randint(0, 2)):
                base[rng.randrange(len(base))] = rng.choice(VOCAB)
            text = " ".join(base)
        else:
            text = " ".join(rng.choice(VOCAB)
                            for _ in range(rng.randint(6, 14)))
        docs.append((i, text))
    return docs


def _py_shingles(text: str, n: int = 3):
    toks = [t for t in text.lower().split() if t]
    if len(toks) <= n:
        grams = [" ".join(toks[i:i + n])
                 for i in range(max(len(toks) - n, 0) + 1)]
    else:
        grams = [" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    # array_distinct keeps first occurrence; set() is fine for counts
    return list(dict.fromkeys(grams))


def _py_jaccard(docs, threshold, max_df):
    sh = {i: _py_shingles(t) for i, t in docs}
    n_docs = len(docs)
    cap = max(math.floor(max_df * n_docs), 1)
    df: dict[str, int] = {}
    for grams in sh.values():
        for g in grams:
            df[g] = df.get(g, 0) + 1
    hot = {g for g, c in df.items() if c > cap}
    out = {}
    for (a, _), (b, _) in combinations(docs, 2):
        inter = len((set(sh[a]) & set(sh[b])) - hot)
        denom = len(sh[a]) + len(sh[b]) - inter
        if denom > 0 and inter / denom >= threshold:
            out[(a, b)] = inter / denom
    return out


@pytest.mark.parametrize("seed,max_df,threshold", [
    (11, 0.5, 0.3),
    (22, 0.9, 0.5),
    (33, 0.25, 0.2),
    (44, 0.5, 0.5),
])
def test_jaccard_matches_python_reference(ctx, spark, seed, max_df, threshold):
    docs = _gen_corpus(seed, 14)
    df = spark.createDataFrame(docs, "doc_id LONG, text STRING")
    expected = _py_jaccard(docs, threshold, max_df)

    for verify in (False, True):
        got = {
            (r["id_a"], r["id_b"]): r["jaccard"]
            for r in run_op(
                ctx, "dedup.ngram_jaccard", [df], column="text",
                id_column="doc_id", shingle="word", ngram=3,
                threshold=threshold, max_df=max_df, verify=verify,
            ).collect()
        }
        assert set(got) == set(expected), (verify, seed)
        for k, v in expected.items():
            assert got[k] == pytest.approx(v, abs=1e-12), (verify, k)
