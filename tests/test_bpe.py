"""BPE tokenizer: textbook example, differential fuzz, encode parity.

No SQL oracle exists for an iterative merge loop, so correctness
rests here: the incremental trainer must equal an independent
recount-from-scratch reference on arbitrary word tables, and encode
must reproduce the trainer's own final segmentations.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from conveyor_spark.datapipe.bpe import END, encode_word, train_merges
from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def naive_train(word_freqs, n_merges):
    """Recount-from-scratch reference (same tie-break)."""
    words = {w: list(w) + [END] for w in word_freqs if w}
    merges = []
    for _ in range(n_merges):
        counts = {}
        for w, sym in words.items():
            f = word_freqs[w]
            for pair in zip(sym, sym[1:]):
                counts[pair] = counts.get(pair, 0) + f
        if not counts:
            break
        best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        merges.append(best)
        joined = best[0] + best[1]
        for w, sym in words.items():
            out, i = [], 0
            while i < len(sym):
                if i + 1 < len(sym) and (sym[i], sym[i + 1]) == best:
                    out.append(joined)
                    i += 2
                else:
                    out.append(sym[i])
                    i += 1
            words[w] = out
    return merges, words


def test_textbook_example():
    """Sennrich et al.'s worked example: est merges first."""
    freqs = {"low": 5, "lower": 2, "newest": 6, "widest": 3}
    merges = train_merges(freqs, 4)
    assert merges[0] == ("e", "s")      # 9 occurrences
    assert merges[1] == ("es", "t")     # 9
    assert merges[2] == ("est", "</w>")  # 9
    assert merges[3] == ("l", "o")      # 7


@settings(max_examples=150, deadline=None)
@given(st.dictionaries(
    st.text(alphabet="abcde", min_size=1, max_size=6),
    st.integers(min_value=1, max_value=50),
    min_size=1, max_size=12,
), st.integers(min_value=1, max_value=15))
def test_incremental_trainer_equals_naive(freqs, n_merges):
    assert train_merges(dict(freqs), n_merges) == \
        naive_train(dict(freqs), n_merges)[0]


@settings(max_examples=100, deadline=None)
@given(st.dictionaries(
    st.text(alphabet="abcd", min_size=1, max_size=5),
    st.integers(min_value=1, max_value=20),
    min_size=1, max_size=8,
))
def test_encode_reproduces_training_segmentation(freqs):
    """Greedy lowest-rank encoding of each training word must equal
    the trainer's final segmentation of that word (the classic BPE
    invariant: merge order IS the rank order)."""
    merges, final_words = naive_train(dict(freqs), 10)
    ranks = {pair: i for i, pair in enumerate(merges)}
    for w in freqs:
        if w:
            assert encode_word(w, ranks) == final_words[w], w


def test_bpe_ops_end_to_end(ctx, spark):
    rows = [(i, "the lowest slowest newest tokens flow slowly") for i in range(20)] \
        + [(99, None), (100, "")]
    df = spark.createDataFrame(rows, "doc_id LONG, text STRING")
    merges = run_op(ctx, "text.bpe_train", [df], column="text", n_merges=30)
    m = merges.collect()
    assert 1 <= len(m) <= 30
    assert [r["rank"] for r in m] == list(range(len(m)))

    out = run_op(ctx, "text.bpe_encode", [df, merges], column="text",
                 tokens_column="toks")
    got = {r["doc_id"]: (r["n_bpe_tokens"], r["toks"]) for r in out.collect()}
    n, toks = got[0]
    assert n == len(toks) > 0
    # all docs with the same text encode identically
    assert got[5] == got[0]
    assert got[99][0] == 0 and got[100][0] == 0
    # merge table actually compresses vs raw chars+markers
    raw = sum(len(w) + 1 for w in
              "the lowest slowest newest tokens flow slowly".split())
    assert n < raw

    # python-side re-encode agrees with the op
    ranks = {(r["left"], r["right"]): r["rank"] for r in m}
    expect = []
    for w in "the lowest slowest newest tokens flow slowly".split():
        expect.extend(encode_word(w, ranks))
    assert toks == expect


def test_bpe_encode_rejects_wrong_table(ctx, spark):
    df = spark.createDataFrame([(1, "x")], "doc_id LONG, text STRING")
    with pytest.raises(ConfigError, match="merge"):
        run_op(ctx, "text.bpe_encode", [df, df], column="text")


def test_train_and_encode_agree_on_unicode_whitespace(ctx, spark):
    """Review finding: \\s is ASCII-only in JVM regex but Unicode in
    Python re — U+00A0 must tokenize IDENTICALLY in the train pass
    (JVM) and the encode workers (Python). With the explicit ASCII
    class, NBSP is a character token in both."""
    text = "aa\u00a0bb aa\u00a0bb aa"
    df = spark.createDataFrame([(1, text)], "doc_id LONG, text STRING")
    merges = run_op(ctx, "text.bpe_train", [df], column="text",
                    n_merges=100)
    out = run_op(ctx, "text.bpe_encode", [df, merges], column="text",
                 tokens_column="toks")
    row = out.collect()[0]
    # saturated vocabulary: words aa, bb and the NBSP char token ->
    # 3 aa + 2 bb + 2 nbsp = 7 tokens in BOTH engines' view
    assert row["n_bpe_tokens"] == 7, row["toks"]
    assert "\u00a0</w>" in row["toks"]
