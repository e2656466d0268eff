"""quality.gopher and text.c4_filter (webtext.py) against plain-Python
references on crafted pages."""

from __future__ import annotations

import re

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op

PAGES = [
    # long clean prose: passes everything (with min_words=10)
    (1, ("The results that we have to share are good and the method "
         "works with care. " * 4)),
    # all bullets, no stopword richness
    (2, "• one\n• two\n• three"),
    # symbol soup
    (3, "#### #### #### tag tag"),
    (4, None),
    # page poison + ellipsis line
    (5, ("Lorem ipsum dolor sit amet consectetur adipiscing elit.\n"
         "This line has all of the required words here of course.\n"
         "this line trails off into nothing at all...")),
    # mixed keep/drop lines for C4
    (6, ("This is a good line that we have written with care and it "
         "ends properly.\nshort one\nAnother proper sentence with "
         "more than five words stands here today.\nNo javascript "
         "needed in this line with many words here.")),
    (7, ""),
]


def gopher_ref(text, min_words=10, max_words=100000, min_awl=3.0,
               max_awl=10.0, max_sym=0.1, max_bullet=0.9, max_ell=0.3,
               min_alpha=0.8, min_stops=2):
    if text is None:
        return None
    toks = [t for t in re.split(r"\s+", text) if t]
    words = len(toks)
    wf = max(words, 1)
    awl = sum(len(t) for t in toks) / wf
    syms = text.count("#") + text.count("…") + len(re.findall(r"\.{3}", text))
    sym_ratio = syms / wf
    lines = [ln.strip(" ") for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    nl = max(len(lines), 1)
    bullet = sum(ln[:1] in ("•", "‣", "-", "*") for ln in lines) / nl
    ell = sum(ln.endswith("…") or ln.endswith("...") for ln in lines) / nl
    alpha = sum(bool(re.search("[a-zA-Z]", t)) for t in toks) / wf
    stops = len({t for t in re.split(r"\s+", text.lower()) if t}
                & {"the", "be", "to", "of", "and", "that", "have", "with"})
    ok = (min_words <= words <= max_words and min_awl <= awl <= max_awl
          and sym_ratio <= max_sym and bullet <= max_bullet
          and ell <= max_ell and alpha >= min_alpha and stops >= min_stops)
    return dict(words=words, awl=awl, sym=sym_ratio, bullet=bullet,
                ell=ell, alpha=alpha, stops=stops, ok=ok)


def c4_ref(text, min_line_words=5, min_sentences=2):
    if text is None:
        return None
    lines = [ln.strip(" ") for ln in text.split("\n")]
    lines = [ln for ln in lines if ln]
    kept = [ln for ln in lines
            if ln[-1:] in (".", "!", "?", '"')
            and len([w for w in re.split(r"\s+", ln) if w]) >= min_line_words
            and "javascript" not in ln.lower()]
    cleaned = "\n".join(kept)
    sentences = len(re.findall(r"[.!?]", cleaned))
    page_ok = ("lorem ipsum" not in text.lower() and "{" not in text
               and sentences >= min_sentences)
    return dict(kept=len(kept), total=len(lines), cleaned=cleaned,
                sentences=sentences, ok=page_ok)


@pytest.fixture(scope="module")
def pages_df(spark):
    return spark.createDataFrame(PAGES, "doc_id LONG, text STRING")


def test_gopher_matches_reference(ctx, pages_df):
    out = {r["doc_id"]: r for r in run_op(
        ctx, "quality.gopher", [pages_df], column="text",
        min_words=10).collect()}
    for i, text in PAGES:
        ref = gopher_ref(text)
        row = out[i]
        if ref is None:
            assert row["gopher_words"] is None
            assert row["gopher_pass"] is False
            continue
        assert row["gopher_words"] == ref["words"], i
        assert row["gopher_avg_word_len"] == pytest.approx(ref["awl"]), i
        assert row["gopher_symbol_ratio"] == pytest.approx(ref["sym"]), i
        assert row["gopher_bullet_ratio"] == pytest.approx(ref["bullet"]), i
        assert row["gopher_ellipsis_ratio"] == pytest.approx(ref["ell"]), i
        assert row["gopher_alpha_ratio"] == pytest.approx(ref["alpha"]), i
        assert row["gopher_stop_hits"] == ref["stops"], i
        assert row["gopher_pass"] == ref["ok"], i


def test_gopher_filter_mode_and_errors(ctx, pages_df):
    kept = run_op(ctx, "quality.gopher", [pages_df], column="text",
                  mode="filter", min_words=10)
    assert kept.columns == ["doc_id", "text"]
    exp = {i for i, t in PAGES
           if t is not None and gopher_ref(t)["ok"]}
    assert {r["doc_id"] for r in kept.collect()} == exp
    with pytest.raises(ConfigError, match="no column"):
        run_op(ctx, "quality.gopher", [pages_df], column="nope")
    with pytest.raises(ConfigError, match="mode"):
        run_op(ctx, "quality.gopher", [pages_df], column="text",
               mode="banana")


def test_c4_matches_reference(ctx, pages_df):
    out = {r["doc_id"]: r for r in run_op(
        ctx, "text.c4_filter", [pages_df], column="text", mode="clean",
        min_line_words=5, min_sentences=2).collect()}
    for i, text in PAGES:
        ref = c4_ref(text)
        row = out[i]
        if ref is None:
            assert row["text"] is None
            assert row["c4_page_ok"] is False
            continue
        assert row["c4_kept_lines"] == ref["kept"], i
        assert row["c4_total_lines"] == ref["total"], i
        assert row["c4_sentences"] == ref["sentences"], i
        assert row["c4_page_ok"] == ref["ok"], i
        assert row["text"] == ref["cleaned"], i


def test_c4_modes(ctx, pages_df):
    ann = run_op(ctx, "text.c4_filter", [pages_df], column="text",
                 mode="annotate", min_line_words=5, min_sentences=2)
    # annotate leaves the text column untouched
    orig = dict(PAGES)
    for r in ann.collect():
        assert r["text"] == orig[r["doc_id"]]
    filt = run_op(ctx, "text.c4_filter", [pages_df], column="text",
                  mode="filter", min_line_words=5, min_sentences=2)
    assert filt.columns == ["doc_id", "text"]
    exp = {i: c4_ref(t) for i, t in PAGES if t is not None}
    keep = {i for i, ref in exp.items() if ref["ok"]}
    rows = {r["doc_id"]: r["text"] for r in filt.collect()}
    assert set(rows) == keep
    for i, text in rows.items():
        assert text == exp[i]["cleaned"]
    with pytest.raises(ConfigError, match="mode"):
        run_op(ctx, "text.c4_filter", [pages_df], column="text",
               mode="banana")


def test_output_column_clash_raises(ctx, spark):
    df = spark.createDataFrame([(1, "t", True)],
                               "doc_id LONG, text STRING, gopher_pass BOOLEAN")
    with pytest.raises(ConfigError, match="would overwrite"):
        run_op(ctx, "quality.gopher", [df], column="text")
    df2 = spark.createDataFrame([(1, "t", 0)],
                                "doc_id LONG, text STRING, c4_sentences INT")
    with pytest.raises(ConfigError, match="would overwrite"):
        run_op(ctx, "text.c4_filter", [df2], column="text")
