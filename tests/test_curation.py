"""Tests for the corpus-curation ops (datapipe/curation.py):
text.normalize, pii.redact, text.repetition, decontam.ngram."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


@pytest.fixture(scope="module")
def cdocs(spark):
    rows = [
        (1, "Héllo,   WORLD!\nhello world\nhello world"),
        (2, "mail a.b-c@ex-ample.co.uk or see https://ex.org/p?q=1 call 555-123-4567"),
        (3, "a a a a a b"),
        (4, ""),
        (5, "the quick brown fox jumps over the lazy dog"),
    ]
    return spark.createDataFrame(rows, ["doc_id", "text"])


# -- text.normalize ---------------------------------------------------------

def test_normalize_default_lower_collapse_trim(ctx, cdocs):
    out = {r["doc_id"]: r["n"] for r in run_op(
        ctx, "text.normalize", [cdocs], column="text", output_column="n").collect()}
    assert out[1] == "héllo, world! hello world hello world"  # accents kept by default
    assert out[4] == ""


def test_normalize_accents_and_punct(ctx, cdocs):
    out = {r["doc_id"]: r["n"] for r in run_op(
        ctx, "text.normalize", [cdocs], column="text", output_column="n",
        strip_accents=True, strip_punct=True).collect()}
    assert out[1] == "hello world hello world hello world"


def test_normalize_overwrites_in_place_by_default(ctx, cdocs):
    out = run_op(ctx, "text.normalize", [cdocs], column="text")
    assert out.columns == cdocs.columns
    vals = {r["doc_id"]: r["text"] for r in out.collect()}
    assert vals[3] == "a a a a a b"


def test_normalize_nfc_pandas_path(ctx, spark):
    # e + combining acute (NFD) must normalize to the precomposed char
    df = spark.createDataFrame([(1, "café")], ["doc_id", "text"])
    out = run_op(ctx, "text.normalize", [df], column="text", output_column="n",
                 form="nfc", lowercase=False)
    assert out.collect()[0]["n"] == "café"


def test_normalize_rejects_bad_form(ctx, cdocs):
    with pytest.raises(ConfigError):
        run_op(ctx, "text.normalize", [cdocs], column="text", form="nfx")


# -- pii.redact -------------------------------------------------------------

def test_redact_all_types_fixed_order(ctx, spark):
    df = spark.createDataFrame(
        [(1, "u@x.io https://a.b/c 10.0.0.1 123-45-6789 4111 1111 1111 1111 555-123-4567")],
        ["doc_id", "text"],
    )
    out = run_op(ctx, "pii.redact", [df], column="text").collect()[0]["text"]
    assert out == "[EMAIL] [URL] [IPV4] [SSN] [CREDIT_CARD] [PHONE]"


def test_redact_subset_and_counts(ctx, cdocs):
    out = {r["doc_id"]: r for r in run_op(
        ctx, "pii.redact", [cdocs], column="text", output_column="red",
        types=["email", "url"], with_counts=True).collect()}
    assert "[EMAIL]" in out[2]["red"] and "[URL]" in out[2]["red"]
    assert "555-123-4567" in out[2]["red"]  # phone not in types -> kept
    assert out[2]["pii_email_count"] == 1
    assert out[5]["pii_email_count"] == 0


def test_redact_custom_replacement(ctx, cdocs):
    out = {r["doc_id"]: r["text"] for r in run_op(
        ctx, "pii.redact", [cdocs], column="text",
        types=["email"], replacement="<pii:{type}>").collect()}
    assert "<pii:EMAIL>" in out[2]


def test_redact_rejects_unknown_type(ctx, cdocs):
    with pytest.raises(ConfigError):
        run_op(ctx, "pii.redact", [cdocs], column="text", types=["dna"])


# -- text.repetition --------------------------------------------------------

def test_repetition_ratios(ctx, cdocs):
    out = {r["doc_id"]: r for r in run_op(
        ctx, "text.repetition", [cdocs], column="text", ngram=2).collect()}
    assert out[1]["line_dup_ratio"] == pytest.approx(1 / 3)   # 3 lines, 2 dup
    assert out[3]["token_dup_ratio"] == pytest.approx(4 / 6)  # aaaaab
    assert out[3]["top_ngram_ratio"] == pytest.approx(4 / 5)  # 'a a' x4 of 5
    assert out[4]["line_dup_ratio"] == 0.0 == out[4]["top_ngram_ratio"]
    assert out[5]["token_dup_ratio"] == pytest.approx(1 / 9)  # 'the' twice


def test_repetition_ngram_shorter_than_doc(ctx, spark):
    df = spark.createDataFrame([(1, "only two")], ["doc_id", "text"])
    out = run_op(ctx, "text.repetition", [df], column="text", ngram=5).collect()[0]
    assert out["top_ngram_ratio"] == 0.0  # no 5-grams -> 0, not NaN


def test_repetition_rejects_bad_ngram(ctx, cdocs):
    with pytest.raises(ConfigError):
        run_op(ctx, "text.repetition", [cdocs], column="text", ngram=0)


# -- decontam.ngram ---------------------------------------------------------

def test_decontam_flag_and_filter(ctx, spark, cdocs):
    bench = spark.createDataFrame([(100, "quick brown fox jumps")], ["doc_id", "text"])
    flagged = {r["doc_id"]: r["contaminated"] for r in run_op(
        ctx, "decontam.ngram", [cdocs, bench], column="text",
        id_column="doc_id", ngram=3).collect()}
    assert flagged[5] is True
    assert flagged[2] is False and flagged[4] is False

    kept = run_op(ctx, "decontam.ngram", [cdocs, bench], column="text",
                  id_column="doc_id", ngram=3, mode="filter")
    assert kept.columns == cdocs.columns
    assert 5 not in {r["doc_id"] for r in kept.collect()}


def test_decontam_requires_two_inputs(ctx, cdocs):
    with pytest.raises(ConfigError):
        run_op(ctx, "decontam.ngram", [cdocs], column="text", id_column="doc_id")


def test_decontam_broadcasts_benchmark(ctx, spark, cdocs):
    """Plan shape: the semi-join against benchmark grams must be a
    BroadcastHashJoin — the corpus side never shuffles for it."""
    bench = spark.createDataFrame([(100, "quick brown fox jumps")], ["doc_id", "text"])
    out = run_op(ctx, "decontam.ngram", [cdocs, bench], column="text",
                 id_column="doc_id", ngram=3, mode="filter")
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


# -- join.fuzzy -------------------------------------------------------------

def test_fuzzy_join_matches_within_distance(ctx, spark):
    left = spark.createDataFrame(
        [(1, "acme corporation"), (2, "globex incorporated")], ["id", "name"]
    )
    right = spark.createDataFrame(
        [(10, "acme corporatio"), (11, "initech llc"), (12, "ACME Corporation")],
        ["id", "name"],
    )
    out = run_op(ctx, "join.fuzzy", [left, right], on="name", id_column="id",
                 max_distance=2)
    got = {(r["id_a"], r["id_b"], r["distance"]) for r in out.collect()}
    assert (1, 10, 1) in got        # one deletion
    assert (1, 12, 0) in got        # case-insensitive exact
    assert all(b != 11 for _, b, _ in got)


def test_fuzzy_join_max_df_prunes(ctx, spark):
    left = spark.createDataFrame([(1, "abcdefghij")], ["id", "name"])
    right = spark.createDataFrame(
        [(10, "abcdefghix"), (11, "zzzzzzzzzz")], ["id", "name"]
    )
    out = run_op(ctx, "join.fuzzy", [left, right], on="name", id_column="id",
                 max_distance=2, max_df=1.0)
    assert {(r["id_a"], r["id_b"]) for r in out.collect()} == {(1, 10)}


def test_fuzzy_join_duplicate_ids_keep_strings_separate(ctx, spark):
    """An id that appears with two different strings must not pool
    their gram counts or cross-attach the wrong string to a pair."""
    left = spark.createDataFrame(
        [(7, "alice cooper"), (7, "bob zzz qqq xxyy")], ["id", "name"]
    )
    right = spark.createDataFrame([(10, "alice cooperr")], ["id", "name"])
    out = run_op(ctx, "join.fuzzy", [left, right], on="name", id_column="id",
                 max_distance=2)
    got = {(r["id_a"], r["s_a"], r["id_b"], r["distance"]) for r in out.collect()}
    assert got == {(7, "alice cooper", 10, 1)}  # bob never pairs


def test_fuzzy_join_validates(ctx, spark):
    df = spark.createDataFrame([(1, "x")], ["id", "name"])
    with pytest.raises(ConfigError):
        run_op(ctx, "join.fuzzy", [df, df], on="name", id_column="id",
               max_distance=-1)
    with pytest.raises(ConfigError):
        run_op(ctx, "join.fuzzy", [df, df], on="name", id_column="id", max_df=0)
    with pytest.raises(ConfigError):
        run_op(ctx, "join.fuzzy", [df, df], id_column="id")


def test_fuzzy_join_candidates_mode_verifies_given_pairs(ctx, spark):
    """3rd input = pre-blocked pairs: only those pairs are verified
    (no posting-join candidates), distance is thresholded."""
    left = spark.createDataFrame(
        [(1, "acme corporation"), (2, "globex incorporated")], ["id", "name"]
    )
    right = spark.createDataFrame(
        [(10, "acme corporatio"), (11, "initech llc"),
         (12, "globex incorporate")],
        ["id", "name"],
    )
    # pair (2, 12) is within distance but NOT in the candidate list —
    # candidates mode must not invent it; (1, 11) is a candidate but
    # fails the verify
    pairs = spark.createDataFrame([(1, 10), (1, 11)], ["id_a", "id_b"])
    out = run_op(ctx, "join.fuzzy", [left, right, pairs], on="name",
                 id_column="id", max_distance=2)
    got = {(r["id_a"], r["id_b"], r["distance"]) for r in out.collect()}
    assert got == {(1, 10, 1)}


def test_fuzzy_join_candidates_mode_custom_pair_columns(ctx, spark):
    left = spark.createDataFrame([(1, "alpha beta")], ["id", "name"])
    right = spark.createDataFrame([(9, "alpha betta")], ["id", "name"])
    pairs = spark.createDataFrame([(1, 9)], ["src", "dst"])
    out = run_op(ctx, "join.fuzzy", [left, right, pairs], on="name",
                 id_column="id", max_distance=2, pair_a="src", pair_b="dst")
    rows = out.collect()
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in rows] == [(1, 9, 1)]


def test_fuzzy_join_candidates_mode_rejects_dead_blocking_knobs(ctx, spark):
    """max_df/ngram configure the q-gram blocking that candidates
    mode skips entirely — accepting them silently would let a caller
    believe the hot-gram guard is armed when it is dead config."""
    left = spark.createDataFrame([(1, "alpha")], ["id", "name"])
    pairs = spark.createDataFrame([(1, 1)], ["id_a", "id_b"])
    for dead in ({"max_df": 0.05}, {"ngram": 4}):
        with pytest.raises(ConfigError, match="candidates mode"):
            run_op(ctx, "join.fuzzy", [left, left, pairs], on="name",
                   id_column="id", max_distance=2, **dead)


def test_fuzzy_join_candidates_mode_dedups_pair_rows(ctx, spark):
    """Blocking mode's pair groupBy guarantees one output row per
    (a, b); candidates mode must honour the same contract when the
    pre-blocked stream carries duplicate pair rows."""
    left = spark.createDataFrame([(1, "alpha beta")], ["id", "name"])
    right = spark.createDataFrame([(9, "alpha betta")], ["id", "name"])
    pairs = spark.createDataFrame(
        [(1, 9), (1, 9), (1, 9)], ["id_a", "id_b"]
    )
    out = run_op(ctx, "join.fuzzy", [left, right, pairs], on="name",
                 id_column="id", max_distance=2)
    rows = out.collect()
    assert [(r["id_a"], r["id_b"], r["distance"]) for r in rows] == [(1, 9, 1)]


def test_fuzzy_join_candidates_mode_is_case_insensitive(ctx, spark):
    """Candidates mode lowercases like blocking mode — the verify
    semantics must not depend on which path produced the pair."""
    left = spark.createDataFrame([(1, "ACME Corp")], ["id", "name"])
    right = spark.createDataFrame([(10, "acme corp")], ["id", "name"])
    pairs = spark.createDataFrame([(1, 10)], ["id_a", "id_b"])
    out = run_op(ctx, "join.fuzzy", [left, right, pairs], on="name",
                 id_column="id", max_distance=0)
    rows = out.collect()
    assert [(r["s_a"], r["s_b"], r["distance"]) for r in rows] == \
        [("acme corp", "acme corp", 0)]


# -- text.boilerplate -------------------------------------------------------

@pytest.fixture(scope="module")
def bdocs(spark):
    rows = [
        (1, "s1", "unique one\nCOPYRIGHT S1\nmore text"),
        (2, "s1", "unique two\nCOPYRIGHT S1"),
        (3, "s1", "unique three\nCOPYRIGHT S1"),
        (4, "s2", "unique four\nCOPYRIGHT S1"),
    ]
    return spark.createDataFrame(rows, ["id", "src", "text"])


def test_boilerplate_strip_per_group(ctx, bdocs):
    out = {r["id"]: r["text"] for r in run_op(
        ctx, "text.boilerplate", [bdocs], column="text", id_column="id",
        group_by="src", min_df=0.5).collect()}
    assert out[1] == "unique one\nmore text"
    assert out[2] == "unique two"
    assert out[4] == "unique four\nCOPYRIGHT S1"  # s2: below min_docs


def test_boilerplate_flag_ratio(ctx, bdocs):
    out = {r["id"]: r["boilerplate_ratio"] for r in run_op(
        ctx, "text.boilerplate", [bdocs], column="text", id_column="id",
        group_by="src", min_df=0.5, mode="flag").collect()}
    assert out[1] == pytest.approx(1 / 3)
    assert out[2] == pytest.approx(1 / 2)
    assert out[4] == 0.0


def test_boilerplate_duplicate_doc_ids_count_once(ctx, spark):
    """A doc id split across several input rows contributes ONCE to a
    line's document frequency — __df and __gtotal must both count
    distinct ids or the ratio doubles and legit lines get stripped."""
    rows = [
        (1, "SHARED LINE\nkeep one"),
        (1, "SHARED LINE\nkeep two"),   # same doc id, second chunk
        (2, "other text"),
        (3, "more text"),
    ]
    df = spark.createDataFrame(rows, ["id", "text"])
    # 3 distinct docs; SHARED LINE is in 1 of 3 (0.33) < min_df=0.5 —
    # the old row-count bug saw 2/3 and stripped it
    out = [r["text"] for r in run_op(
        ctx, "text.boilerplate", [df], column="text", id_column="id",
        min_df=0.5).collect()]
    assert sum("SHARED LINE" in t for t in out) == 2


def test_boilerplate_preserves_blank_lines_and_validates(ctx, spark):
    df = spark.createDataFrame(
        [(1, "a\n\nFOOT"), (2, "b\n\nFOOT")], ["id", "text"]
    )
    out = {r["id"]: r["text"] for r in run_op(
        ctx, "text.boilerplate", [df], column="text", id_column="id",
        min_df=0.5).collect()}
    assert out[1] == "a\n"  # blank line kept, footer stripped
    with pytest.raises(ConfigError):
        run_op(ctx, "text.boilerplate", [df], column="text", id_column="id", min_df=0)
    with pytest.raises(ConfigError):
        run_op(ctx, "text.boilerplate", [df], column="text", id_column="id", mode="zap")


# -- text.freq_score --------------------------------------------------------

def test_freq_score_ranks_common_text_higher(ctx, spark):
    rows = [(1, "the the the"), (2, "zxqv"), (3, "the zxqv"), (4, "")]
    df = spark.createDataFrame(rows, ["doc_id", "text"])
    out = {r["doc_id"]: r["freq_score"] for r in run_op(
        ctx, "text.freq_score", [df], column="text", id_column="doc_id").collect()}
    # corpus: the x4, zxqv x2, total 6. doc1: avg cnt 4 -> 4/6; doc2: 2/6
    assert out[1] == pytest.approx(4 / 6)
    assert out[2] == pytest.approx(2 / 6)
    assert out[3] == pytest.approx(3 / 6)  # (4+2)/2 / 6
    assert out[4] == 0.0                   # empty doc
    assert out[1] > out[2]


def test_freq_score_reference_corpus_mode(ctx, spark):
    docs = spark.createDataFrame([(1, "alpha beta"), (2, "gamma gamma")],
                                 ["doc_id", "text"])
    ref = spark.createDataFrame([(10, "alpha alpha alpha beta")], ["doc_id", "text"])
    out = {r["doc_id"]: r["freq_score"] for r in run_op(
        ctx, "text.freq_score", [docs, ref], column="text",
        id_column="doc_id").collect()}
    # ref counts: alpha=3, beta=1, total 4. doc1: (3+1)/2/4 = 0.5
    assert out[1] == pytest.approx(0.5)
    assert out[2] == 0.0  # fully OOV vs the reference


# -- text.chunk -------------------------------------------------------------

def test_text_chunk_overlap_and_tail(ctx, spark):
    df = spark.createDataFrame([(1, "a b c d e f g"), (2, "x"), (3, "")],
                               ["id", "text"])
    out = sorted((r["id"], r["chunk_id"], r["chunk"], r["n_tokens"]) for r in run_op(
        ctx, "text.chunk", [df], column="text", id_column="id",
        size=3, overlap=1).collect())
    assert out == [
        (1, 0, "a b c", 3), (1, 1, "c d e", 3), (1, 2, "e f g", 3), (1, 3, "g", 1),
        (2, 0, "x", 1),
    ]  # empty doc 3 yields nothing


def test_text_chunk_min_tokens_drops_overlap_only_tail(ctx, spark):
    df = spark.createDataFrame([(1, "a b c d e f g")], ["id", "text"])
    out = [r["chunk"] for r in run_op(
        ctx, "text.chunk", [df], column="text", id_column="id",
        size=3, overlap=1, min_tokens=2).collect()]
    assert out == ["a b c", "c d e", "e f g"]  # 1-token tail dropped


def test_text_chunk_validates(ctx, spark):
    df = spark.createDataFrame([(1, "a")], ["id", "text"])
    with pytest.raises(ConfigError):
        run_op(ctx, "text.chunk", [df], column="text", id_column="id", size=0)
    with pytest.raises(ConfigError):
        run_op(ctx, "text.chunk", [df], column="text", id_column="id",
               size=3, overlap=3)


# -- text.extract -----------------------------------------------------------

def test_text_extract_fields_and_types(ctx, spark):
    df = spark.createDataFrame(
        [(1, "GET /api/v2/users/42 200 12ms"),
         (2, "POST /login 401 3ms"),
         (3, "garbage line")], ["id", "line"])
    out = {r["id"]: r for r in run_op(
        ctx, "text.extract", [df], column="line", fields={
            "verb": {"pattern": r"^(GET|POST|PUT)"},
            "status": {"pattern": r" (\d{3}) ", "type": "int"},
            "ms": {"pattern": r"(\d+)ms", "type": "long"},
        }).collect()}
    assert out[1]["verb"] == "GET" and out[1]["status"] == 200 and out[1]["ms"] == 12
    assert out[2]["verb"] == "POST" and out[2]["status"] == 401
    assert out[3]["verb"] is None and out[3]["status"] is None  # no match -> NULL


def test_text_extract_group_and_keep_empty(ctx, spark):
    df = spark.createDataFrame([(1, "a=1;b=2")], ["id", "s"])
    out = run_op(ctx, "text.extract", [df], column="s", fields={
        "b": {"pattern": r"a=(\d);b=(\d)", "group": 2},
    }).collect()[0]
    assert out["b"] == "2"
    out2 = run_op(ctx, "text.extract", [df], column="s", keep_empty=True,
                  fields={"none": {"pattern": r"(z*)"}}).collect()[0]
    assert out2["none"] == ""  # empty capture preserved when asked


def test_text_extract_config_errors(ctx, spark):
    df = spark.createDataFrame([(1, "x")], ["id", "s"])
    with pytest.raises(ConfigError):
        run_op(ctx, "text.extract", [df], column="s")
    with pytest.raises(ConfigError):
        run_op(ctx, "text.extract", [df], column="s", fields={"a": {}})


def test_text_extract_rejects_duplicate_field_names(ctx, spark):
    df = spark.createDataFrame([(1, "a=1 b=2")], ["id", "s"])
    with pytest.raises(ConfigError, match="duplicate field"):
        run_op(ctx, "text.extract", [df], column="s", fields=[
            {"name": "a", "pattern": r"a=(\d+)"},
            {"name": "a", "pattern": r"b=(\d+)"},
        ])


def test_url_normalize(ctx, spark):
    rows = [
        (1, "HTTP://WWW.Example.COM:80/Path//Pg/?utm_source=x&b=2&a=1#f"),
        (2, "https://example.com:443/"),
        (3, "https://example.com:8443/x?gclid=abc&z=1"),
        (4, "not a url at all"),
        (5, "  ftp://Files.Example.org/pub/  "),
        (6, None),
        (7, "https://site.com/page/?"),
    ]
    df = spark.createDataFrame(rows, "id INT, url STRING")
    out = run_op(ctx, "url.normalize", [df], column="url")
    got = {r["id"]: r["url"] for r in out.collect()}
    assert got == {
        1: "http://www.example.com/Path//Pg?a=1&b=2",
        2: "https://example.com",
        3: "https://example.com:8443/x?z=1",   # non-default port kept
        4: "not a url at all",                 # schemeless: trim only
        5: "ftp://files.example.org/pub",
        6: None,
        7: "https://site.com/page",
    }
    # strip_www + no param sorting + keep tracking
    out2 = run_op(ctx, "url.normalize", [df], column="url",
                  strip_www=True, sort_params=False, strip_tracking=False)
    got2 = {r["id"]: r["url"] for r in out2.collect()}
    assert got2[1] == "http://example.com/Path//Pg?utm_source=x&b=2&a=1"
    assert got2[3] == "https://example.com:8443/x?gclid=abc&z=1"


def test_url_normalize_ref_is_functional_not_tracking(ctx, spark):
    """'ref' is frequently a functional parameter (GitLab/GitHub API
    ?ref=branch); stripping it by default merged distinct resources in
    downstream exact-dedup (ADVICE r7). It survives by default and is
    strippable via tracking_params opt-in."""
    rows = [
        (1, "https://gitlab.com/api/v4/files/x?ref=main"),
        (2, "https://gitlab.com/api/v4/files/x?ref=dev"),
        (3, "https://shop.com/p/1?ref=newsletter&fbclid=z"),
    ]
    df = spark.createDataFrame(rows, "id INT, url STRING")
    got = {r["id"]: r["url"] for r in
           run_op(ctx, "url.normalize", [df], column="url").collect()}
    assert got[1] == "https://gitlab.com/api/v4/files/x?ref=main"
    assert got[2] == "https://gitlab.com/api/v4/files/x?ref=dev"
    assert got[1] != got[2]
    assert got[3] == "https://shop.com/p/1?ref=newsletter"  # fbclid off

    # corpus that DOES use ref as a click-id: opt in explicitly
    got2 = {r["id"]: r["url"] for r in
            run_op(ctx, "url.normalize", [df], column="url",
                   tracking_params=["fbclid", "ref"]).collect()}
    assert got2[3] == "https://shop.com/p/1"

    # the list is interpolated into SQL: reject non-name entries
    from conveyor_spark.errors import ConfigError
    with pytest.raises(ConfigError, match="plain param"):
        run_op(ctx, "url.normalize", [df], column="url",
               tracking_params=["a'); drop --"])

    # empty override: only the utm_* prefix rule remains
    df2 = spark.createDataFrame(
        [(1, "https://a.com/x?utm_source=t&gclid=g")], "id INT, url STRING")
    got3 = run_op(ctx, "url.normalize", [df2], column="url",
                  tracking_params=[]).collect()[0]["url"]
    assert got3 == "https://a.com/x?gclid=g"
