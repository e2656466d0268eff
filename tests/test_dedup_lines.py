"""text.dedup_lines vs a literal-Python first-occurrence filter."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from tests.conftest import run_op


def _py_dedup(text, key="trim"):
    if text is None:
        return None, None
    lines = text.split("\n")

    def k(line):
        if key == "exact":
            return line
        if key == "trim":
            return line.strip()
        return line.strip().lower()

    seen: dict[str, int] = {}
    kept = []
    for i, line in enumerate(lines):
        kk = k(line)
        if kk == "":
            kept.append(line)
            continue
        if kk not in seen:
            seen[kk] = i
            kept.append(line)
    return "\n".join(kept), len(lines) - len(kept)


ROWS = [
    (1, "alpha\ncookie banner\nbeta\ncookie banner\ngamma"),
    (2, "x\n  x  \nX\nx"),             # trim/lower key variants
    (3, "solo line"),
    (4, "a\n\n\na"),                   # blank lines survive
    (5, None),
    (6, ""),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(ROWS, "doc_id LONG, text STRING")


@pytest.mark.parametrize("key", ["exact", "trim", "trim_lower"])
def test_dedup_lines_matches_reference(ctx, docs, key):
    out = run_op(ctx, "text.dedup_lines", [docs], column="text", key=key)
    got = {r["doc_id"]: (r["text"], r["lines_removed"])
           for r in out.collect()}
    for i, t in ROWS:
        exp_text, exp_removed = _py_dedup(t, key)
        assert got[i] == (exp_text, exp_removed), (key, i)


def test_dedup_lines_annotate_and_output_column(ctx, docs):
    out = run_op(ctx, "text.dedup_lines", [docs], column="text",
                 mode="annotate")
    row = {r["doc_id"]: r for r in out.collect()}
    assert row[1]["text"] == ROWS[0][1]          # untouched
    assert row[1]["lines_removed"] == 1
    out2 = run_op(ctx, "text.dedup_lines", [docs], column="text",
                  output_column="clean_text")
    r1 = out2.filter("doc_id = 1").collect()[0]
    assert r1["text"] == ROWS[0][1]
    assert r1["clean_text"] == _py_dedup(ROWS[0][1])[0]


def test_dedup_lines_errors(ctx, docs):
    with pytest.raises(ConfigError, match="column"):
        run_op(ctx, "text.dedup_lines", [docs])
    with pytest.raises(ConfigError, match="overwrite"):
        run_op(ctx, "text.dedup_lines", [docs.selectExpr(
            "doc_id", "text", "1 AS lines_removed")], column="text")


def test_dedup_lines_annotate_rejects_output_column(ctx, docs):
    # review finding: output_column was silently ignored in annotate
    # mode (the user believes they got a cleaned copy)
    with pytest.raises(ConfigError, match="annotate"):
        run_op(ctx, "text.dedup_lines", [docs], column="text",
               mode="annotate", output_column="clean_text")


def test_dedup_lines_null_text_invariant_under_ansi(ctx, spark):
    """review finding: under non-ANSI, size(NULL)=-1 made
    sequence(1,-1) DESCEND, rewriting NULL text to '' with
    lines_removed=-1. NULL in -> (NULL, NULL) in BOTH ANSI modes."""
    df = spark.createDataFrame([(1, "a\na"), (2, None)],
                               "doc_id LONG, text STRING")
    old = spark.conf.get("spark.sql.ansi.enabled")
    try:
        results = {}
        for ansi in ("true", "false"):
            spark.conf.set("spark.sql.ansi.enabled", ansi)
            out = run_op(ctx, "text.dedup_lines", [df], column="text")
            results[ansi] = {r["doc_id"]: (r["text"], r["lines_removed"])
                             for r in out.collect()}
        assert results["true"] == results["false"]
        assert results["true"][2] == (None, None)
        assert results["true"][1] == ("a", 1)
    finally:
        spark.conf.set("spark.sql.ansi.enabled", old)
