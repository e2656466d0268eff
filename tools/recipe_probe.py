"""Recipe-composition probe (round 10, VERDICT r9 item 5).

tests/test_recipe_pipelines.py proves the C4 and RefinedWeb recipe
TOMLs at sf0.001; composed pipelines can hit cross-op plan cliffs
(repeated exchanges, lost pushdown through stage boundaries) that
single-op queries never see. This probe runs BOTH recipes at a real
scale factor (default sf0.1) under stage-metric instrumentation and
asserts:

  1. zero errors, zero disk spill, shuffle recorded;
  2. the output ROW COUNT equals an independent FULL-RECIPE DuckDB
     replay — C4: page synth -> language-ID -> C4 line rules ->
     within-doc line dedup -> exact page dedup -> 13-gram
     decontamination; RefinedWeb: URL canonicalization -> URL dedup
     -> HTML strip -> Gopher rules -> repetition filters -> line
     dedup -> MinHash-LSH pairs -> transitive cluster resolution.
     Every fragment is the SAME construction the q-suite pins
     hash-exact per-op (q31 langid, q130 c4, q146 dedup_lines, q58
     decontam, q85 html_strip, q129 gopher, q57 repetition, q28
     minhash, q53/q145 components/resolve);
  3. the scale-independent recipe property set holds on the written
     parquet (C4 line rules survive composition, no repeated lines,
     split fractions; canonical URLs, no markup, gopher min_words);
  4. the sink-input plan materializes nothing at stage boundaries:
     no InMemoryRelation/InMemoryTableScan (compiler-inserted cache),
     no Python eval nodes. (Op-INTERNAL localCheckpoints — e.g.
     dedup.resolve's component iteration — appear as Scan
     ExistingRDD and are by-design, not stage-boundary artifacts.)

Usage: python tools/recipe_probe.py [--sf-dir DIR] [--out JSON]
Exit 0 = all assertions hold; 1 = violation (named on stderr).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

_TOK = r"list_filter(string_split_regex(lower({c}), '\s+'), x -> x <> '')"


def _shingles(tk: str, n: int) -> str:
    """Distinct word n-grams — decontam.ngram's construction (the
    q58 oracle's _SQL_SHINGLE5 shape, parameterized)."""
    return (
        f"list_distinct(list_transform("
        f"range(0, greatest(len({tk}) - {n}, 0) + 1), "
        f"i -> array_to_string(list_slice({tk}, i + 1, i + {n}), ' ')))"
    )


def c4_count_sql(path: str) -> str:
    """Full C4-recipe row-count replay over {path}'s documents."""
    from conveyor_spark.queries import _HITS, _LANG_CASE

    page_expr = (
        "concat('The corpus says ', substr(text, 1, 60 + doc_id % 40), "
        "'.', chr(10), 'Subscribe to our newsletter today.', chr(10), "
        "'Subscribe to our newsletter today.', chr(10), "
        "'It follows that the ', substr(text, 20, 40 + doc_id % 30), "
        "' holds.', chr(10), 'ok')"
    )
    tok = _TOK.format(c="page")
    return f"""
    WITH documents AS (SELECT * FROM read_parquet('{path}')),
    pg AS (SELECT doc_id, {page_expr} AS page FROM documents),
    tkk AS (SELECT doc_id, page,
                   list_distinct({tok}) AS tk FROM pg),
    hits AS (SELECT doc_id, page, {_HITS} FROM tkk),
    en AS (SELECT doc_id, page FROM hits
           WHERE ({_LANG_CASE}) = 'en'),
    lx AS (SELECT doc_id,
                  list_filter(list_transform(string_split(page, chr(10)),
                                             x -> trim(x)),
                              x -> x <> '') AS lines
           FROM en),
    kx AS (SELECT doc_id,
                  list_filter(lines,
                      x -> list_contains(['.', '!', '?', '"'],
                                         right(x, 1))
                           AND len(list_filter(
                                 string_split_regex(x, '\\s+'),
                                 w -> w <> '')) >= 5
                           AND NOT contains(lower(x), 'javascript')
                  ) AS kept
           FROM lx),
    cl AS (SELECT doc_id,
                  COALESCE(array_to_string(kept, chr(10)), '') AS page
           FROM kx),
    st AS (SELECT doc_id, string_split(page, chr(10)) AS lines,
                  list_transform(string_split(page, chr(10)),
                                 l -> trim(l)) AS keys
           FROM cl),
    dl AS (SELECT doc_id,
                  array_to_string(list_transform(
                      list_filter(range(1, len(lines) + 1),
                          i -> keys[i] = ''
                               OR list_position(keys, keys[i]) = i),
                      i -> lines[i]), chr(10)) AS page
           FROM st),
    ex AS (SELECT page, min(doc_id) AS doc_id FROM dl GROUP BY page),
    bench AS (SELECT page FROM dl WHERE doc_id % 97 = 0),
    btk AS (SELECT {_TOK.format(c="page")} AS tk FROM bench),
    bg AS (SELECT DISTINCT unnest({_shingles("tk", 13)}) AS g FROM btk),
    etk AS (SELECT doc_id, {_TOK.format(c="page")} AS tk FROM ex),
    eg AS (SELECT doc_id, unnest({_shingles("tk", 13)}) AS g FROM etk),
    dirty AS (SELECT DISTINCT doc_id FROM eg
              WHERE g IN (SELECT g FROM bg))
    SELECT (SELECT count(*) FROM ex) - (SELECT count(*) FROM dirty)
    """


def _html_strip_sql(src: str) -> str:
    """q85's pinned strip chain: tag classes -> entity decode ->
    whitespace normalization, applied to {src}."""
    return rf"""
      regexp_replace(regexp_replace(regexp_replace(regexp_replace(
        replace(replace(replace(replace(replace(replace(replace(
          regexp_replace(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(
            {src},
            '(?is)<script\b[^>]*>.*?</script>', ' ', 'g'),
            '(?is)<style\b[^>]*>.*?</style>', ' ', 'g'),
            '(?s)<!--.*?-->', ' ', 'g'),
            '(?is)<br\s*/?>|</p>|</div>|</li>|</tr>|</h[1-6]>',
            chr(10), 'g'),
            '(?s)<[^>]+>', ' ', 'g'),
          '&nbsp;', ' '), '&amp;', '&'), '&lt;', '<'), '&gt;', '>'),
          '&quot;', '"'), '&#39;', chr(39)), '&apos;', chr(39)),
        '[ \t\r\f]+', ' ', 'g'),
        ' ?\n ?', chr(10), 'g'),
        '\n{{3,}}', chr(10) || chr(10), 'g'),
        '(?s)^\s+|\s+$', '', 'g')
    """


def rw_count_sql(path: str) -> str:
    """Full RefinedWeb-recipe row-count replay over {path}."""
    from conveyor_spark.queries import _minhash_oracle

    html_expr = (
        "concat('<html><body><nav>Home &amp; About</nav>"
        "<p>The page explains that ', substr(text, 1, 60 + doc_id % 40), "
        "'.</p><p>In practice the ', substr(text, 15, 45 + doc_id % 25), "
        "' as well.</p><script>track();</script></body></html>')"
    )
    tok_raw = r"list_filter(string_split_regex(page, '\s+'), x -> x <> '')"
    gopher_stops = "['the','be','to','of','and','that','have','with']"
    strip = _html_strip_sql("html")
    mh = _minhash_oracle()  # 16 hashes / 4 bands / word 3-shingles
    return f"""
    WITH RECURSIVE raw AS (SELECT * FROM read_parquet('{path}')),
    curl AS (SELECT doc_id, text,
                    concat('http://www.crawl', (doc_id % 5)::VARCHAR,
                           '.org/doc/', (doc_id % 200)::VARCHAR) AS url
             FROM raw),
    uu AS (SELECT doc_id, text FROM (
             SELECT doc_id, text,
                    row_number() OVER (PARTITION BY url
                                       ORDER BY doc_id) AS rn
             FROM curl) WHERE rn = 1),
    h AS (SELECT doc_id, {html_expr} AS html FROM uu),
    sx AS (SELECT doc_id, {strip} AS page FROM h),
    gm AS (SELECT doc_id, page,
             {tok_raw} AS toks,
             list_filter(list_transform(string_split(page, chr(10)),
                                        x -> trim(x)),
                         x -> x <> '') AS lines
           FROM sx),
    gr AS (SELECT doc_id, page, lines,
             len(toks)::BIGINT AS words,
             greatest(len(toks), 1)::DOUBLE AS wf,
             length(array_to_string(toks, ''))::DOUBLE AS chars,
             (len(string_split(page, '#')) - 1
              + len(string_split(page, '…')) - 1
              + len(string_split_regex(page, '\\.{{3}}')) - 1) AS syms,
             len(list_filter(toks,
                 t -> regexp_matches(t, '[a-zA-Z]'))) AS alpha,
             len(list_intersect(
                 list_distinct({_TOK.format(c="page")}),
                 {gopher_stops})) AS hits
           FROM gm),
    gok AS (SELECT doc_id, page, lines FROM gr
            WHERE words >= 10 AND words <= 100000
              AND chars / wf >= 3.0 AND chars / wf <= 10.0
              AND syms::DOUBLE / wf <= 0.1
              AND len(list_filter(lines,
                      l -> list_contains(['•','‣','-','*'],
                                         left(l, 1))))::DOUBLE
                    / greatest(len(lines), 1) <= 0.9
              AND len(list_filter(lines,
                      l -> ends_with(l, '…')
                           OR ends_with(l, '...')))::DOUBLE
                    / greatest(len(lines), 1) <= 0.3
              AND alpha::DOUBLE / wf >= 0.8
              AND hits >= 2),
    rp AS (SELECT doc_id, page, lines,
             {_TOK.format(c="page")} AS tk FROM gok),
    rg AS (SELECT doc_id,
             CASE WHEN len(tk) < 2 THEN []::VARCHAR[]
                  ELSE list_transform(range(0, len(tk) - 1),
                       i -> array_to_string(list_slice(tk, i + 1, i + 2),
                                            ' '))
             END AS g
           FROM rp),
    rf AS (SELECT doc_id, MAX(n) AS mx, SUM(n) AS tot FROM (
             SELECT doc_id, gram, COUNT(*) AS n
             FROM (SELECT doc_id, unnest(g) AS gram FROM rg)
             GROUP BY doc_id, gram)
           GROUP BY doc_id),
    nrep AS (SELECT p.doc_id, p.page FROM rp p
             LEFT JOIN rf ON p.doc_id = rf.doc_id
             WHERE (CASE WHEN len(p.lines) <= 0 THEN 0.0
                    ELSE 1.0 - len(list_distinct(p.lines))::DOUBLE
                               / len(p.lines)::DOUBLE END) <= 0.3
               AND COALESCE(rf.mx::DOUBLE / rf.tot::DOUBLE, 0.0) <= 0.5),
    stx AS (SELECT doc_id, string_split(page, chr(10)) AS lines,
                   list_transform(string_split(page, chr(10)),
                                  l -> trim(l)) AS keys
            FROM nrep),
    documents AS (SELECT doc_id,
                  array_to_string(list_transform(
                      list_filter(range(1, len(lines) + 1),
                          i -> keys[i] = ''
                               OR list_position(keys, keys[i]) = i),
                      i -> lines[i]), chr(10)) AS text
            FROM stx),
    pairs AS (SELECT id_a, id_b FROM ({mh}) mhx),
    und AS (SELECT id_a AS a, id_b AS b FROM pairs
            UNION ALL SELECT id_b, id_a FROM pairs),
    verts AS (SELECT DISTINCT a AS v FROM und),
    walk(v, l) AS (
      SELECT v, v FROM verts
      UNION
      SELECT u.b, w.l FROM walk w JOIN und u ON u.a = w.v
    ),
    comp AS (SELECT v AS id, MIN(l) AS component FROM walk GROUP BY v)
    SELECT (SELECT count(*) FROM documents)
           - (SELECT count(*) FROM comp WHERE id <> component)
    """


def pq_path(path: str) -> str:
    """read_parquet target for a single file OR a Spark-written
    directory (the Zipf probe generator writes directories)."""
    return f"{path}/*.parquet" if os.path.isdir(path) else path


def duck(sql: str):
    import duckdb

    con = duckdb.connect()
    con.execute("SET threads TO 16")
    try:
        return con.execute(sql).fetchone()[0]
    finally:
        con.close()


def run_recipe(spark, toml_path: str, sf_dir: str, out_dir: str,
               metrics) -> dict:
    from conveyor_spark.compiler import compile_pipeline, run_pipeline
    from conveyor_spark.config.spec import load_spec

    spec = load_spec(toml_path)
    for st in spec.stages:
        if st.function == "parquet.read":
            st.config["path"] = os.path.join(sf_dir, "documents.parquet")
        elif st.function == "parquet.write":
            st.config["path"] = out_dir

    # plan audit first (lazy build, sinks not run): the sink-input
    # plan must show no compiler-inserted materialization and no
    # Python eval nodes
    lazy = compile_pipeline(spark, spec, run_sinks=False)
    assert not lazy.errors, lazy.errors
    sink_in = lazy.outputs["with_split"]
    plan = sink_in._jdf.queryExecution().executedPlan().toString()
    plan_bad = [
        marker for marker in
        ("InMemoryRelation", "InMemoryTableScan",
         "BatchEvalPython", "ArrowEvalPython")
        if marker in plan
    ]

    t0 = time.time()
    metrics.snapshot()
    result = run_pipeline(spark, spec)
    sec = round(time.time() - t0, 2)
    m = metrics.snapshot()
    rows = duck(f"SELECT count(*) FROM '{out_dir}/*.parquet'")
    return {
        "sec": sec, "rows": rows,
        "errors": dict(result.errors), "plan_bad_nodes": plan_bad,
        **m,
    }


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=None)
    ap.add_argument("--recipes", nargs="*",
                    choices=("c4", "refinedweb"),
                    default=["c4", "refinedweb"],
                    help="subset (the RefinedWeb recipe's synthetic "
                         "URL classes collapse Zipf-replicated ids to "
                         "200 rows, so Zipf runs are c4-only)")
    args = ap.parse_args()

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    from conveyor_spark.session import get_spark

    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tools"))
    from scale_probe import StageMetrics

    spark = get_spark(app_name="conveyor-recipe-probe",
                      shuffle_partitions=32,
                      extra_conf={"spark.ui.enabled": "true"})
    metrics = StageMetrics(spark)
    docs = pq_path(os.path.join(args.sf_dir, "documents.parquet"))
    examples = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "examples")
    result: dict = {"sf_dir": args.sf_dir, "recipes": {}}
    violations: list[str] = []

    for name, toml, count_sql_fn, props in (
        ("c4", "c4_recipe_pipeline.toml", c4_count_sql, [
            ("c4_line_rules_hold", """
               SELECT count(*) FROM (
                 SELECT unnest(string_split(page, chr(10))) AS line
                 FROM '{out}/*.parquet')
               WHERE NOT regexp_matches(line, '[.!?\"]$')
                  OR len(string_split(trim(line), ' ')) < 5""", 0),
            ("c4_pages_distinct", """
               SELECT count(*) - count(DISTINCT page)
               FROM '{out}/*.parquet'""", 0),
            ("c4_split_parts", """
               SELECT count(DISTINCT split) FROM '{out}/*.parquet'""", 3),
        ]),
        ("refinedweb", "refinedweb_recipe_pipeline.toml", rw_count_sql, [
            ("rw_urls_canonical", """
               SELECT count(*) FROM '{out}/*.parquet'
               WHERE url LIKE '%:80%' OR url LIKE '%utm_%'
                  OR url LIKE '%#%' OR url <> lower(url)""", 0),
            ("rw_no_markup", """
               SELECT count(*) FROM '{out}/*.parquet'
               WHERE page LIKE '%<%' OR page LIKE '%&amp;%'
                  OR page LIKE '%track();%'""", 0),
            ("rw_gopher_min_words", """
               SELECT count(*) FROM '{out}/*.parquet'
               WHERE len(string_split(trim(page), ' ')) < 10""", 0),
            ("rw_urls_distinct", """
               SELECT count(*) - count(DISTINCT url)
               FROM '{out}/*.parquet'""", 0),
        ]),
    ):
        if name not in args.recipes:
            continue
        out_dir = tempfile.mkdtemp(prefix=f"recipe_probe_{name}_")
        shutil.rmtree(out_dir, ignore_errors=True)  # parquet.write mkdirs
        try:
            rec = run_recipe(spark, os.path.join(examples, toml),
                             args.sf_dir, out_dir, metrics)
            if rec["errors"]:
                violations.append(f"{name}: stage errors {rec['errors']}")
            if rec["plan_bad_nodes"]:
                violations.append(
                    f"{name}: stage-boundary materialization/Python "
                    f"nodes in sink plan: {rec['plan_bad_nodes']}")
            if rec["spilled_disk_mb"] > 0:
                violations.append(
                    f"{name}: spilled {rec['spilled_disk_mb']} MB")
            t0 = time.time()
            expect = duck(count_sql_fn(docs))
            rec["oracle_rows"] = int(expect)
            rec["oracle_sec"] = round(time.time() - t0, 2)
            if rec["rows"] != expect:
                violations.append(
                    f"{name}: rows {rec['rows']} != oracle {expect}")
            for pname, psql, want in props:
                got = duck(psql.format(out=out_dir))
                rec[pname] = int(got)
                if got != want:
                    violations.append(
                        f"{name}: property {pname} = {got}, want {want}")
            result["recipes"][name] = rec
            print(f"  {name}: {rec['sec']}s rows={rec['rows']} "
                  f"oracle={rec['oracle_rows']} "
                  f"shuffleW={rec['shuffle_write_mb']}MB "
                  f"spillD={rec['spilled_disk_mb']}MB")
        finally:
            shutil.rmtree(out_dir, ignore_errors=True)

    result["violations"] = violations
    result["pass"] = not violations
    if args.out:
        with open(args.out, "w") as f:
            json.dump(result, f, indent=1)
    print(json.dumps({k: result[k] for k in ("pass", "violations")}))
    if violations:
        for v in violations:
            print(f"VIOLATION: {v}", file=sys.stderr)
        return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
