"""Handlebars templating: variable paths, block helpers, formatting
helpers, and the http.fetch / mongodb integration points.

Scenario parity with the reference's template tests
(tests/http_fetch_test.rs:9-201: per-row URL templates like
'https://.../users/{{ id }}/posts') plus the Handlebars features the
reference gets from the stock crate (#if/#each/#unless/#with)."""

from __future__ import annotations

import pytest

from conveyor_spark.errors import ConfigError
from conveyor_spark.templating import compile_template, render
from tests.conftest import run_op


def test_variable_paths():
    ctx = {"id": 7, "user": {"name": "Alice", "tags": ["a", "b"]}}
    assert render("users/{{ id }}/posts", ctx) == "users/7/posts"
    assert render("{{ user.name }}", ctx) == "Alice"
    assert render("{{ user.tags.1 }}", ctx) == "b"
    assert render("{{ missing.path }}", ctx) == ""  # Handlebars: empty


def test_if_else_unless():
    t = "{{#if premium}}gold{{else}}basic{{/if}}"
    assert render(t, {"premium": True}) == "gold"
    assert render(t, {"premium": False}) == "basic"
    assert render(t, {}) == "basic"
    # JS truthiness: 0 and "" are falsy
    assert render(t, {"premium": 0}) == "basic"
    assert render("{{#unless err}}ok{{/unless}}", {"err": ""}) == "ok"


def test_each_blocks():
    ctx = {"items": ["x", "y", "z"]}
    assert render("{{#each items}}{{@index}}:{{this}};{{/each}}", ctx) == "0:x;1:y;2:z;"
    assert render("{{#each items}}{{this}}{{#unless @last}},{{/unless}}{{/each}}", ctx) == "x,y,z"
    assert render("{{#each m}}{{@key}}={{this}};{{/each}}", {"m": {"a": 1}}) == "a=1;"
    assert render("{{#each none}}x{{else}}empty{{/each}}", {}) == "empty"


def test_with_and_formatting_helpers():
    assert render("{{#with user}}{{name}}{{/with}}", {"user": {"name": "Bo"}}) == "Bo"
    assert render("{{upper name}}", {"name": "ab"}) == "AB"
    assert render("{{urlencode q}}", {"q": "a b&c"}) == "a%20b%26c"
    assert render('{{default nick "anon"}}', {}) == "anon"
    assert render("{{json user}}", {"user": {"a": 1}}) == '{"a": 1}'


def test_html_escape_parity_opt_in():
    # stock Handlebars escapes {{ }} and not {{{ }}}; our default is
    # no-escape (URLs/queries are not HTML), strict parity is opt-in
    ctx = {"v": "a&b"}
    assert render("{{ v }}", ctx) == "a&b"
    assert render("{{ v }}", ctx, html_escape=True) == "a&amp;b"
    assert render("{{{ v }}}", ctx, html_escape=True) == "a&b"


def test_parse_errors():
    with pytest.raises(ConfigError, match="unclosed"):
        render("{{#if x}}no end", {})
    with pytest.raises(ConfigError, match="unmatched"):
        render("{{/if}}", {})
    with pytest.raises(ConfigError, match="unknown block"):
        render("{{#frob x}}{{/frob}}", {})


def test_http_fetch_handlebars_url_and_body(ctx, spark):
    df = spark.createDataFrame(
        [(1, "Alice", True), (2, "Bob", False)], "id INT, name STRING, vip BOOLEAN"
    )
    calls = []

    def echo(url, method, headers, body):
        return f"{url}|{body}|{headers.get('X-Tier', '')}"

    out = run_op(
        ctx, "http.fetch", [df],
        url="https://api/users/{{ id }}/posts",
        method="POST",
        body='{"name": "{{upper name}}"{{#if vip}}, "tier": "vip"{{/if}}}',
        headers={"X-Tier": "{{#if vip}}gold{{else}}basic{{/if}}"},
        _fetcher=echo,
    )
    got = {r["id"]: r["http_result"] for r in out.collect()}
    assert got[1] == 'https://api/users/1/posts|{"name": "ALICE", "tier": "vip"}|gold'
    assert got[2] == 'https://api/users/2/posts|{"name": "BOB"}|basic'


def _recording_factory(sink_dir: str):
    """Executor-shipped fake client: records each CRUD call as a JSON
    file (closure-defined so cloudpickle serializes by value)."""

    def factory():
        import json as _j
        import os
        import uuid

        def record(kind, payload):
            p = os.path.join(sink_dir, f"{uuid.uuid4().hex}.json")
            with open(p, "w") as f:
                _j.dump({"kind": kind, "payload": payload}, f)

        class Coll:
            def insert_many(self, docs):
                record("insert_many", docs)

            def update_one(self, q, u, upsert=False):
                record("update_one", q)

        class Client:
            def __getitem__(self, db):
                return {"c": Coll()}

        return Client()

    return factory


def _recorded(sink_dir: str):
    import glob
    import json as _j

    return [_j.load(open(p)) for p in glob.glob(f"{sink_dir}/*.json")]


def test_mongodb_row_templated_query(ctx, spark, tmp_path):
    df = spark.createDataFrame([(1, "a"), (2, "b")], "user_id INT, v STRING").coalesce(1)
    run_op(
        ctx, "mongodb.updateOne", [df],
        uri="mongodb://x", database="db", collection="c",
        query='{"user_id": {{ user_id }}}',
        _client_factory=_recording_factory(str(tmp_path)),
    )
    filters = sorted(
        c["payload"]["user_id"] for c in _recorded(str(tmp_path)) if c["kind"] == "update_one"
    )
    assert filters == [1, 2]


def test_mongodb_variable_templated_connection(spark, tmp_path):
    from conveyor_spark.registry import OpContext, get_function

    vctx = OpContext(spark=spark, variables={"env": "prod"})
    df = spark.createDataFrame([(1,)], "x INT").coalesce(1)
    get_function("mongodb.insertMany").fn(
        vctx, [df],
        {"uri": "mongodb://h/{{ env }}", "database": "db", "collection": "c",
         "_client_factory": _recording_factory(str(tmp_path))},
    )
    calls = _recorded(str(tmp_path))
    assert calls and calls[0]["kind"] == "insert_many"


def test_boolean_renders_lowercase_json_compatible():
    # Handlebars spells booleans 'true'/'false'; the documented
    # mongodb row-query pattern feeds the render into json.loads
    import json

    s = render('{"active": {{ active }}, "n": {{ n }}}',
               {"active": True, "n": 3})
    assert json.loads(s) == {"active": True, "n": 3}
    assert render("{{ off }}", {"off": False}) == "false"


def test_missing_name_never_leaks_container_methods():
    # 'items'/'keys'/... collide with dict attributes — a missing
    # context name must render '', not a bound-method repr
    assert render("{{ items }}", {"a": 1}) == ""
    assert render("{{ keys }}-{{ update }}", {"a": 1}) == "-"
    # but a real data attribute still resolves (Row-style objects)
    class Obj:
        user_id = 42
    assert render("{{ user_id }}", Obj()) == "42"


def test_nan_inf_are_context_keys_not_literals():
    assert render("{{ nan }}", {"nan": "hello"}) == "hello"
    assert render("{{ inf }}", {"inf": 5}) == "5"


def test_unterminated_tag_stays_literal():
    assert render("{{a}}{{b", {"a": 1, "b": 2}) == "1{{b"
    assert render("x }} y", {}) == "x }} y"


def test_mixed_raw_and_normal_tags_keep_literal_text():
    out = render("{{{a}}} text {{b}}", {"a": "<x>", "b": 2})
    assert out == "<x> text 2"
