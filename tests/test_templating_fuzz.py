"""Hypothesis fuzz of the Handlebars-subset templating engine.

Contract: for ANY template string and ANY JSON-shaped context,
``render`` either returns a str or raises ConfigError (malformed
blocks) — never IndexError/KeyError/RecursionError. Rendered
http.fetch URLs and mongodb queries are built from row data the
engine does not control, so the parser must be total over garbage.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from conveyor_spark.errors import ConfigError
from conveyor_spark.templating import compile_template, render

json_scalar = st.one_of(
    st.none(), st.booleans(),
    st.integers(min_value=-(10**9), max_value=10**9),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.text(max_size=10),
)
json_value = st.recursive(
    json_scalar,
    lambda c: st.one_of(
        st.lists(c, max_size=3),
        st.dictionaries(
            st.text(alphabet="abcxyz_", min_size=1, max_size=6), c, max_size=3
        ),
    ),
    max_leaves=8,
)

# template fragments biased toward the engine's syntax space
fragment = st.one_of(
    st.text(max_size=8),
    st.sampled_from([
        "{{", "}}", "{{{", "}}}", "{{ x }}", "{{x.y}}", "{{ this }}",
        "{{@index}}", "{{#if x}}", "{{#each xs}}", "{{#with x}}",
        "{{#unless x}}", "{{/if}}", "{{/each}}", "{{/with}}",
        "{{/unless}}", "{{else}}", "{{! note }}", "{{upper x}}",
        "{{default x \"?\"}}", "{{json x}}", "{{urlencode x}}",
        "{{#bogus x}}", "{{/bogus}}", "{{ x ", " x }}", "{{}}",
    ]),
)
templates = st.lists(fragment, max_size=12).map("".join)


@settings(max_examples=400, deadline=None)
@given(templates, json_value)
def test_render_total(template, context):
    try:
        out = render(template, context)
    except ConfigError:
        return
    assert isinstance(out, str)


@settings(max_examples=150, deadline=None)
@given(st.text(max_size=40).filter(lambda s: "{" not in s and "}" not in s),
       json_value)
def test_braceless_text_is_identity(text, context):
    assert render(text, context) == text


@settings(max_examples=150, deadline=None)
@given(json_value)
def test_simple_var_renders_value(context):
    out = render("{{ x }}", {"x": context})
    assert isinstance(out, str)
    if context is None:
        assert out == ""
    elif context is True:
        assert out == "true"  # Handlebars lowercase booleans


@settings(max_examples=100, deadline=None)
@given(templates)
def test_compile_parse_matches_render(template):
    """compile_template and render agree: both reject the same
    templates, and a compiled template renders like render()."""
    ctx = {"x": 1, "xs": [1, 2]}
    try:
        fn = compile_template(template)
    except ConfigError:
        with pytest.raises(ConfigError):
            render(template, ctx)
        return
    try:
        direct = render(template, ctx)
    except ConfigError:
        # render may still fail at RENDER time only if compile defers
        # nothing — parse errors must have been raised by compile
        pytest.fail("render raised ConfigError after compile succeeded")
    assert fn(ctx) == direct
