"""Differential fuzz of the py.eval AST micro-interpreter.

The strongest claim the sandbox engine makes is not containment (the
existing 17 tests cover that) but SEMANTICS: inside its whitelist it
must compute exactly what CPython computes. Hypothesis generates
random transform() scripts from a grammar of whitelisted constructs
(arithmetic, string methods, comprehensions, bounded loops, if/else,
slicing, f-strings) and every script runs through BOTH the
interpreter and plain CPython exec — results must be equal, row for
row. Divergence = silently wrong data for every user of
engine='ast'.

A second property: random token soup either fails validate_script
with SandboxViolation or interprets without any non-Conveyor,
non-builtin-Python error class escaping.
"""

from __future__ import annotations

import pytest
from hypothesis import given, settings, strategies as st

from conveyor_spark.transforms.py_ast import (
    Interpreter,
    SandboxViolation,
    StepBudgetExceeded,
    validate_script,
)

ROWS = [
    {"a": 7, "b": 3, "s": "the quick brown fox", "xs": [3, 1, 2]},
    {"a": -2, "b": 0, "s": "", "xs": []},
    {"a": 0, "b": 10**6, "s": "aAbB  cC", "xs": [5]},
]


@st.composite
def int_exprs(draw, depth=0):
    if depth >= 2 or draw(st.booleans()):
        return draw(st.sampled_from(
            ["a", "b", "len(s)", "len(xs)", "3", "0", "-5", "17"]))
    left = draw(int_exprs(depth + 1))
    right = draw(int_exprs(depth + 1))
    op = draw(st.sampled_from(["+", "-", "*", "%", "//", "&", "|", "^"]))
    if op in ("%", "//"):
        return f"({left} {op} (abs({right}) + 1))"  # total: no div-by-0
    return f"({left} {op} {right})"


@st.composite
def str_exprs(draw):
    base = draw(st.sampled_from(["s", "(s + 'x')", "s.upper()", "s.strip()",
                                 "s.replace('a', 'b')", "s[0:3]", "s[::-1]",
                                 "str(a)", "' '.join(s.split())"]))
    if draw(st.booleans()):
        return f"f\"v={{{base}}}|{{a}}\""
    return base


@st.composite
def bool_exprs(draw):
    l_, r_ = draw(int_exprs()), draw(int_exprs())
    op = draw(st.sampled_from(["<", "<=", ">", ">=", "==", "!="]))
    e = f"({l_} {op} {r_})"
    if draw(st.booleans()):
        e = f"(not {e})"
    if draw(st.booleans()):
        e2 = draw(bool_exprs())
        e = f"({e} {draw(st.sampled_from(['and', 'or']))} {e2})"
    return e


@st.composite
def scripts(draw):
    body = ["    acc = 0"]
    for _ in range(draw(st.integers(1, 4))):
        kind = draw(st.sampled_from(["assign", "if", "for", "while", "comp"]))
        if kind == "assign":
            body.append(f"    acc = acc + {draw(int_exprs())}")
        elif kind == "if":
            body.append(f"    if {draw(bool_exprs())}:")
            body.append(f"        acc = acc + {draw(int_exprs())}")
            body.append("    else:")
            body.append(f"        acc = acc - {draw(int_exprs())}")
        elif kind == "for":
            body.append(f"    for i in range(abs({draw(int_exprs())}) % 7):")
            body.append("        acc = acc + i")
        elif kind == "while":
            body.append("    k = 0")
            body.append(f"    while k < (abs({draw(int_exprs())}) % 5):")
            body.append("        k = k + 1")
            body.append("        acc = acc + k")
        elif kind == "comp":
            body.append(
                f"    acc = acc + sum([v * 2 for v in xs if v > "
                f"({draw(int_exprs())} % 4)])")
    ret = draw(st.sampled_from([
        "    return {'acc': acc, 't': TEXT}",
        "    return [acc, TEXT, sorted(xs)]",
        "    return (acc, len(TEXT))",
        "    return acc",
    ])).replace("TEXT", draw(str_exprs()))
    return "\n".join([
        "def transform(row):",
        "    a = row['a']",
        "    b = row['b']",
        "    s = row['s']",
        "    xs = list(row['xs'])",
        *body,
        ret,
    ])


def run_reference(script: str, row: dict):
    ns: dict = {}
    exec(script, ns)  # noqa: S102 — trusted reference in the test
    return ns["transform"](dict(row))


@settings(max_examples=250, deadline=None)
@given(scripts())
def test_interpreter_matches_cpython(script):
    tree = validate_script(script)
    interp = Interpreter(tree)
    for row in ROWS:
        assert interp.run_transform(dict(row)) == run_reference(script, row)


@settings(max_examples=250, deadline=None)
@given(st.lists(st.sampled_from([
    "def transform(row):", "    return row", "x = ", "1 +", "lambda: 0",
    "import os", "().__class__", "row['a']", "for x in", "]:", "@dec",
    "yield 1", "global g", "assert x", "del x[0]", "class C: pass",
    "open('/etc/passwd')", "exec('1')", "f\"{x!r}\"", "x := 1",
]), min_size=1, max_size=6).map("\n".join))
def test_garbage_scripts_fail_cleanly(source):
    """Token soup either fails validation with SandboxViolation or,
    if it happens to parse clean, interprets each row to a value or
    a plain Python/Conveyor error — no interpreter internals leak."""
    ok_errors = (SandboxViolation, StepBudgetExceeded, ArithmeticError,
                 LookupError, TypeError, ValueError, NameError,
                 AttributeError)
    try:
        tree = validate_script(source)
    except SandboxViolation:
        return
    try:
        # construction EXECUTES module-level statements (a bare
        # `row['a']` line is a NameError here, not in run_transform)
        interp = Interpreter(tree)
    except ok_errors:
        return
    for row in ROWS:
        try:
            interp.run_transform(dict(row))
        except ok_errors:
            pass


def test_known_divergence_str_format_refused():
    """str.format is deliberately NOT in the method whitelist (its
    format-spec language does attribute lookups) — the documented
    divergence from CPython must stay a parse/run-time refusal, not
    a silent wrong answer."""
    src = "def transform(row):\n    return '{}'.format(row['a'])\n"
    tree = validate_script(src)  # parses: .format is an Attribute load
    with pytest.raises(SandboxViolation, match="format"):
        Interpreter(tree).run_transform(ROWS[0])
