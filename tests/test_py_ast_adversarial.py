"""Adversarial wall-clock fuzz of the py.eval AST micro-interpreter.

test_py_ast_fuzz.py proves SEMANTICS (interpreter == CPython inside
the whitelist). This file proves the TIME/MEMORY CONTRACT: no script
composed from allowlisted constructs may do work that is not
proportional to its step budget. Round 8 fixed the known C-speed
iterator escapes (sum(range(10**9)), x.extend(...)) by ticking
per-element; the remaining evasion class is PER-TICK AMPLIFICATION —
single allowlisted operations whose C-side cost grows with operand
size (str.replace/split/join on a 10 MB string, big-int multiply at
the 2^20-bit guard ceiling, substring `in`, slicing) — where a loop
of "one-tick" calls pins a core for minutes while staying inside the
budget.

The harness generates >= 10^4 scripts from an expense-seeking
grammar (huge lazy producers into C-speed consumers; doubling
amplifiers: s.replace(a, aa), x*x, s+s, <<; method-shaped consumers;
pad-width abuse) with a SMALL step budget, and asserts every script
terminates — normally or via StepBudgetExceeded/guard — within a
wall-clock bound that generously over-approximates budget-
proportional work. A script that exceeds the bound is a budget
evasion and fails the suite with its source printed.

Fixed-by-this-suite (proportional charging, py_ast.py _charge):
  - str/bytes/list method calls on big receivers charged len>>6
  - seq +/* and big-int binops charged by operand size
  - substring/sequence `in` charged by haystack size
  - slice/f-string results charged by produced size
  - str method RESULTS capped at _MAX_LEN (replace-doubling loops
    previously escaped the memory ceiling: only + and * checked)
"""

from __future__ import annotations

import random
import time

import pytest

from conveyor_spark.transforms.py_ast import (
    Interpreter,
    SandboxViolation,
    StepBudgetExceeded,
    validate_script,
)

# per-script wall-clock ceiling. Budget is 5k steps; honest
# budget-proportional work at interpreter speed is ~5-10 ms, so 2 s
# is ~200x slack — only amplification blows it, not CI jitter.
WALL_SEC = 2.0
BUDGET = 5_000
N_SCRIPTS = 10_000

BIG = ["10**6", "10**9", "10**18", "(1 << 40)", "999999999"]
PRODUCER = [
    "range({B})",
    "range(0, {B}, 3)",
    "zip(range({B}), range({B}))",
    "enumerate(range({B}))",
    "reversed(range({B}))",
    "zip(range({B}), zip(range({B}), range({B})))",
]
CONSUMER = [
    "sum({P})",
    "min({P})",
    "max({P})",
    "any(v == -1 for v in {P})",
    "all(v != -1 for v in {P})",
    "sorted({P})",
    "list({P})",
    "set({P})",
    "tuple({P})",
    "len(list({P}))",
    "[v for v in {P}]",
    "{{v for v in {P}}}",
    "(99, 99) in {P}",
]
# statement templates; `acc`, `s`, `xs`, `d`, `st` are live locals
AMPLIFIER = [
    # string doubling: each call is "one op" — the memory + charge
    # guards must stop the loop before gigabytes materialize
    "s = s.replace('a', 'aa')",
    "s = s + s",
    "s = s * 2",
    "s = ','.join([s, s])",
    "s = s[::-1]",
    "s = s.upper()",
    "s = s.swapcase()",
    "xs = s.split('a')",
    "acc = acc + s.count('a')",
    "acc = acc + len(s.encode())",
    "acc = acc + ('aaa' in s)",
    "acc = acc + (s < s + 'x')",
    # big-int amplifiers: size guards cap at ~2^20 bits, but per-op
    # cost at the cap is ~ms — charging must scale with bit length
    "acc = (acc + 7) * (acc + 13)",
    "acc = acc << 16",
    "acc = acc ** 2",
    "acc = divmod(acc, 7)[0] + acc",
    "acc = abs(acc) % (10**9 + 7)",
    # container churn
    "xs = xs + xs",
    "xs = xs * 2",
    "xs.extend(xs)",
    "st = st.union(xs)",
    "d.update(enumerate(xs))",
    "acc = acc + xs.count(0)",
    "acc = acc + (0 in xs)",
    # found by this fuzz (seed 0xC0FFEE, script 52): range.__contains__
    # is O(1) for ints only — a non-int item fell back to C-speed
    # iteration of 10**18 elements with zero ticks
    "acc = acc + ((99, 99) in range(10**18))",
]
PAD = [
    "s = str(acc).zfill({B} if {B} < 10**6 else 10**6)",
    "s = s.ljust(len(s) + 64, 'x')",
]
# space-amplification shapes (round 10): ACCUMULATE many medium
# values, each individually under _MAX_LEN and under the per-op
# charge, into long-lived containers — the evasion class the RSS
# assertion exists for (a construction site that forgot to charge
# would balloon memory while every op stays "cheap")
SPACE = [
    "xs.append(s * 4)",
    "xs = xs + [s, s]",
    "d[k] = s * 3",
    "st = st.union([str(k) * 200])",
    "xs.append(list(range(min(k + 1, 500))))",
    "d[k] = [acc] * 300",
]


# bound-method aliasing: bind while the receiver is SMALL, grow the
# receiver, then call the alias in a loop — receiver costs captured
# at bind time instead of call time evade charging (the class the
# first review of this suite found by hand; now in the grammar)
ALIAS = [
    ("f = xs.count", "acc = acc + f(0)"),
    ("f = xs.index", "acc = acc + (f(0) if 0 in xs else 0)"),
    ("f = s.count", "acc = acc + f('a')"),
    ("f = st.union", "acc = acc + len(f([1]))"),
    ("f = st.issubset", "acc = acc + f(st)"),
]
GROW = [
    "xs.extend(xs)",
    "xs = xs + xs",
    "s = s + s",
    "st = st.union(range(len(st), 2 * len(st) + 1))",
]


def gen_script(rng: random.Random) -> str:
    body = [
        "    acc = row['a'] + 1000003",
        "    s = row['s']",
        "    xs = list(row['xs'])",
        "    d = {0: 0}",
        "    st = {0}",
    ]
    n_stmt = rng.randint(1, 6)
    for _ in range(n_stmt):
        kind = rng.random()
        if kind < 0.12:
            bind, use = rng.choice(ALIAS)
            grow = rng.choice(GROW)
            body.append(f"    {bind}")
            body.append("    k = 0")
            body.append(f"    while k < {rng.choice([8, 16, 24])}:")
            body.append("        k = k + 1")
            body.append(f"        {grow}")
            body.append("    k = 0")
            body.append(f"    while k < {rng.choice([1024, 16384])}:")
            body.append("        k = k + 1")
            body.append(f"        {use}")
        elif kind < 0.30:
            c = rng.choice(CONSUMER)
            p = rng.choice(PRODUCER).format(B=rng.choice(BIG))
            body.append(f"    acc = acc + len(str({c.format(P=p)}))")
        elif kind < 0.45:
            c = rng.choice(CONSUMER)
            p = rng.choice(PRODUCER).format(B=rng.choice(BIG))
            body.append(f"    for i in {p}:")
            body.append("        acc = acc + i if isinstance(i, int) else acc")
        elif kind < 0.80:
            # amplifier loop: bounded trip count, unbounded operand
            # growth — the canonical per-tick amplification shape
            trips = rng.choice([8, 32, 128, 1024, 16384])
            amp = rng.choice(AMPLIFIER)
            body.append("    k = 0")
            body.append(f"    while k < {trips}:")
            body.append("        k = k + 1")
            body.append(f"        {amp}")
        elif kind < 0.92:
            # space-amplifier loop: accumulate medium values into
            # long-lived containers (RSS assertion's target class)
            trips = rng.choice([128, 1024, 16384])
            sp = rng.choice(SPACE)
            body.append("    k = 0")
            body.append(f"    while k < {trips}:")
            body.append("        k = k + 1")
            body.append(f"        {sp}")
        else:
            body.append("    " + rng.choice(PAD).format(B=rng.choice(BIG)))
    body.append("    return acc")
    return "def transform(row):\n" + "\n".join(body)


ROW = {"a": 7, "s": "the quick brown fox jumps over ", "xs": [3, 1, 2, 0]}

ALLOWED_ERRORS = (
    SandboxViolation, StepBudgetExceeded, ArithmeticError, LookupError,
    TypeError, ValueError, NameError, AttributeError, RecursionError,
)


# RSS ceilings (round 10): the wall-clock bound alone lets a SPACE
# amplification hide — many medium allocations, each under _MAX_LEN
# and each individually cheap, accumulated into live containers. At
# BUDGET=5k the charge math bounds honest total construction to
# ~5000*64 = 320k elements (a few MB), so these bounds are ~30x /
# ~100x slack over the contract, tight against a forgotten charge
# site (which materializes hundreds of MB in one script).
# ru_maxrss is a process HIGH-WATER mark: per-script deltas only
# register growth, so the suite also bounds TOTAL growth across the
# run (catches slow creep no single script trips).
SCRIPT_RSS_MB = 128
TOTAL_RSS_MB = 512


def _rss_mb() -> float:
    import resource
    import sys as _sys

    rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
    # ru_maxrss is KiB on Linux but BYTES on macOS — an unguarded
    # /1024 would inflate darwin readings 1024x and trip every bound
    return rss / (1024.0 * 1024.0 if _sys.platform == "darwin" else 1024.0)


@pytest.mark.slow
def test_no_budget_evasion_across_10k_adversarial_scripts():
    rng = random.Random(0xC0FFEE)
    evasions = []
    space_evasions = []
    rss_start = _rss_mb()
    for i in range(N_SCRIPTS):
        src = gen_script(rng)
        tree = validate_script(src)
        interp = Interpreter(tree, step_budget=BUDGET)
        t0 = time.monotonic()
        rss0 = _rss_mb()
        try:
            interp.run_transform(dict(ROW))
        except ALLOWED_ERRORS:
            pass
        wall = time.monotonic() - t0
        if wall > WALL_SEC:
            evasions.append((wall, src))
            if len(evasions) >= 3:
                break
        drss = _rss_mb() - rss0
        if drss > SCRIPT_RSS_MB:
            space_evasions.append((drss, src))
            if len(space_evasions) >= 3:
                break
    assert not evasions, (
        f"{len(evasions)} budget evasion(s); worst {evasions[0][0]:.1f}s:\n"
        + evasions[0][1]
    )
    assert not space_evasions, (
        f"{len(space_evasions)} space evasion(s); worst "
        f"{space_evasions[0][0]:.0f} MB RSS in one script:\n"
        + space_evasions[0][1]
    )
    total_growth = _rss_mb() - rss_start
    assert total_growth < TOTAL_RSS_MB, (
        f"RSS grew {total_growth:.0f} MB across the fuzz run "
        f"(cap {TOTAL_RSS_MB}) — space amplification creep"
    )


def test_amplifier_smoke_each_template_terminates_fast():
    """One deterministic scriptlet per amplifier template at max trip
    count — the directed version of the fuzz, cheap enough to run in
    the default suite."""
    for amp in AMPLIFIER + [p.format(B="10**6") for p in PAD]:
        src = (
            "def transform(row):\n"
            "    acc = row['a'] + 1000003\n"
            "    s = row['s']\n"
            "    xs = list(row['xs'])\n"
            "    d = {0: 0}\n"
            "    st = {0}\n"
            "    k = 0\n"
            "    while k < 16384:\n"
            "        k = k + 1\n"
            f"        {amp}\n"
            "    return acc\n"
        )
        tree = validate_script(src)
        interp = Interpreter(tree, step_budget=BUDGET)
        t0 = time.monotonic()
        try:
            interp.run_transform(dict(ROW))
        except ALLOWED_ERRORS:
            pass
        wall = time.monotonic() - t0
        assert wall < WALL_SEC, f"amplifier evades budget ({wall:.1f}s): {amp}"


def test_bound_method_alias_charged_at_call_time():
    """review finding: `f = xs.count` captured the receiver's cost at
    BIND time (0 for a tiny list); growing xs afterwards let each
    f(..) call scan millions of elements against the stale cost.
    Receiver cost must be computed per call."""
    src = (
        "def transform(row):\n"
        "    xs = [1]\n"
        "    f = xs.count\n"
        "    k = 0\n"
        "    while k < 22:\n"           # doubles to ~4M elements
        "        k = k + 1\n"
        "        xs.extend(xs)\n"
        "    n = 0\n"
        "    k = 0\n"
        "    while k < 100000:\n"
        "        k = k + 1\n"
        "        n = n + f(1)\n"
        "    return n\n"
    )
    tree = validate_script(src)
    interp = Interpreter(tree, step_budget=1_000_000)
    t0 = time.monotonic()
    with pytest.raises(StepBudgetExceeded):
        interp.run_transform({})
    assert time.monotonic() - t0 < WALL_SEC


def test_alias_set_union_charged_at_call_time():
    """same class through the consuming wrapper: g = st.union bound
    while st is tiny, then st grows."""
    src = (
        "def transform(row):\n"
        "    st = {0}\n"
        "    g = st.union\n"
        "    for i in range(100000):\n"
        "        st.add(i)\n"
        "    n = 0\n"
        "    k = 0\n"
        "    while k < 100000:\n"
        "        k = k + 1\n"
        "        n = n + len(g([1]))\n"
        "    return n\n"
    )
    tree = validate_script(src)
    interp = Interpreter(tree, step_budget=1_000_000)
    t0 = time.monotonic()
    with pytest.raises(StepBudgetExceeded):
        interp.run_transform({})
    assert time.monotonic() - t0 < WALL_SEC


def test_large_input_field_readable():
    """review finding: the construction ceiling fired on row['text']
    merely READ from the input — a >10M-char document must stay
    processable (round-8 behavior), while constructing past the
    ceiling still raises."""
    big = "x" * 10_000_100
    src = (
        "def transform(row):\n"
        "    t = row['text']\n"
        "    return {'n': len(t), 'head': t[0:4]}\n"
    )
    tree = validate_script(src)
    out = Interpreter(tree).run_transform({"text": big})
    assert out == {"n": 10_000_100, "head": "xxxx"}

    # constructing a fresh over-ceiling value still refuses: the
    # full-width slice COPIES
    src2 = "def transform(row):\n    return len(row['text'][::-1])\n"
    with pytest.raises(StepBudgetExceeded):
        Interpreter(validate_script(src2)).run_transform({"text": big})
