"""Embedded micro-interpreter for py.eval's ``engine='ast'`` mode.

The reference runs user scripts in a WASM-sandboxed Boa JS engine
(plugins-wasm/conveyor-plugin-js-wasm/src/lib.rs:61-72): the sandbox
is the *interpreter itself* — the guest language simply has no
construct that reaches the host. This module is the same idea for a
Python-shaped script: instead of ``exec`` (CPython, escapable via the
object graph) or an OS-jailed subprocess (py_sandbox.py, strong but
process-per-partition), the script's AST is *interpreted* by this
walker, and only whitelisted constructs exist:

- no ``import``, no ``exec``/``eval``/``open``/``getattr``;
- attribute access only as whitelisted METHOD calls on str/list/
  dict/set/tuple values — never underscore-prefixed, so the CPython
  object graph (``__class__``/``__globals__``/...) is unreachable by
  construction (``str.format`` is excluded for the same reason:
  its spec mini-language does attribute lookups);
- builtins are a fixed table of pure functions;
- every loop iteration / call burns a step from a per-row budget, so
  runaway scripts terminate deterministically instead of pinning an
  executor core.

Supported surface: functions (incl. helpers + recursion), if/for/
while/break/continue, arithmetic/comparison/boolean ops, f-strings,
list/dict/set/tuple literals, subscripts + slices, list/dict/set
comprehensions, lambda. That covers every row-transform the js.eval
examples in the reference exercise; anything outside raises
``SandboxViolation`` at *parse* time (driver-side, fail fast), not at
row time.
"""

from __future__ import annotations

import ast
import re as _re
from typing import Any

from conveyor_spark.errors import ConfigError


class SandboxViolation(ConfigError):
    """Script uses a construct the micro-interpreter doesn't allow."""


class StepBudgetExceeded(RuntimeError):
    """Per-row step budget exhausted (runaway loop/recursion)."""


_ALLOWED_NODES = (
    ast.Module, ast.FunctionDef, ast.arguments, ast.arg, ast.Return,
    ast.Assign, ast.AugAssign, ast.AnnAssign, ast.Expr, ast.Pass,
    ast.If, ast.For, ast.While, ast.Break, ast.Continue,
    ast.BoolOp, ast.BinOp, ast.UnaryOp, ast.Compare, ast.IfExp,
    ast.Dict, ast.List, ast.Tuple, ast.Set, ast.Subscript, ast.Slice,
    ast.Name, ast.Constant, ast.Call, ast.Attribute, ast.keyword,
    ast.JoinedStr, ast.FormattedValue, ast.Lambda,
    ast.ListComp, ast.SetComp, ast.DictComp, ast.GeneratorExp,
    ast.comprehension, ast.Starred,
    # operator/context tokens
    ast.Load, ast.Store, ast.Del, ast.And, ast.Or, ast.Not,
    ast.Add, ast.Sub, ast.Mult, ast.Div, ast.FloorDiv, ast.Mod,
    ast.Pow, ast.USub, ast.UAdd, ast.Eq, ast.NotEq, ast.Lt, ast.LtE,
    ast.Gt, ast.GtE, ast.In, ast.NotIn, ast.Is, ast.IsNot,
    ast.BitAnd, ast.BitOr, ast.BitXor, ast.LShift, ast.RShift,
    ast.Invert, ast.Delete,
)

_MAX_LEN = 10_000_000  # elements per value — the memory ceiling

# Builtins that are pure AND cannot consume an unbounded iterable at
# C speed. Lazy producers (range/zip/enumerate/reversed) are fine —
# CONSUMPTION is what must burn budget, and every consumer (for
# loops, comprehensions, the wrapped builtins below, starred args,
# `in`) ticks per element.
_BUILTINS: dict[str, Any] = {
    "len": len, "range": range, "abs": abs,
    "round": round, "str": str,
    "int": int, "float": float, "bool": bool,
    "enumerate": enumerate, "zip": zip,
    "reversed": reversed, "divmod": divmod, "ord": ord, "chr": chr,
    "repr": repr, "None": None, "True": True, "False": False,
}

# Builtins that consume their (single) iterable argument at C speed:
# without per-element ticking, sum(range(10**9)) burns ONE step and
# pins the core for minutes, and list(zip(range(10**9), ...)) evades
# any __len__ check because zip has none. Each Interpreter wraps
# these so iteration goes through its own ticked generator.
_CONSUMERS = {
    "sum": sum, "min": min, "max": max, "any": any, "all": all,
    "sorted": sorted, "list": list, "set": set, "tuple": tuple,
    "dict": dict,
}

# value type -> callable method names. NOTHING underscore-prefixed,
# no str.format (its format-spec language does attribute access).
_METHODS: dict[type, frozenset] = {
    str: frozenset({
        "upper", "lower", "strip", "lstrip", "rstrip", "split",
        "rsplit", "join", "replace", "startswith", "endswith", "find",
        "rfind", "index", "count", "title", "capitalize", "casefold",
        "isdigit", "isalpha", "isalnum", "islower", "isupper",
        "isspace", "zfill", "ljust", "rjust", "splitlines",
        "partition", "rpartition", "swapcase", "removeprefix",
        "removesuffix", "encode",
    }),
    bytes: frozenset({"decode", "hex"}),
    list: frozenset({
        "append", "extend", "pop", "insert", "remove", "index",
        "count", "sort", "reverse", "clear", "copy",
    }),
    dict: frozenset({
        "get", "keys", "values", "items", "pop", "update",
        "setdefault", "clear", "copy",
    }),
    set: frozenset({
        "add", "discard", "remove", "union", "intersection",
        "difference", "symmetric_difference", "issubset", "issuperset",
        "copy", "clear", "pop",
    }),
    tuple: frozenset({"index", "count"}),
    int: frozenset({"bit_length"}),
    float: frozenset({"is_integer"}),
}


def validate_script(script: str) -> ast.Module:
    """Driver-side static check: parse + whole-tree whitelist walk.
    Returns the parsed module; raises SandboxViolation on anything
    the interpreter would refuse, so a bad script fails at compile
    time, not on the millionth row."""
    try:
        tree = ast.parse(script, "<py.eval:ast>")
    except SyntaxError as exc:
        raise SandboxViolation(f"py.eval script syntax error: {exc}") from None
    for node in ast.walk(tree):
        if not isinstance(node, _ALLOWED_NODES):
            raise SandboxViolation(
                f"py.eval engine='ast' does not allow "
                f"{type(node).__name__} (line {getattr(node, 'lineno', '?')})"
            )
        if isinstance(node, ast.Attribute):
            if node.attr.startswith("_"):
                raise SandboxViolation(
                    f"underscore attribute {node.attr!r} is not allowed"
                )
            if not isinstance(node.ctx, ast.Load):
                raise SandboxViolation("attribute assignment is not allowed")
        if isinstance(node, ast.Name) and node.id.startswith("__"):
            raise SandboxViolation(f"dunder name {node.id!r} is not allowed")
        if isinstance(node, ast.FunctionDef) and (
            node.decorator_list or node.args.posonlyargs
            or node.args.kwonlyargs or node.args.vararg or node.args.kwarg
        ):
            raise SandboxViolation(
                "decorators and */** parameters are not allowed"
            )
    funcs = [n for n in tree.body if isinstance(n, ast.FunctionDef)]
    if "transform" not in {f.name for f in funcs}:
        raise SandboxViolation("py.eval script must define transform(row)")
    return tree


class _Break(Exception):
    pass


class _Continue(Exception):
    pass


class _Return(Exception):
    def __init__(self, value):
        self.value = value


class _Function:
    __slots__ = ("name", "params", "defaults", "body", "interp")

    def __init__(self, name, params, defaults, body, interp):
        self.name = name
        self.params = params
        self.defaults = defaults
        self.body = body
        self.interp = interp

    def __call__(self, *args):
        n_missing = len(self.params) - len(args)
        if n_missing < 0 or n_missing > len(self.defaults):
            raise TypeError(
                f"{self.name}() takes {len(self.params)} arguments "
                f"({len(args)} given)"
            )
        bound = dict(zip(self.params, args))
        if n_missing:
            for p, v in zip(self.params[-n_missing:], self.defaults[-n_missing:]):
                bound[p] = v
        return self.interp._call_body(self.body, bound)


class Interpreter:
    """One instance per partition; ``run_transform`` per row."""

    def __init__(self, tree: ast.Module, step_budget: int = 1_000_000):
        self.step_budget = step_budget
        self.steps = 0
        self.globals: dict[str, Any] = {}
        self.depth = 0
        self._builtins = dict(_BUILTINS)
        for name, fn in _CONSUMERS.items():
            self._builtins[name] = self._wrap_consumer(name, fn)
        for name in ("str", "repr"):
            # stringifiers CONSTRUCT: str(list-of-10^6-ints) is a
            # ~7 MB fresh string in one call — charge the argument
            # and ceiling+charge the result
            self._builtins[name] = self._wrap_stringifier(
                name, _BUILTINS[name])
        for stmt in tree.body:
            if isinstance(stmt, ast.FunctionDef):
                self.globals[stmt.name] = _Function(
                    stmt.name,
                    [a.arg for a in stmt.args.args],
                    [self._eval(d, self.globals) for d in stmt.args.defaults],
                    stmt.body,
                    self,
                )
            else:
                self._exec(stmt, self.globals)

    # -- plumbing ----------------------------------------------------

    def _tick(self):
        self.steps += 1
        if self.steps > self.step_budget:
            raise StepBudgetExceeded(
                f"py.eval engine='ast': step budget ({self.step_budget}) "
                "exhausted — runaway loop or recursion in the script"
            )

    def _charge(self, n: int):
        """Bulk budget charge for operations whose C-side cost scales
        with operand size. Per-element ticking (round 8) bounded
        ITERATOR consumption; this bounds PER-TICK AMPLIFICATION —
        without it a loop of "one-tick" calls on 10 MB strings
        (s.replace / s.split / big-int multiply at the 2^20-bit
        guard ceiling) pins a core for minutes inside the budget."""
        if n > 0:
            self.steps += n
            if self.steps > self.step_budget:
                raise StepBudgetExceeded(
                    f"py.eval engine='ast': step budget "
                    f"({self.step_budget}) exhausted — operand-size "
                    "charges from large-value operations"
                )

    @staticmethod
    def _cost(v) -> int:
        """Budget cost of touching a value, ~1 step per 64 elements /
        1024 int bits — small enough that honest row-scale data is
        near-free, large enough that _MAX_LEN-scale values cannot be
        churned more than ~budget/156k times."""
        if isinstance(v, (str, bytes, list, tuple, set, frozenset, dict)):
            return len(v) >> 6
        if isinstance(v, int) and not isinstance(v, bool):
            return v.bit_length() >> 10
        return 0

    def _audit_result(self, out):
        """Ceiling + charge for a freshly CONSTRUCTED value: methods
        like str.replace / str.join grow their result without going
        through the +/* guards, so the memory ceiling must apply at
        every CONSTRUCTION site (linear/consuming method wrappers,
        binops, slices, f-strings, str/repr). It must NOT apply to
        values merely read — row['text'] on a large input document
        already exists in memory; see _charge_value."""
        if isinstance(out, (str, bytes, list, tuple, set, frozenset,
                            dict)) and len(out) > _MAX_LEN:
            raise StepBudgetExceeded("produced value too large")
        self._charge(self._cost(out))
        return out

    def _charge_value(self, out):
        """Charge (time-bound) for handling a possibly-large value
        WITHOUT the construction ceiling — for read/return sites
        (subscript element access, generic call results) where the
        value may legitimately be a large input field."""
        self._charge(self._cost(out))
        return out

    def _ticked(self, iterable):
        """Re-expose an iterable with one budget tick per element, so
        C-speed consumers (sum/list/sorted/`in`/starred args) burn
        steps exactly like an interpreted for-loop would."""
        count = 0
        for item in iterable:
            self._tick()
            count += 1
            if count > _MAX_LEN:
                raise StepBudgetExceeded(
                    f"iteration over more than {_MAX_LEN} elements"
                )
            yield item

    def _wrap_stringifier(self, name: str, fn):
        def wrapped(*args, **kwargs):
            for a in args:
                self._charge(self._cost(a))
            return self._audit_result(fn(*args, **kwargs))

        wrapped.__name__ = name
        return wrapped

    def _wrap_consumer(self, name: str, fn):
        """Route an iterator-consuming builtin's single-iterable form
        through _ticked. Multi-scalar min/max and dict(mapping) pass
        through untouched (nothing unbounded to consume)."""
        def wrapped(*args, **kwargs):
            if name == "dict":
                if len(args) == 1 and not isinstance(args[0], dict):
                    return fn(self._ticked(args[0]), **kwargs)
                return fn(*args, **kwargs)
            if name in ("min", "max") and len(args) != 1:
                return fn(*args, **kwargs)
            if args:
                return fn(self._ticked(args[0]), *args[1:], **kwargs)
            return fn(**kwargs)

        wrapped.__name__ = name
        return wrapped

    def _contains(self, item, container):
        if hasattr(container, "__next__"):
            # a lazy iterator (zip/enumerate/reversed): membership
            # consumes it at C speed — tick per element instead
            for candidate in self._ticked(container):
                if item is candidate or item == candidate:
                    return True
            return False
        # substring / list membership scans the container at C speed
        # (dict/set/frozenset probe in O(1) — exempt)
        if isinstance(container, (str, bytes, list, tuple)):
            self._charge(self._cost(container))
        if isinstance(container, range) and not isinstance(item, int):
            # range.__contains__ is O(1) for ints only; any other
            # item type falls back to C-speed ITERATION — found by
            # the adversarial fuzz: (99, 99) in range(10**18) pinned
            # a core forever. Tick per element like any consumer.
            for candidate in self._ticked(container):
                if item is candidate or item == candidate:
                    return True
            return False
        return item in container

    def run_transform(self, row: dict) -> Any:
        self.steps = 0  # budget is per row
        return self.globals["transform"](row)

    def _call_body(self, body, local_vars: dict) -> Any:
        self._tick()
        self.depth += 1
        if self.depth > 64:
            self.depth -= 1
            raise StepBudgetExceeded("py.eval engine='ast': recursion deeper than 64")
        try:
            for stmt in body:
                self._exec(stmt, local_vars)
        except _Return as r:
            return r.value
        finally:
            self.depth -= 1
        return None

    # -- statements --------------------------------------------------

    def _exec(self, node, env) -> None:
        self._tick()
        if isinstance(node, ast.Expr):
            self._eval(node.value, env)
        elif isinstance(node, ast.Assign):
            value = self._eval(node.value, env)
            for target in node.targets:
                self._assign(target, value, env)
        elif isinstance(node, ast.AugAssign):
            current = self._eval_target(node.target, env)
            value = self._binop(node.op, current, self._eval(node.value, env))
            self._assign(node.target, value, env)
        elif isinstance(node, ast.AnnAssign):
            if node.value is not None:
                self._assign(node.target, self._eval(node.value, env), env)
        elif isinstance(node, ast.Return):
            raise _Return(self._eval(node.value, env) if node.value else None)
        elif isinstance(node, ast.If):
            branch = node.body if self._eval(node.test, env) else node.orelse
            for stmt in branch:
                self._exec(stmt, env)
        elif isinstance(node, ast.While):
            while self._eval(node.test, env):
                self._tick()
                try:
                    for stmt in node.body:
                        self._exec(stmt, env)
                except _Break:
                    break
                except _Continue:
                    continue
            else:
                for stmt in node.orelse:
                    self._exec(stmt, env)
        elif isinstance(node, ast.For):
            broke = False
            for item in self._eval(node.iter, env):
                self._tick()
                self._assign(node.target, item, env)
                try:
                    for stmt in node.body:
                        self._exec(stmt, env)
                except _Break:
                    broke = True
                    break
                except _Continue:
                    continue
            if not broke:
                for stmt in node.orelse:
                    self._exec(stmt, env)
        elif isinstance(node, ast.Break):
            raise _Break()
        elif isinstance(node, ast.Continue):
            raise _Continue()
        elif isinstance(node, ast.Pass):
            pass
        elif isinstance(node, ast.Delete):
            for target in node.targets:
                if isinstance(target, ast.Subscript):
                    obj = self._eval(target.value, env)
                    del obj[self._eval(target.slice, env)]
                elif isinstance(target, ast.Name):
                    del env[target.id]
                else:
                    raise SandboxViolation("unsupported del target")
        elif isinstance(node, ast.FunctionDef):
            env[node.name] = _Function(
                node.name, [a.arg for a in node.args.args],
                [self._eval(d, env) for d in node.args.defaults],
                node.body, self,
            )
        else:  # pragma: no cover — validate_script screens these out
            raise SandboxViolation(f"unsupported statement {type(node).__name__}")

    def _assign(self, target, value, env) -> None:
        if isinstance(target, ast.Name):
            env[target.id] = value
        elif isinstance(target, ast.Subscript):
            obj = self._eval(target.value, env)
            obj[self._eval(target.slice, env)] = value
        elif isinstance(target, (ast.Tuple, ast.List)):
            # islice: `a, b = range(10**12)` must fail on count, not
            # materialize the whole iterable first
            import itertools

            items = list(itertools.islice(iter(value), len(target.elts) + 1))
            if len(items) != len(target.elts):
                raise ValueError("unpacking length mismatch")
            for t, v in zip(target.elts, items):
                self._assign(t, v, env)
        else:
            raise SandboxViolation(
                f"unsupported assignment target {type(target).__name__}"
            )

    def _eval_target(self, target, env):
        if isinstance(target, ast.Name):
            return self._lookup(target.id, env)
        if isinstance(target, ast.Subscript):
            return self._eval(target.value, env)[self._eval(target.slice, env)]
        raise SandboxViolation("unsupported augmented-assignment target")

    # -- expressions -------------------------------------------------

    def _lookup(self, name: str, env):
        if name in env:
            return env[name]
        if name in self.globals:
            return self.globals[name]
        if name in self._builtins:
            return self._builtins[name]
        raise NameError(f"name {name!r} is not defined")

    # The step budget bounds TIME; these bound MEMORY: without them a
    # script inside the budget can still build multi-GB values in a
    # handful of ops (s = s + s doubles per iteration; [0] * 10**9 is
    # one op; x = x * x squares an int's digit count per step).
    _MAX_LEN = _MAX_LEN

    def _binop(self, op, left, right):
        import operator as _op

        table = {
            ast.Add: _op.add, ast.Sub: _op.sub, ast.Mult: _op.mul,
            ast.Div: _op.truediv, ast.FloorDiv: _op.floordiv,
            ast.Mod: _op.mod, ast.Pow: _op.pow, ast.BitAnd: _op.and_,
            ast.BitOr: _op.or_, ast.BitXor: _op.xor,
            ast.LShift: _op.lshift, ast.RShift: _op.rshift,
        }
        fn = table.get(type(op))
        if fn is None:
            raise SandboxViolation(f"unsupported operator {type(op).__name__}")
        if isinstance(op, ast.Pow) and isinstance(left, int) \
                and isinstance(right, int):
            # bound the RESULT's size, not just the exponent: chained
            # ** ((x**4096)**4096) keeps each exponent small while the
            # base's bit length explodes — same product guard as Mult
            if abs(right) > 4096 or (
                right > 1 and left.bit_length() * right > 1 << 20
            ):
                raise StepBudgetExceeded("integer power result too large")
        if isinstance(op, ast.LShift) and isinstance(right, int) \
                and right > 65536:
            raise StepBudgetExceeded("shift amount too large")
        seqs = (str, bytes, list, tuple)
        if isinstance(op, ast.Add) and isinstance(left, seqs) \
                and len(left) + len(right) > self._MAX_LEN:
            raise StepBudgetExceeded("concatenation result too large")
        if isinstance(op, ast.Mult):
            for seq, n in ((left, right), (right, left)):
                if isinstance(seq, seqs) and isinstance(n, int) \
                        and len(seq) * max(n, 0) > self._MAX_LEN:
                    raise StepBudgetExceeded("repetition result too large")
            # x = x * x squares the digit count every step: cap the
            # product's bit length (floats/bools are int-subclass-free)
            if isinstance(left, int) and isinstance(right, int) \
                    and left.bit_length() + right.bit_length() > 1 << 20:
                raise StepBudgetExceeded("integer product too large")
        # size guards above cap single-op RESULTS; this charges the
        # C-side WORK — a loop of 2^20-bit multiplies or 10 MB
        # concatenations is each "one tick" without it
        self._charge(self._cost(left) + self._cost(right))
        return self._audit_result(fn(left, right))

    def _eval(self, node, env):
        self._tick()
        if isinstance(node, ast.Constant):
            return node.value
        if isinstance(node, ast.Name):
            return self._lookup(node.id, env)
        if isinstance(node, ast.BinOp):
            return self._binop(
                node.op, self._eval(node.left, env), self._eval(node.right, env)
            )
        if isinstance(node, ast.UnaryOp):
            v = self._eval(node.operand, env)
            if isinstance(node.op, ast.USub):
                return -v
            if isinstance(node.op, ast.UAdd):
                return +v
            if isinstance(node.op, ast.Not):
                return not v
            return ~v
        if isinstance(node, ast.BoolOp):
            if isinstance(node.op, ast.And):
                result = True
                for v in node.values:
                    result = self._eval(v, env)
                    if not result:
                        return result
                return result
            for v in node.values:
                result = self._eval(v, env)
                if result:
                    return result
            return result
        if isinstance(node, ast.Compare):
            import operator as _op

            table = {
                ast.Eq: _op.eq, ast.NotEq: _op.ne, ast.Lt: _op.lt,
                ast.LtE: _op.le, ast.Gt: _op.gt, ast.GtE: _op.ge,
                ast.Is: _op.is_, ast.IsNot: _op.is_not,
                ast.In: self._contains,
                ast.NotIn: lambda a, b: not self._contains(a, b),
            }
            left = self._eval(node.left, env)
            for op, rhs in zip(node.ops, node.comparators):
                right = self._eval(rhs, env)
                # big-value comparisons are O(min size) C work per op
                self._charge(min(self._cost(left), self._cost(right)))
                if not table[type(op)](left, right):
                    return False
                left = right
            return True
        if isinstance(node, ast.IfExp):
            return (
                self._eval(node.body, env)
                if self._eval(node.test, env)
                else self._eval(node.orelse, env)
            )
        if isinstance(node, ast.List):
            return [self._eval(e, env) for e in node.elts]
        if isinstance(node, ast.Tuple):
            return tuple(self._eval(e, env) for e in node.elts)
        if isinstance(node, ast.Set):
            return {self._eval(e, env) for e in node.elts}
        if isinstance(node, ast.Dict):
            return {
                self._eval(k, env): self._eval(v, env)
                for k, v in zip(node.keys, node.values)
            }
        if isinstance(node, ast.Subscript):
            # slices COPY (s[::-1] on a 10 MB string is O(N) C work
            # and a fresh value -> full audit incl. ceiling); element
            # access READS an existing value — charge only, no
            # ceiling (review finding: the ceiling on row['text']
            # killed jobs whose input documents exceed _MAX_LEN)
            got = self._eval(node.value, env)[self._eval(node.slice, env)]
            if isinstance(node.slice, ast.Slice):
                return self._audit_result(got)
            return self._charge_value(got)
        if isinstance(node, ast.Slice):
            return slice(
                self._eval(node.lower, env) if node.lower else None,
                self._eval(node.upper, env) if node.upper else None,
                self._eval(node.step, env) if node.step else None,
            )
        if isinstance(node, ast.Attribute):
            return self._method(node, env)
        if isinstance(node, ast.Call):
            fn = self._eval(node.func, env)
            args = []
            for a in node.args:
                if isinstance(a, ast.Starred):
                    args.extend(self._ticked(self._eval(a.value, env)))
                else:
                    args.append(self._eval(a, env))
            kwargs = {
                kw.arg: self._eval(kw.value, env)
                for kw in node.keywords if kw.arg is not None
            }
            # charge-only: method CONSTRUCTION ceilings live in the
            # linear/consuming wrappers; a generic call result may be
            # an existing large value (dict.get on an input field)
            return self._charge_value(fn(*args, **kwargs))
        if isinstance(node, ast.JoinedStr):
            parts = []
            for v in node.values:
                if isinstance(v, ast.Constant):
                    parts.append(str(v.value))
                else:  # FormattedValue — evaluated by US, no format() escape
                    val = self._eval(v.value, env)
                    if v.format_spec is not None:
                        spec = self._eval(v.format_spec, env)
                        # a width like {x:>999999999} allocates the
                        # padding in one call — same bomb as zfill
                        if any(int(d) > _MAX_LEN
                               for d in _re.findall(r"\d+", str(spec))):
                            raise StepBudgetExceeded("format width too large")
                        parts.append(format(val, spec))
                    else:
                        parts.append(str(val))
            return self._audit_result("".join(parts))
        if isinstance(node, ast.Lambda):
            return _Function(
                "<lambda>", [a.arg for a in node.args.args],
                [self._eval(d, env) for d in node.args.defaults],
                [ast.Return(value=node.body)], self,
            )
        if isinstance(node, (ast.ListComp, ast.SetComp, ast.GeneratorExp)):
            out = []
            self._comp(node.generators, 0, env, lambda e: out.append(self._eval(node.elt, e)))
            if isinstance(node, ast.SetComp):
                return set(out)
            return out  # generators materialize: budget stays enforceable
        if isinstance(node, ast.DictComp):
            out = {}

            def emit(e):
                out[self._eval(node.key, e)] = self._eval(node.value, e)

            self._comp(node.generators, 0, env, emit)
            return out
        raise SandboxViolation(f"unsupported expression {type(node).__name__}")

    def _comp(self, gens, i, env, emit):
        if i == len(gens):
            emit(env)
            return
        gen = gens[i]
        for item in self._eval(gen.iter, env):
            self._tick()
            scoped = dict(env)
            self._assign(gen.target, item, scoped)
            if all(self._eval(c, scoped) for c in gen.ifs):
                self._comp(gens, i + 1, scoped, emit)

    # methods that consume arbitrary iterable ARGUMENTS at C speed —
    # the method-shaped siblings of _CONSUMERS: x.extend(range(1e12))
    # or set().union(zip(...)) burn zero ticks without this routing
    _TICKED_METHODS = {
        (list, "extend"),
        (set, "union"), (set, "intersection"), (set, "difference"),
        (set, "symmetric_difference"),
        (set, "issubset"), (set, "issuperset"),
        (dict, "update"),
    }
    # already-materialized containers were built under the budget —
    # re-ticking them is wasted work, and ticked(dict) would iterate
    # keys and corrupt dict.update(mapping) semantics
    _SIZED = (str, bytes, list, tuple, set, frozenset, dict)

    # methods whose C-side cost scans the RECEIVER — every str/bytes
    # method scans (replace/split/upper/count/...), plus the O(n)
    # container methods. O(1) methods (append/pop/get/add/...) are
    # exempt so budget-bounded container building stays linear.
    _LINEAR_METHODS = frozenset(
        [(str, m) for m in _METHODS[str]]
        + [(bytes, m) for m in _METHODS[bytes]]
        + [(list, m) for m in ("index", "count", "remove", "sort",
                               "reverse", "copy", "clear")]
        + [(dict, m) for m in ("copy", "clear")]
        + [(set, m) for m in ("copy", "clear")]
        + [(tuple, m) for m in ("index", "count")]
    )

    def _method(self, node: ast.Attribute, env):
        obj = self._eval(node.value, env)
        for base, names in _METHODS.items():
            if isinstance(obj, base):
                if node.attr not in names:
                    raise SandboxViolation(
                        f"method {type(obj).__name__}.{node.attr} is not allowed"
                    )
                # NB: wrappers capture `bound` by CLOSURE, never as a
                # default parameter — a default (`_b=bound`) is
                # hijackable from the script via a keyword argument
                # (`d.update(_b=evil)` would replace the method)
                bound = getattr(obj, node.attr)
                if (base, node.attr) in self._LINEAR_METHODS:
                    # receiver-scanning methods (every str method,
                    # list.sort/count/..., set algebra): charge the
                    # receiver's size per CALL — computed INSIDE the
                    # wrapper, at call time, never captured at bind
                    # time (review finding: `f = xs.count` while xs is
                    # tiny, grow xs, loop f(..) scanned millions of
                    # elements against a stale cost of 0). Results
                    # these methods CONSTRUCT also get the memory
                    # ceiling here (str.replace growth), which must
                    # NOT apply to values merely read from the row.
                    def linear(*args, **kwargs):
                        self._charge(self._cost(obj))
                        # kwarg VALUES charge like positionals —
                        # s.split(sep=big) must cost what
                        # s.split(big) costs (ADVICE r9)
                        for a in (*args, *kwargs.values()):
                            self._charge(self._cost(a))
                        return self._audit_result(bound(*args, **kwargs))

                    if node.attr in ("zfill", "ljust", "rjust"):
                        inner_linear = linear

                        def padded(width, *rest):
                            # width-pad methods materialize their arg
                            if isinstance(width, int) and width > _MAX_LEN:
                                raise StepBudgetExceeded(
                                    "pad width too large")
                            return inner_linear(width, *rest)

                        return padded
                    return linear
                if (base, node.attr) in self._TICKED_METHODS:
                    def consuming(*args, **kwargs):
                        # set algebra / extend / update copy the
                        # receiver and any SIZED args at C speed —
                        # charge them (receiver cost at CALL time,
                        # not bind time); lazy args tick per element.
                        # SIZED kwarg values charge too (ADVICE r9:
                        # dict.update(k=big) stores a reference, but
                        # charging is uniform and closes the class);
                        # they are NOT iterated by update, so no tick.
                        self._charge(self._cost(obj))
                        wrapped_args = []
                        for a in args:
                            if isinstance(a, self._SIZED):
                                self._charge(self._cost(a))
                                wrapped_args.append(a)
                            else:
                                wrapped_args.append(self._ticked(a))
                        for v in kwargs.values():
                            if isinstance(v, self._SIZED):
                                self._charge(self._cost(v))
                        return self._audit_result(
                            bound(*wrapped_args, **kwargs))

                    return consuming
                return bound
        raise SandboxViolation(
            f"attribute access on {type(obj).__name__} is not allowed"
        )


def referenced_columns(tree: ast.Module) -> set[str] | None:
    """Static column-pruning analysis for engine='ast' — the
    scripted-UDF analogue of Catalyst's column pruning, which cannot
    see through a mapInPandas barrier. Returns the set of row keys
    ``transform`` can possibly READ, or None when the access pattern
    is dynamic (so the caller must keep every column).

    The row parameter may appear ONLY as: ``row['const']`` (load or
    store), ``row.get('const', ...)``, or a direct ``return row``
    (safe because the caller always keeps the output-schema columns,
    and anything else in the returned dict is dropped by the
    result.get(output_column) projection anyway). Any other use —
    aliasing, iteration, ``in``, passing ``row`` to a helper,
    dynamic keys — returns None."""
    fn = next(
        (n for n in tree.body
         if isinstance(n, ast.FunctionDef) and n.name == "transform"),
        None,
    )
    if fn is None or not fn.args.args:
        return None
    param = fn.args.args[0].arg
    parents: dict[ast.AST, ast.AST] = {}
    for node in ast.walk(fn):
        for child in ast.iter_child_nodes(node):
            parents[child] = node
    cols: set[str] = set()
    for node in ast.walk(fn):
        if not (isinstance(node, ast.Name) and node.id == param):
            continue
        par = parents.get(node)
        if isinstance(par, ast.Subscript) and par.value is node:
            key = par.slice
            if isinstance(key, ast.Constant) and isinstance(key.value, str):
                cols.add(key.value)
                continue
            return None  # dynamic or non-string key
        if isinstance(par, ast.Attribute) and par.value is node \
                and par.attr == "get":
            call = parents.get(par)
            if (
                isinstance(call, ast.Call) and call.func is par
                and call.args
                and isinstance(call.args[0], ast.Constant)
                and isinstance(call.args[0].value, str)
            ):
                cols.add(call.args[0].value)
                continue
            return None
        if isinstance(par, ast.Return):
            continue  # `return row` — output projection bounds it
        return None  # aliasing / iteration / helper call / `in` / del
    return cols


def make_transform(script: str, step_budget: int = 1_000_000):
    """Compile + return a ``transform(row)`` callable backed by the
    micro-interpreter. One Interpreter per call site (partition)."""
    tree = validate_script(script)
    interp = Interpreter(tree, step_budget=step_budget)
    return interp.run_transform
