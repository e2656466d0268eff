"""Handlebars-compatible templating for config/row substitution.

The reference renders http.fetch URLs/bodies and the mongodb plugin's
uri/database/collection/query fields through stock Handlebars 6
(src/modules/transforms/http_fetch.rs:4,22-40; plugins/
conveyor-plugin-mongodb/src/lib.rs:56-95,1147-1206). This module
implements the subset pipelines actually use:

- variables with dotted paths: ``{{ user.id }}``, ``{{ this }}``,
  ``{{ @index }}`` / ``{{ @key }}`` / ``{{ @first }}`` / ``{{ @last }}``
- triple-stash raw output ``{{{ x }}}`` (identical to ``{{ x }}``
  here: we do NOT HTML-escape by default — URLs and Mongo queries are
  not HTML; stock Handlebars escapes ``&<>"'`` which would corrupt
  query strings. Pass ``html_escape=True`` for strict parity.)
- block helpers: ``{{#if x}}..{{else}}..{{/if}}``, ``{{#unless x}}``,
  ``{{#each xs}}`` (list or dict), ``{{#with x}}``
- inline formatting helpers: ``upper``, ``lower``, ``trim``,
  ``json``, ``urlencode``, ``default`` (e.g. ``{{default name "?"}}``)

Truthiness follows Handlebars/JS: false, 0, "", empty list/dict and
null are falsy. Missing paths render as "" (Handlebars' behavior).
Pure Python, no deps — executors can pickle rendered closures freely.
"""

from __future__ import annotations

import html as _html
import json as _json
import re
from typing import Any, Callable
from urllib.parse import quote as _urlquote

from conveyor_spark.errors import ConfigError

# tag bodies exclude braces so mixed raw/normal tags can't swallow
# intervening literal text ('{{{a}} x {{b}}}' is not ONE raw tag)
_TAG_RE = re.compile(r"(\{\{\{[^{}]*\}\}\}|\{\{[^{}]*\}\})")

_HELPERS: dict[str, Callable[..., Any]] = {
    "upper": lambda v, *a: str(v).upper(),
    "lower": lambda v, *a: str(v).lower(),
    "trim": lambda v, *a: str(v).strip(),
    "json": lambda v, *a: _json.dumps(v, default=str),
    "urlencode": lambda v, *a: _urlquote(str(v), safe=""),
    "default": lambda v, *a: v if _truthy(v) else (a[0] if a else ""),
}


def _truthy(v: Any) -> bool:
    if v is None or v is False:
        return False
    if isinstance(v, (int, float)) and not isinstance(v, bool) and v == 0:
        return False
    if isinstance(v, (str, list, dict, tuple)) and len(v) == 0:
        return False
    return True


def _lookup(path: str, scopes: list[Any]) -> Any:
    """Resolve a dotted path against the scope stack (innermost first)."""
    if path.startswith(('"', "'")) and path.endswith(path[0]):
        return path[1:-1]
    # strict numeric literals only — float() would also accept
    # 'nan'/'inf'/'infinity' and shadow context keys of those names
    if re.fullmatch(r"-?\d+", path):
        return int(path)
    if re.fullmatch(r"-?\d+\.\d+", path):
        return float(path)
    if path in ("true", "false"):
        return path == "true"
    parts = path.split(".")
    head = parts[0]
    for scope in reversed(scopes):
        cur = scope
        if head == "this":
            parts_iter = parts[1:]
        elif head.startswith("@"):
            if not (isinstance(scope, dict) and head in scope):
                continue
            cur = scope[head]
            parts_iter = parts[1:]
        elif isinstance(scope, dict) and head in scope:
            cur = scope[head]
            parts_iter = parts[1:]
        elif (
            hasattr(scope, head)
            and not isinstance(scope, (str, int, float))
            and not callable(getattr(scope, head))
        ):
            # attribute fallback is for DATA attributes (Row fields,
            # dataclasses) — a callable match is a method (dict.items,
            # list.copy, ...) leaking through, never template data
            cur = getattr(scope, head)
            parts_iter = parts[1:]
        else:
            continue
        ok = True
        for p in parts_iter:
            if isinstance(cur, dict) and p in cur:
                cur = cur[p]
            elif isinstance(cur, (list, tuple)) and p.lstrip("-").isdigit():
                i = int(p)
                if -len(cur) <= i < len(cur):
                    cur = cur[i]
                else:
                    ok = False
                    break
            else:
                ok = False
                break
        if ok:
            return cur
    return None


_ARG_RE = re.compile(r'"[^"]*"|\'[^\']*\'|\S+')


def _eval_expr(expr: str, scopes: list[Any]) -> Any:
    """`helper arg...` or a bare path."""
    tokens = _ARG_RE.findall(expr.strip())
    if not tokens:
        return None
    if len(tokens) > 1 and tokens[0] in _HELPERS:
        args = [_lookup(t, scopes) for t in tokens[1:]]
        return _HELPERS[tokens[0]](*args)
    return _lookup(tokens[0], scopes)


# ---- AST -------------------------------------------------------------------

class _Text:
    __slots__ = ("s",)

    def __init__(self, s: str):
        self.s = s


class _Var:
    __slots__ = ("expr", "raw")

    def __init__(self, expr: str, raw: bool):
        self.expr = expr
        self.raw = raw


class _Block:
    __slots__ = ("helper", "expr", "body", "alt")

    def __init__(self, helper: str, expr: str):
        self.helper = helper
        self.expr = expr
        self.body: list[Any] = []
        self.alt: list[Any] = []


def _parse(template: str) -> list[Any]:
    root: list[Any] = []
    stack: list[tuple[_Block, bool]] = []  # (block, in_alt)

    def emit(node: Any) -> None:
        if stack:
            blk, in_alt = stack[-1]
            (blk.alt if in_alt else blk.body).append(node)
        else:
            root.append(node)

    # re.split with a capturing group alternates text/tag: only ODD
    # indices are tags — a text piece that merely STARTS with '{{'
    # (an unterminated tag) must stay literal, not be silently
    # sliced apart
    for i, piece in enumerate(_TAG_RE.split(template)):
        if not piece:
            continue
        if i % 2 == 0:
            emit(_Text(piece))
            continue
        raw = piece.startswith("{{{")
        inner = piece[3:-3] if raw else piece[2:-2]
        inner = inner.strip()
        if inner.startswith("#"):
            name, _, expr = inner[1:].partition(" ")
            if name not in ("if", "unless", "each", "with"):
                raise ConfigError(f"template: unknown block helper {name!r}")
            blk = _Block(name, expr.strip())
            emit(blk)
            stack.append((blk, False))
        elif inner == "else":
            if not stack:
                raise ConfigError("template: {{else}} outside a block")
            blk, _ = stack[-1]
            stack[-1] = (blk, True)
        elif inner.startswith("/"):
            name = inner[1:].strip()
            if not stack or stack[-1][0].helper != name:
                raise ConfigError(f"template: unmatched {{{{/{name}}}}}")
            stack.pop()
        elif inner.startswith("!"):
            continue  # comment
        else:
            emit(_Var(inner, raw))
    if stack:
        raise ConfigError(f"template: unclosed {{{{#{stack[-1][0].helper}}}}}")
    return root


def _render_nodes(nodes: list[Any], scopes: list[Any], html_escape: bool) -> str:
    out: list[str] = []
    for node in nodes:
        if isinstance(node, _Text):
            out.append(node.s)
        elif isinstance(node, _Var):
            v = _eval_expr(node.expr, scopes)
            # Handlebars spells booleans lowercase — Python's
            # 'True'/'False' breaks the documented row-query pattern
            # '{"active": {{ active }}}' (json.loads rejects it)
            if v is None:
                s = ""
            elif v is True or v is False:
                s = "true" if v else "false"
            elif isinstance(v, (dict, list)):
                s = _json.dumps(v, default=str)
            else:
                s = str(v)
            if html_escape and not node.raw:
                s = _html.escape(s, quote=True)
            out.append(s)
        else:  # _Block
            v = _eval_expr(node.expr, scopes)
            if node.helper == "if":
                branch = node.body if _truthy(v) else node.alt
                out.append(_render_nodes(branch, scopes, html_escape))
            elif node.helper == "unless":
                branch = node.alt if _truthy(v) else node.body
                out.append(_render_nodes(branch, scopes, html_escape))
            elif node.helper == "with":
                if _truthy(v):
                    out.append(_render_nodes(node.body, scopes + [v], html_escape))
                else:
                    out.append(_render_nodes(node.alt, scopes, html_escape))
            elif node.helper == "each":
                items: list[tuple[Any, Any]]
                if isinstance(v, dict):
                    items = list(v.items())
                elif isinstance(v, (list, tuple)):
                    items = list(enumerate(v))
                else:
                    items = []
                if not items:
                    out.append(_render_nodes(node.alt, scopes, html_escape))
                for i, (key, item) in enumerate(items):
                    frame = {
                        "@index": i, "@key": key,
                        "@first": i == 0, "@last": i == len(items) - 1,
                    }
                    child = scopes + [frame, item]
                    out.append(_render_nodes(node.body, child, html_escape))
    return "".join(out)


def render(template: str, context: Any, html_escape: bool = False) -> str:
    """Render a Handlebars template against a dict-like context."""
    return _render_nodes(_parse(template), [context], html_escape)


def compile_template(template: str, html_escape: bool = False) -> Callable[[Any], str]:
    """Parse once, render many — the per-row hot path (executors call
    the closure per row; parsing stays on the driver)."""
    nodes = _parse(template)
    return lambda context: _render_nodes(nodes, [context], html_escape)
