"""``update`` CLI verb — pip-based self-update.

Reference: src/update.rs — `conveyor update` queries the project's
GitHub releases for the newest tag, compares it against the built-in
version, and replaces the installed binary; `check_for_updates` is
the same query in dry mode. A pip-distributed package updates through
the package index instead: we query the index's JSON API for the
latest published version and hand installation to ``pip install
--upgrade``, which resolves wheels/sdists exactly like any other
install (no hand-rolled binary swaps).

Both the index fetch and the pip invocation are injectable so the
verb is testable without network or a real index.
"""

from __future__ import annotations

import json
import re
import subprocess
import sys
import urllib.request
from typing import Callable

from conveyor_spark import __version__
from conveyor_spark.errors import ConveyorError

PACKAGE = "conveyor-spark"
DEFAULT_INDEX = "https://pypi.org/pypi"


_VER_RE = re.compile(
    r"^(?P<release>\d+(?:\.\d+)*)"
    r"(?:[._-]?(?P<pre_l>a|b|c|rc|alpha|beta|pre|preview)[._-]?(?P<pre_n>\d+)?)?"
    r"(?:[._-]?(?P<post_l>post|rev|r)[._-]?(?P<post_n>\d+)?)?"
    r"(?:[._-]?(?P<dev_l>dev)[._-]?(?P<dev_n>\d+)?)?"
    r"(?:\+[a-z0-9.]+)?$"  # local segment (setuptools-scm '+gabc123')
)
_PRE_RANK = {"a": 1, "alpha": 1, "b": 2, "beta": 2,
             "c": 3, "rc": 3, "pre": 3, "preview": 3}


def parse_version(v: str) -> tuple:
    """PEP-440-ordered compare key (practical subset): within one
    release, dev < a < b < rc < final < post, and numeric pre-release
    suffixes compare as NUMBERS (1.2.0rc10 > 1.2.0rc9, which a
    lexicographic suffix compare inverts). Trailing zero release
    segments are insignificant (1.2 == 1.2.0). The reference's
    segment-wise is_newer_version (update.rs) only handles plain
    dotted numerics; pip-published packages need the phase rules.
    A '+local' build segment is ignored for ordering (PEP 440 ranks
    it a hair above the same bare version; treating them equal means
    a local build never sees its own base release as an 'update')."""
    s = v.strip().lstrip("v").lower()
    m = _VER_RE.match(s)
    if not m:
        # unparseable: sort below every real version, tie-break textually
        return ((), -1, 0, -1, 0, 0, s)
    release = [int(x) for x in m["release"].split(".")]
    while len(release) > 1 and release[-1] == 0:
        release.pop()
    phase = 0 if (m["dev_l"] and not m["pre_l"] and not m["post_l"]) else (
        _PRE_RANK[m["pre_l"]] if m["pre_l"] else 4
    )
    pre_n = int(m["pre_n"] or 0)
    post = (1, int(m["post_n"] or 0)) if m["post_l"] else (0, 0)
    dev = (0, int(m["dev_n"] or 0)) if m["dev_l"] else (1, 0)
    return (tuple(release), phase, pre_n, *post, *dev)


def latest_version(
    index_url: str | None = None,
    fetch: Callable[[str], str] | None = None,
) -> str:
    """Latest published version of this package on the index
    (PyPI-style JSON API: ``{index}/{package}/json``)."""
    base = (index_url or DEFAULT_INDEX).rstrip("/")
    url = f"{base}/{PACKAGE}/json"
    if fetch is None:
        def fetch(u: str) -> str:  # pragma: no cover - network
            with urllib.request.urlopen(u, timeout=10) as resp:
                return resp.read().decode("utf-8")
    try:
        payload = json.loads(fetch(url))
        return payload["info"]["version"]
    except Exception as exc:  # noqa: BLE001
        raise ConveyorError(f"could not query the package index at {url}: {exc}")


def check_update(
    index_url: str | None = None,
    fetch: Callable[[str], str] | None = None,
    current: str | None = None,
) -> tuple[str, str, bool]:
    """(current, latest, update_available)."""
    cur = current or __version__
    latest = latest_version(index_url, fetch)
    return cur, latest, parse_version(latest) > parse_version(cur)


def install_update(
    index_url: str | None = None,
    fetch: Callable[[str], str] | None = None,
    pip_runner: Callable[[list[str]], int] | None = None,
    current: str | None = None,
    out=None,
) -> int:
    """Upgrade via pip when the index has a newer version. Returns a
    process exit code (0 = success or already current)."""
    out = out or sys.stdout
    cur, latest, newer = check_update(index_url, fetch, current)
    if not newer:
        print(f"conveyor-spark {cur} is up to date (latest: {latest})", file=out)
        return 0
    print(f"updating conveyor-spark {cur} -> {latest} via pip...", file=out)
    cmd = [sys.executable, "-m", "pip", "install", "--upgrade"]
    if index_url:
        cmd += ["--index-url", index_url]
    cmd.append(f"{PACKAGE}=={latest}")
    if pip_runner is None:
        def pip_runner(c: list[str]) -> int:  # pragma: no cover - real pip
            return subprocess.call(c)
    rc = pip_runner(cmd)
    if rc == 0:
        print(f"updated to {latest}", file=out)
    else:
        print(f"pip exited with {rc}; package unchanged", file=out)
    return rc
