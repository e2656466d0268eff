"""Tests for the `update` CLI verb (conveyor_spark/update.py):
version comparison, index query, and the pip hand-off — all with an
injected fetch/pip so no network or real index is touched."""

from __future__ import annotations

import io
import json

import pytest

from conveyor_spark import __version__
from conveyor_spark.errors import ConveyorError
from conveyor_spark.update import (
    check_update,
    install_update,
    latest_version,
    parse_version,
)


def _index(version: str):
    def fetch(url: str) -> str:
        assert url.endswith("/conveyor-spark/json")
        return json.dumps({"info": {"version": version}})
    return fetch


def test_parse_version_ordering():
    assert parse_version("1.2.10") > parse_version("1.2.9")
    assert parse_version("2.0.0") > parse_version("1.99.99")
    assert parse_version("v1.2.0") == parse_version("1.2.0")
    # a final release beats its own prerelease segment
    assert parse_version("1.2.0") > parse_version("1.2.0rc1")
    # PEP 440 phases: numeric pre-release compare, dev below final,
    # post above final (a lexicographic suffix compare inverts these)
    assert parse_version("1.2.0rc10") > parse_version("1.2.0rc9")
    assert parse_version("1.2.0") > parse_version("1.2.0.dev1")
    assert parse_version("1.2.0.post1") > parse_version("1.2.0")
    assert parse_version("1.2.0rc1") > parse_version("1.2.0rc1.dev2")
    assert parse_version("1.2.0b1") > parse_version("1.2.0a5")
    assert parse_version("1.2") == parse_version("1.2.0")
    # setuptools-scm local builds order by their base version (a
    # '+local' suffix must not demote the version below everything)
    assert parse_version("1.3.0+g1a2b3c4") > parse_version("1.2.0")
    assert parse_version("1.3.0.dev5+g1a2b3c4") < parse_version("1.3.0")
    assert parse_version("1.3.0+g1a2b3c4") == parse_version("1.3.0")


def test_latest_version_queries_index():
    assert latest_version(fetch=_index("9.9.9")) == "9.9.9"
    # custom index url lands in the query
    seen = {}

    def fetch(url):
        seen["url"] = url
        return json.dumps({"info": {"version": "1.0.0"}})

    latest_version("https://mirror.example/simple", fetch=fetch)
    assert seen["url"] == "https://mirror.example/simple/conveyor-spark/json"


def test_latest_version_unreachable_index():
    def fetch(url):
        raise OSError("no route to host")
    with pytest.raises(ConveyorError, match="package index"):
        latest_version(fetch=fetch)


def test_check_update_compares_against_package_version():
    cur, latest, newer = check_update(fetch=_index("99.0.0"))
    assert cur == __version__ and latest == "99.0.0" and newer
    cur, latest, newer = check_update(fetch=_index(__version__))
    assert not newer


def test_install_update_invokes_pip_only_when_newer():
    calls = []

    def pip(cmd):
        calls.append(cmd)
        return 0

    out = io.StringIO()
    rc = install_update(fetch=_index("99.0.0"), pip_runner=pip, out=out)
    assert rc == 0
    assert len(calls) == 1
    assert calls[0][-1] == "conveyor-spark==99.0.0"
    assert "pip" in calls[0] and "--upgrade" in calls[0]
    assert "updated to 99.0.0" in out.getvalue()

    calls.clear()
    out = io.StringIO()
    rc = install_update(fetch=_index(__version__), pip_runner=pip, out=out)
    assert rc == 0 and not calls  # up to date: pip never runs
    assert "up to date" in out.getvalue()


def test_install_update_propagates_pip_failure():
    out = io.StringIO()
    rc = install_update(fetch=_index("99.0.0"), pip_runner=lambda c: 1, out=out)
    assert rc == 1
    assert "unchanged" in out.getvalue()


def test_cli_update_check(capsys, monkeypatch):
    from conveyor_spark import update as upd
    from conveyor_spark.cli import main as cli_main

    monkeypatch.setattr(
        upd, "latest_version", lambda index_url=None, fetch=None: "99.0.0"
    )
    assert cli_main(["update", "--check"]) == 0
    assert "update available" in capsys.readouterr().out

    monkeypatch.setattr(
        upd, "latest_version", lambda index_url=None, fetch=None: __version__
    )
    assert cli_main(["update", "--check"]) == 0
    assert "up to date" in capsys.readouterr().out


def test_cli_update_unreachable_index_exit_code(capsys, monkeypatch):
    from conveyor_spark import update as upd
    from conveyor_spark.cli import main as cli_main

    def boom(index_url=None, fetch=None):
        raise ConveyorError("could not query the package index")

    monkeypatch.setattr(upd, "latest_version", boom)
    assert cli_main(["update", "--check"]) == 2
    assert "update failed" in capsys.readouterr().err
