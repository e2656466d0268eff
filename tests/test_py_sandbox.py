"""Tests for py.eval trusted=false (py_sandbox.py): containment of
process/fd/network access, resource ceilings, and parity of results
with the trusted path."""

from __future__ import annotations

import os

import pytest

from tests.conftest import run_op


@pytest.fixture(scope="module")
def df(spark):
    return spark.createDataFrame([(i, i * 10) for i in range(20)], ["id", "val"])


SCRIPT_OK = """
import math
def transform(row):
    row['root'] = math.sqrt(row['val'])
    return row
"""


def test_sandboxed_matches_trusted(ctx, df):
    kw = dict(column=None)
    trusted = run_op(ctx, "py.eval", [df], script=SCRIPT_OK,
                     output_schema="id BIGINT, val BIGINT, root DOUBLE")
    sandboxed = run_op(ctx, "py.eval", [df], script=SCRIPT_OK,
                       output_schema="id BIGINT, val BIGINT, root DOUBLE",
                       trusted=False)
    assert sorted(map(tuple, trusted.collect())) == sorted(map(tuple, sandboxed.collect()))


def test_sandboxed_row_drop(ctx, df):
    script = "def transform(row):\n    return row if row['id'] % 2 == 0 else None"
    out = run_op(ctx, "py.eval", [df], script=script, trusted=False)
    assert sorted(r["id"] for r in out.collect()) == list(range(0, 20, 2))


def test_sandbox_blocks_os_system(ctx, df, tmp_path):
    marker = tmp_path / "pwned"
    script = f"""
def transform(row):
    import os
    os.system('touch {marker}')
    return row
"""
    with pytest.raises(Exception, match="sandbox"):
        run_op(ctx, "py.eval", [df], script=script, trusted=False).collect()
    assert not marker.exists()


def test_sandbox_blocks_os_system_via_object_graph(ctx, df, tmp_path):
    """Even a script that digs the real os module out of the
    interpreter's object graph cannot spawn a process: RLIMIT_NPROC=0
    makes fork/exec fail at the OS level."""
    marker = tmp_path / "pwned_graph"
    script = f"""
def transform(row):
    real_os = None
    for c in ().__class__.__base__.__subclasses__():
        try:
            g = c.__init__.__globals__
        except AttributeError:
            continue
        if 'os' in g and hasattr(g['os'], 'system'):
            real_os = g['os']
            break
    real_os.system('touch {marker}')
    return row
"""
    # the script itself survives (system() reports failure rather than
    # raising), but the command must never have run
    run_op(ctx, "py.eval", [df], script=script, trusted=False).collect()
    assert not marker.exists()


def test_sandbox_blocks_socket(ctx, df):
    script = """
def transform(row):
    import socket
    socket.socket().connect(('127.0.0.1', 80))
    return row
"""
    with pytest.raises(Exception, match="sandbox"):
        run_op(ctx, "py.eval", [df], script=script, trusted=False).collect()


def test_sandbox_blocks_open(ctx, df, tmp_path):
    marker = tmp_path / "written"
    script = f"""
def transform(row):
    open('{marker}', 'w').write('x')
    return row
"""
    with pytest.raises(Exception, match="sandbox"):
        run_op(ctx, "py.eval", [df], script=script, trusted=False).collect()
    assert not marker.exists()


def test_sandbox_cpu_ceiling(ctx, df):
    script = "def transform(row):\n    while True:\n        pass"
    with pytest.raises(Exception, match="sandbox"):
        run_op(ctx, "py.eval", [df], script=script, trusted=False,
               sandbox_cpu_seconds=1).collect()


def test_sandbox_module_whitelist_override(ctx, df):
    # math excluded from the whitelist -> import fails inside the sandbox
    with pytest.raises(Exception, match="sandbox"):
        run_op(ctx, "py.eval", [df], script=SCRIPT_OK,
               output_schema="id BIGINT, val BIGINT, root DOUBLE",
               trusted=False, sandbox_modules=["json"]).collect()


def test_sandbox_allows_class_statements(ctx, df):
    """__build_class__ survives the dunder strip: scripts defining
    helper classes must run (only the removed-builtins list is meant
    to be unavailable)."""
    script = """
class Scaler:
    def __init__(self, f):
        self.f = f
    def apply(self, v):
        return v * self.f

S = Scaler(3)
def transform(row):
    row['scaled'] = S.apply(row['val'])
    return row
"""
    out = run_op(ctx, "py.eval", [df], script=script,
                 output_schema="id BIGINT, val BIGINT, scaled BIGINT",
                 trusted=False)
    assert {r["id"]: r["scaled"] for r in out.collect()} == {
        i: i * 30 for i in range(20)
    }


def test_sandbox_reports_user_keyerror_not_missing_transform(ctx, df):
    """A KeyError raised by the script's own top-level code must
    surface as that KeyError — not as 'must define transform(row)'."""
    script = "CONFIG = {}\nTHRESHOLD = CONFIG['threshold']\ndef transform(row):\n    return row"
    with pytest.raises(Exception, match="KeyError"):
        run_op(ctx, "py.eval", [df], script=script, trusted=False).collect()


def test_trusted_default_unchanged(ctx, df):
    # no trusted key -> old exec path (probe-exec on the driver still
    # rejects scripts without transform())
    from conveyor_spark.errors import ConfigError
    with pytest.raises(ConfigError):
        run_op(ctx, "py.eval", [df], script="x = 1")


AST_SCRIPT = """
def transform(row):
    total = 0
    for i in range(row['val'] + 1):
        total = total + i
    row['tri'] = total
    return row
"""


def test_ast_in_subprocess_matches_in_process(ctx, df):
    """engine='ast' + trusted=false runs the micro-interpreter INSIDE
    the rlimited subprocess (defense in depth); results must equal
    the in-process ast path bit for bit."""
    kw = dict(script=AST_SCRIPT, engine="ast",
              output_schema="id BIGINT, val BIGINT, tri BIGINT")
    in_proc = run_op(ctx, "py.eval", [df], **kw)
    sandboxed = run_op(ctx, "py.eval", [df], trusted=False, **kw)
    assert sorted(map(tuple, in_proc.collect())) == \
        sorted(map(tuple, sandboxed.collect()))


def test_ast_in_subprocess_row_drop(ctx, df):
    script = "def transform(row):\n    if row['id'] % 2 == 0:\n        return row\n    return None"
    out = run_op(ctx, "py.eval", [df], script=script, engine="ast",
                 trusted=False)
    assert sorted(r["id"] for r in out.collect()) == list(range(0, 20, 2))


def test_ast_in_subprocess_rejects_hostile_script(ctx, df):
    """Layer 1 fires on the DRIVER: py_eval calls validate_script
    before the untrusted branch, so a hostile import is a ConfigError-
    class failure at op construction — the subprocess never spawns.
    (Child-side rejection of the same script is covered separately by
    test_sandbox_child_rejects_hostile_ast_script.)"""
    script = "import os\ndef transform(row):\n    return row"
    with pytest.raises(Exception, match="(?i)import|sandbox|not allowed"):
        run_op(ctx, "py.eval", [df], script=script, engine="ast",
               trusted=False).collect()


def test_sandbox_child_rejects_hostile_ast_script():
    """Layer 1 also runs INSIDE the child: drive the sandbox
    subprocess directly (bypassing py_eval's driver-side
    validate_script) with a hostile ast-engine header and assert the
    rejection arrives over the protocol, after the rlimits drop."""
    import json
    import subprocess
    import sys

    header = {
        "script": "import os\ndef transform(row):\n    return row",
        "columns": ["id"],
        "engine": "ast",
        "step_budget": 1000000,
        "cpu_seconds": 10,
        "memory_mb": 512,
        "modules": None,
    }
    proc = subprocess.run(
        [sys.executable, "-m", "conveyor_spark.transforms.py_sandbox"],
        input=json.dumps(header) + "\n",
        capture_output=True, text=True, timeout=60,
    )
    reply = json.loads(proc.stdout.splitlines()[0])
    assert "error" in reply
    assert "import" in reply["error"].lower() or "Import" in reply["error"]
    assert proc.returncode == 1


def _drive_child(script, modules, rows):
    import json
    import subprocess
    import sys

    header = {"script": script, "columns": ["x"], "cpu_seconds": 10,
              "memory_mb": 512, "modules": modules}
    lines = json.dumps(header) + "\n" + json.dumps({"rows": rows}) + "\n"
    proc = subprocess.run(
        [sys.executable, "-m", "conveyor_spark.transforms.py_sandbox"],
        input=lines, capture_output=True, text=True, timeout=60,
    )
    return [json.loads(l) for l in proc.stdout.splitlines() if l.strip()]


def test_sandbox_child_engages_seccomp():
    """Layer 3: on this platform the child must report the syscall
    filter ENGAGED in its ready reply (a platform that cannot engage
    reports the reason — but this container can, so a downgrade here
    is a regression)."""
    out = _drive_child("def transform(row):\n    return row", None,
                       [{"x": 1}])
    assert out[0].get("ready") is True
    assert out[0].get("seccomp") == "engaged"


def test_sandbox_seccomp_denies_fs_metadata_syscalls():
    """The kernel layer catches what the rlimits CANNOT: stat /
    readlink / getcwd make no new fd and no new process, so NOFILE=0
    and NPROC=0 would allow them — the allowlist returns EPERM. Driven
    with 'os' deliberately whitelisted: even a caller who hands the
    script os cannot read filesystem metadata."""
    script = (
        "import os\n"
        "def transform(row):\n"
        "    got = {}\n"
        "    for name, fn in (('stat', lambda: os.stat('/etc/passwd')),\n"
        "                     ('readlink', lambda: os.readlink('/proc/self/exe')),\n"
        "                     ('getcwd', lambda: os.getcwd())):\n"
        "        try:\n"
        "            fn(); got[name] = 'ALLOWED'\n"
        "        except PermissionError: got[name] = 'EPERM'\n"
        "        except OSError as e: got[name] = 'OSError'\n"
        "    return {'x': got['stat'] + ',' + got['readlink'] + ',' + got['getcwd']}\n"
    )
    out = _drive_child(script, ["os"], [{"x": 1}])
    assert out[0].get("seccomp") == "engaged"
    assert out[1]["rows"][0]["x"] == "EPERM,EPERM,EPERM"


def test_sandbox_seccomp_normal_compute_unaffected():
    """The allowlist must not break real computation: allocation
    (mmap/brk), hashing, datetime, and regex all work under the
    filter."""
    script = (
        "import hashlib, re, datetime\n"
        "def transform(row):\n"
        "    big = list(range(20000))  # enough to exercise the allocator\n"
        "    h = hashlib.sha256(str(sum(big)).encode()).hexdigest()[:8]\n"
        "    m = re.match(r'(\\d+)', '123abc').group(1)\n"
        "    d = datetime.date(2020, 1, 2).isoformat()\n"
        "    return {'x': f'{h}:{m}:{d}'}\n"
    )
    out = _drive_child(script, None, [{"x": 1}])
    assert out[0].get("seccomp") == "engaged"
    assert out[1]["rows"][0]["x"].endswith(":123:2020-01-02")


def test_ast_in_subprocess_os_layer_backstops_interpreter(ctx, df):
    """Layer 2 (the rlimits) backstops layer 1: with the step budget
    effectively disabled, a spin loop is still killed by the OS CPU
    ceiling — proof the subprocess containment is active under the
    ast engine, not just the interpreter's own budget."""
    script = ("def transform(row):\n"
              "    x = 0\n"
              "    while True:\n"
              "        x = x + 1\n")
    with pytest.raises(Exception, match="sandbox"):
        run_op(ctx, "py.eval", [df], script=script, engine="ast",
               trusted=False, step_budget=10**18,
               sandbox_cpu_seconds=1).collect()


def test_ast_in_subprocess_prunes_columns(ctx, spark):
    """The driver-side static column pruning applies before the
    sandbox barrier in the untrusted ast mode too."""
    wide = spark.createDataFrame(
        [(i, i * 10, "pad", 1.5) for i in range(10)],
        ["id", "val", "junk", "extra"],
    )
    out = run_op(ctx, "py.eval", [wide],
                 script="def transform(row):\n    return {'doubled': row['val'] * 2}",
                 engine="ast", trusted=False, output_schema="doubled BIGINT")
    assert sorted(r["doubled"] for r in out.collect()) == \
        [i * 20 for i in range(10)]


def test_ast_in_subprocess_module_body_is_rlimited(ctx, df):
    """Module-level user code (before `def transform`) must already
    run under the OS containment: a top-level spin loop with the step
    budget effectively disabled dies on the CPU rlimit instead of
    hanging the executor. Regression: make_transform used to run the
    module body BEFORE the setrlimit block."""
    script = ("x = 0\n"
              "while True:\n"
              "    x = x + 1\n"
              "def transform(row):\n"
              "    return row\n")
    with pytest.raises(Exception, match="sandbox"):
        run_op(ctx, "py.eval", [df], script=script, engine="ast",
               trusted=False, step_budget=10**18,
               sandbox_cpu_seconds=1).collect()


def test_group_eval_namespace_fresh_per_group(ctx, spark):
    """Mutable module-level script state must stay group-scoped: the
    compile-once optimization must not share the exec'd namespace
    across groups (partitioning-dependent results otherwise)."""
    df = spark.createDataFrame(
        [("a", 1), ("a", 2), ("b", 3), ("c", 4)], "k STRING, v INT"
    )
    script = (
        "seen = []\n"
        "def transform(key, pdf):\n"
        "    seen.append(key)\n"
        "    return pdf.assign(rank=len(seen))\n"
    )
    out = run_op(ctx, "py.group_eval", [df], script=script, group_by="k",
                 output_schema="k STRING, v INT, rank BIGINT",
                 parallelism=1)  # force every group into ONE task
    assert {r["rank"] for r in out.collect()} == {1}
