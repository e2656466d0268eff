"""Subprocess runner for ``py.eval`` with ``trusted = false``.

The reference executes js.eval scripts inside a WASM-sandboxed Boa
engine (plugins-wasm/conveyor-plugin-js-wasm/src/lib.rs:61-72) — the
script cannot touch the host. This module is the Python analogue for
semi-trusted pipeline specs: the executor spawns ``python -m
conveyor_spark.transforms.py_sandbox`` per partition and streams rows
over stdin/stdout as JSON batches, while the child locks itself down
BEFORE executing the user script:

- ``RLIMIT_NPROC = 0`` — fork/exec fails, so ``os.system`` & friends
  die even if a script digs a handle to them out of the interpreter.
- ``RLIMIT_NOFILE = 0`` — no NEW file descriptors: ``socket()``,
  ``open()``, pipes all fail at the OS level (the already-open stdio
  fds keep working, which is all the row protocol needs).
- ``RLIMIT_AS`` / ``RLIMIT_CPU`` — memory and CPU ceilings; a runaway
  script is killed by the kernel (SIGXCPU / MemoryError), not trusted
  to cooperate.
- Stripped builtins namespace — ``open``/``eval``/``exec``/
  ``compile``/``input``/``breakpoint`` removed and ``__import__``
  replaced with a whitelist of pre-imported pure-computation modules
  (imports happen before the fd limit drops; nothing else can load).

- seccomp-BPF syscall allowlist (py_seccomp.py, engaged after the
  rlimits): denied syscalls return EPERM at the KERNEL boundary, so
  even an object-graph escape that digs a real ``open``/``os.stat``
  out of the interpreter cannot read filesystem metadata, open,
  socket, or exec — operations the rlimits alone do not stop (stat
  and readlink need no new fd). Engagement status rides the ready
  reply; platforms that cannot engage record the reason (visible
  negative) and keep the two rlimit layers.

This is OS-level containment, not a bytecode verifier: a hostile
script can still crash its own subprocess or burn its CPU quota, and
CPython object-graph escapes can reach unexported objects — but the
rlimits make those objects inert (no processes, no fds, no network)
and the syscall filter denies the kernel surface behind them. The
reference's WASM sandbox remains stronger in-principle (no syscall
layer exists AT ALL inside wasm); this is the strongest containment
available without shipping an interpreter.

Protocol (one JSON object per line):
  parent -> child:  {"script", "columns", "cpu_seconds", "memory_mb",
                     "modules"} then {"rows": [...]} per Arrow batch
  child -> parent:  {"ready": true} | {"rows": [...]} | {"error": msg}
User ``print()`` output is redirected to stderr so it cannot corrupt
the protocol stream.
"""

from __future__ import annotations

import json
import sys

# pure-computation stdlib; no IO, no process control
DEFAULT_MODULES = (
    "math", "re", "json", "string", "datetime", "itertools", "functools",
    "statistics", "random", "collections", "heapq", "bisect", "decimal",
    "fractions", "textwrap", "unicodedata", "hashlib", "base64", "uuid",
)

_REMOVED_BUILTINS = (
    "open", "input", "breakpoint", "exit", "quit", "eval", "exec",
    "compile", "help", "license", "credits", "copyright", "memoryview",
)


def _restricted_builtins(allowed: dict) -> dict:
    import builtins

    ns = {k: getattr(builtins, k) for k in dir(builtins) if not k.startswith("_")}
    for name in _REMOVED_BUILTINS:
        ns.pop(name, None)
    ns["None"], ns["True"], ns["False"] = None, True, False
    # the one dunder normal code needs: `class` statements compile to
    # a __build_class__ call — without it any script defining a class
    # dies with NameError (the underscore filter above is about
    # stripping _sys/__loader__-style escape hatches, not class syntax)
    ns["__build_class__"] = builtins.__build_class__

    def _import(name, *args, **kwargs):
        root = name.split(".", 1)[0]
        if root in allowed:
            return allowed[root]
        raise ImportError(f"module {name!r} is not allowed in the py.eval sandbox")

    ns["__import__"] = _import
    return ns


def main() -> int:
    import resource

    proto_out = sys.stdout
    proto_in = sys.stdin
    # user print() goes to stderr; the protocol owns real stdout
    sys.stdout = sys.stderr

    header = json.loads(proto_in.readline())
    script = header["script"]
    columns = header["columns"]
    engine = header.get("engine") or "exec"
    cpu_s = int(header.get("cpu_seconds") or 30)
    mem_b = int(header.get("memory_mb") or 512) * 1024 * 1024

    def reply(obj: dict) -> None:
        proto_out.write(json.dumps(obj) + "\n")
        proto_out.flush()

    transform = None
    if engine == "ast":
        # defense in depth (engine='ast' + trusted=false): the script
        # is INTERPRETED by the py_ast micro-interpreter — no CPython
        # exec anywhere — and even an interpreter escape lands in this
        # rlimited process: no fork/exec, no fds, CPU+memory capped.
        # ONLY the module import happens before the limits drop
        # (imports open files); parsing AND the interpreter's
        # execution of the script's module body run BELOW the
        # setrlimit block — module-level user code (loops, big
        # allocations before `def transform`) must already be inside
        # the OS containment, not just the step budget. A failed
        # import must surface over the protocol: stderr is DEVNULL in
        # the parent, so a bare crash here would be misreported as an
        # rlimit kill.
        try:
            from conveyor_spark.transforms.py_ast import make_transform
        except Exception as exc:  # noqa: BLE001 — broken deployment
            reply({"error": f"{type(exc).__name__}: {exc}"})
            return 1
    else:
        # pre-import the whitelist while we can still open files
        allowed: dict = {}
        for mod in header.get("modules") or DEFAULT_MODULES:
            try:
                allowed[mod] = __import__(mod)
            except ImportError:
                pass
        code = compile(script, "<py.eval:sandbox>", "exec")

    # the seccomp module (and its ctypes/libc handles) must load while
    # files can still open — NOFILE drops to 0 below
    try:
        from conveyor_spark.transforms.py_seccomp import engage
    except Exception as exc:  # noqa: BLE001 — never block the eval path
        engage = None  # type: ignore[assignment]
        seccomp_status = f"import failed: {type(exc).__name__}: {exc}"

    resource.setrlimit(resource.RLIMIT_NPROC, (0, 0))
    resource.setrlimit(resource.RLIMIT_NOFILE, (0, 0))
    resource.setrlimit(resource.RLIMIT_AS, (mem_b, mem_b))
    resource.setrlimit(resource.RLIMIT_CPU, (cpu_s, cpu_s))

    # layer 3 (after the rlimits, before any user code): drop to a
    # read-only-compute syscall allowlist — denied syscalls return
    # EPERM, so an escape that digs past the stripped builtins still
    # cannot open/socket/exec at the kernel boundary. Unavailable
    # platforms degrade to the two rlimit layers with the reason
    # RECORDED in the ready reply — a visible negative, never silent.
    if engage is not None:
        try:
            seccomp_status = engage() or "engaged"
        except Exception as exc:  # noqa: BLE001
            seccomp_status = f"{type(exc).__name__}: {exc}"

    if engine == "ast":
        try:
            transform = make_transform(
                script, step_budget=int(header.get("step_budget") or 1_000_000)
            )
        except Exception as exc:  # noqa: BLE001 — report, don't crash
            reply({"error": f"{type(exc).__name__}: {exc}"})
            return 1

    if transform is None:
        # __name__ present: class creation reads it for __module__
        ns: dict = {"__builtins__": _restricted_builtins(allowed),
                    "__name__": "__sandbox__"}
        try:
            exec(code, ns)  # noqa: S102 — the point of the sandbox
        except Exception as exc:  # noqa: BLE001 — a KeyError here is the
            # USER script's error, not a missing transform
            reply({"error": f"{type(exc).__name__}: {exc}"})
            return 1
        transform = ns.get("transform")
        if not callable(transform):
            reply({"error": "py.eval script must define transform(row)"})
            return 1
    reply({"ready": True, "seccomp": seccomp_status})

    for line in proto_in:
        batch = json.loads(line)
        out = []
        try:
            for row in batch["rows"]:
                result = transform(row)
                if result is None:
                    continue  # dropped row (reference null semantics)
                out.append({c: result.get(c) for c in columns})
        except Exception as exc:  # noqa: BLE001
            reply({"error": f"{type(exc).__name__}: {exc}"})
            return 1
        reply({"rows": out})
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
