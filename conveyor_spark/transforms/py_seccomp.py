"""seccomp-BPF layer for the py.eval sandbox child (round 12).

The reference's js.eval runs inside a WASM boundary (plugins-wasm/
conveyor-plugin-js-wasm/src/lib.rs:61-72) — the script physically
cannot issue a syscall. The py_sandbox child's rlimits (NPROC=0,
NOFILE=0, AS, CPU) deny *resources*, but the syscall surface itself
stayed reachable: an object-graph escape could still call any kernel
entry point and probe for rlimit gaps. This module drops the child to
a read-only-compute syscall allowlist AFTER setrlimit and before the
user script runs:

- allowlisted: the syscalls a computing CPython needs on existing
  fds — read/write/readv/writev/poll/lseek/fstat/fcntl/close, the
  allocator (brk/mmap/mprotect/munmap/mremap/madvise), signals
  (rt_sig*/sigaltstack), time (clock_*/nanosleep), futex/sched_yield,
  getpid/gettid/uname/getrandom/getrusage/sched_getaffinity, thread
  plumbing (arch_prctl/set_robust_list/rseq/membarrier), exit.
- ``clone`` is allowed ONLY with CLONE_THREAD in its flags (BLAS
  thread pools), never fork-shaped; ``clone3`` returns ENOSYS so
  glibc falls back to the inspectable ``clone``.
- ``tgkill`` is allowed ONLY against the child's own tgid (CPython
  re-raises signals to itself); signalling other processes is EPERM.
- EVERYTHING else — openat, socket, connect, execve, ptrace, prctl,
  mount, ioctl, chdir, unlink, ... — returns EPERM rather than
  killing: a hostile script sees ``PermissionError``, a CPython
  internal that unexpectedly needs a denied call degrades to an
  exception instead of a silent SIGSYS corpse (regression-tested
  against the full sandbox suite). A wrong-arch syscall (32-bit
  bypass attempt) kills the process.

Pure ctypes (prctl + classic-BPF assembly) — no external deps, no
privileges needed (PR_SET_NO_NEW_PRIVS first). x86_64 only; engage()
returns a reason string instead of raising when the platform or
kernel cannot support it, and the child records that in its ready
reply so the negative is observable, never silent.
"""
from __future__ import annotations

import ctypes
import os
import platform
import struct

# x86_64 syscall numbers (stable kernel ABI)
_NR = {
    "read": 0, "write": 1, "close": 3, "fstat": 5, "poll": 7,
    "lseek": 8, "mmap": 9, "mprotect": 10, "munmap": 11, "brk": 12,
    "rt_sigaction": 13, "rt_sigprocmask": 14, "rt_sigreturn": 15,
    "pread64": 17, "readv": 19, "writev": 20, "select": 23,
    "sched_yield": 24, "mremap": 25, "madvise": 28, "nanosleep": 35,
    "getpid": 39, "clone": 56, "exit": 60, "uname": 63, "fcntl": 72,
    "getrusage": 98, "sigaltstack": 131, "arch_prctl": 158,
    "gettid": 186, "futex": 202, "sched_getaffinity": 204,
    "restart_syscall": 219, "clock_gettime": 228, "clock_getres": 229,
    "clock_nanosleep": 230, "exit_group": 231, "tgkill": 234,
    "set_robust_list": 273, "getrandom": 318, "membarrier": 324,
    "rseq": 334, "clone3": 435, "futex_waitv": 449,
}

_ALLOW = [
    "read", "write", "close", "fstat", "poll", "lseek", "mmap",
    "mprotect", "munmap", "brk", "rt_sigaction", "rt_sigprocmask",
    "rt_sigreturn", "pread64", "readv", "writev", "select",
    "sched_yield", "mremap", "madvise", "nanosleep", "getpid", "exit",
    "uname", "fcntl", "getrusage", "sigaltstack", "arch_prctl",
    "gettid", "futex", "sched_getaffinity", "restart_syscall",
    "clock_gettime", "clock_getres", "clock_nanosleep", "exit_group",
    "set_robust_list", "getrandom", "membarrier", "rseq",
    "futex_waitv",
]

_AUDIT_ARCH_X86_64 = 0xC000003E
_CLONE_THREAD = 0x00010000
_EPERM, _ENOSYS = 1, 38

# classic-BPF opcodes
_LD_W_ABS = 0x20
_JEQ_K = 0x15
_JSET_K = 0x45
_RET_K = 0x06
_SECCOMP_RET_ALLOW = 0x7FFF0000
_SECCOMP_RET_ERRNO = 0x00050000
_SECCOMP_RET_KILL_PROCESS = 0x80000000

_PR_SET_NO_NEW_PRIVS = 38
_PR_SET_SECCOMP = 22
_SECCOMP_MODE_FILTER = 2

# seccomp_data offsets: nr=0, arch=4, ip=8, args[0] low word=16
_OFF_NR, _OFF_ARCH, _OFF_ARG0 = 0, 4, 16


class _SockFilter(ctypes.Structure):
    _fields_ = [("code", ctypes.c_uint16), ("jt", ctypes.c_uint8),
                ("jf", ctypes.c_uint8), ("k", ctypes.c_uint32)]


class _SockFprog(ctypes.Structure):
    _fields_ = [("len", ctypes.c_uint16),
                ("filter", ctypes.POINTER(_SockFilter))]


def _assemble(pid: int) -> list[tuple[int, int, int, int]]:
    """Build the filter with symbolic jump labels, then resolve."""
    prog: list = []          # (code, jt_label|int, jf_label|int, k)
    labels: dict[str, int] = {}

    def emit(code, jt, jf, k):
        prog.append([code, jt, jf, k])

    def label(name):
        labels[name] = len(prog)

    emit(_LD_W_ABS, 0, 0, _OFF_ARCH)
    emit(_JEQ_K, 0, "KILL", _AUDIT_ARCH_X86_64)
    emit(_LD_W_ABS, 0, 0, _OFF_NR)
    emit(_JEQ_K, "CLONECHK", 0, _NR["clone"])
    emit(_JEQ_K, "TGCHK", 0, _NR["tgkill"])
    emit(_JEQ_K, "ENOSYS", 0, _NR["clone3"])
    for name in _ALLOW:
        emit(_JEQ_K, "ALLOW", 0, _NR[name])
    emit(_RET_K, 0, 0, _SECCOMP_RET_ERRNO | _EPERM)   # default deny
    label("ALLOW")
    emit(_RET_K, 0, 0, _SECCOMP_RET_ALLOW)
    label("ENOSYS")
    emit(_RET_K, 0, 0, _SECCOMP_RET_ERRNO | _ENOSYS)
    label("KILL")
    emit(_RET_K, 0, 0, _SECCOMP_RET_KILL_PROCESS)
    label("CLONECHK")  # thread-shaped clone only
    emit(_LD_W_ABS, 0, 0, _OFF_ARG0)
    emit(_JSET_K, 0, "DENY2", _CLONE_THREAD)
    emit(_RET_K, 0, 0, _SECCOMP_RET_ALLOW)
    label("DENY2")
    emit(_RET_K, 0, 0, _SECCOMP_RET_ERRNO | _EPERM)
    label("TGCHK")     # signal own thread group only
    emit(_LD_W_ABS, 0, 0, _OFF_ARG0)
    emit(_JEQ_K, 0, "DENY3", pid & 0xFFFFFFFF)
    emit(_RET_K, 0, 0, _SECCOMP_RET_ALLOW)
    label("DENY3")
    emit(_RET_K, 0, 0, _SECCOMP_RET_ERRNO | _EPERM)

    out = []
    for i, (code, jt, jf, k) in enumerate(prog):
        def res(tgt):
            if isinstance(tgt, str):
                d = labels[tgt] - i - 1
                if not 0 <= d <= 255:
                    raise ValueError(f"jump {tgt} out of range: {d}")
                return d
            return tgt
        out.append((code, res(jt), res(jf), k))
    return out


def engage() -> str | None:
    """Install the filter. Returns None on success, else the reason
    it is unavailable (recorded by the child — a documented negative,
    never a silent skip)."""
    if platform.machine() != "x86_64":
        return f"unsupported arch {platform.machine()} (x86_64 BPF table)"
    if struct.calcsize("P") != 8:
        return "non-64-bit interpreter"
    try:
        libc = ctypes.CDLL(None, use_errno=True)
    except OSError as exc:
        return f"libc unavailable: {exc}"
    try:
        insns = _assemble(os.getpid())
    except ValueError as exc:
        return f"filter assembly failed: {exc}"
    arr = (_SockFilter * len(insns))(
        *[_SockFilter(c, jt, jf, k) for c, jt, jf, k in insns])
    prog = _SockFprog(len(insns), arr)
    if libc.prctl(_PR_SET_NO_NEW_PRIVS, 1, 0, 0, 0) != 0:
        return f"PR_SET_NO_NEW_PRIVS failed: errno {ctypes.get_errno()}"
    if libc.prctl(_PR_SET_SECCOMP, _SECCOMP_MODE_FILTER,
                  ctypes.byref(prog), 0, 0) != 0:
        return f"PR_SET_SECCOMP failed: errno {ctypes.get_errno()}"
    return None
