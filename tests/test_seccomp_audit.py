"""Self-audit of the seccomp-BPF sandbox filter (round 13).

The r12 differential tests prove the INSTALLED filter's behavior on a
handful of syscalls from inside a child process; this module audits
the assembled PROGRAM itself, exhaustively, with an independent
classic-BPF interpreter written here — so the syscall table (_NR),
the allowlist (_ALLOW), and the hand-assembled jump resolution in
_assemble() cannot drift apart silently (VERDICT r12 task 7: "the
table and the filter can currently drift silently").

The interpreter implements exactly the four opcodes the filter uses
(LD_W_ABS / JEQ_K / JSET_K / RET_K) against a synthetic seccomp_data,
and the sweep covers EVERY syscall number 0..1023 — the spec is
derived from _ALLOW/_NR plus the three documented conditionals
(clone thread-only, tgkill self-only, clone3 -> ENOSYS), wrong-arch
kills, everything else EPERM.
"""
from __future__ import annotations

import pytest

from conveyor_spark.transforms import py_seccomp as S

_LD_W_ABS, _JEQ_K, _JSET_K, _RET_K = 0x20, 0x15, 0x45, 0x06


def run_bpf(prog, nr: int, arch: int, arg0_low: int) -> int:
    """Reference classic-BPF interpreter for the opcodes the filter
    emits. seccomp_data: nr@0, arch@4, ip@8, args[i] low word@16+8i
    (little-endian x86_64 — the filter only reads arg0's low word)."""
    data = {S._OFF_NR: nr & 0xFFFFFFFF, S._OFF_ARCH: arch & 0xFFFFFFFF,
            S._OFF_ARG0: arg0_low & 0xFFFFFFFF}
    acc, pc = 0, 0
    steps = 0
    while True:
        steps += 1
        assert steps <= len(prog) + 1, "filter loops"
        code, jt, jf, k = prog[pc]
        if code == _LD_W_ABS:
            assert k in data, f"filter reads unmodeled offset {k}"
            acc = data[k]
            pc += 1
        elif code == _JEQ_K:
            pc += 1 + (jt if acc == k else jf)
        elif code == _JSET_K:
            pc += 1 + (jt if (acc & k) else jf)
        elif code == _RET_K:
            return k
        else:  # any other opcode would be a filter the audit can't see
            raise AssertionError(f"unaudited BPF opcode {code:#x} at {pc}")
        assert 0 <= pc < len(prog), "jump escapes the program"


ALLOW = S._SECCOMP_RET_ALLOW
EPERM = S._SECCOMP_RET_ERRNO | S._EPERM
ENOSYS = S._SECCOMP_RET_ERRNO | S._ENOSYS
KILL = S._SECCOMP_RET_KILL_PROCESS
X64 = S._AUDIT_ARCH_X86_64
PID = 4242


@pytest.fixture(scope="module")
def prog():
    return S._assemble(PID)


def test_exhaustive_syscall_sweep_matches_allowlist(prog):
    """EVERY nr 0..1023: allowed iff listed in _ALLOW (plus the three
    conditionals) — a forgotten _ALLOW entry, a wrong _NR number, or
    a mis-resolved jump all fail here."""
    allowed_nrs = {S._NR[n] for n in S._ALLOW}
    special = {S._NR["clone"], S._NR["tgkill"], S._NR["clone3"]}
    assert not (allowed_nrs & special), "conditional syscalls in _ALLOW"
    for nr in range(1024):
        got = run_bpf(prog, nr, X64, arg0_low=0)
        if nr in allowed_nrs:
            assert got == ALLOW, f"nr {nr} should be allowed, got {got:#x}"
        elif nr == S._NR["clone3"]:
            assert got == ENOSYS
        elif nr == S._NR["clone"]:
            assert got == EPERM  # arg0 has no CLONE_THREAD here
        else:  # tgkill with arg0=0 != pid is EPERM like the default
            assert got == EPERM, f"nr {nr} should be EPERM, got {got:#x}"


def test_known_x86_64_numbers_pinned():
    """Spot-pin the ABI numbers the audit depends on — if _NR were
    regenerated wrong, the sweep above would 'pass' against the same
    wrong data; these literals anchor it to the real kernel ABI."""
    pins = {"read": 0, "write": 1, "close": 3, "mmap": 9, "brk": 12,
            "clone": 56, "exit": 60, "futex": 202, "tgkill": 234,
            "getrandom": 318, "clone3": 435}
    for name, nr in pins.items():
        assert S._NR[name] == nr
    # and the dangerous ones must NOT be in the table's allowlist
    denied = {"open": 2, "stat": 4, "ioctl": 16, "socket": 41,
              "connect": 42, "fork": 57, "vfork": 58, "execve": 59,
              "kill": 62, "getcwd": 79, "chdir": 80, "unlink": 87,
              "readlink": 89, "ptrace": 101, "prctl": 157,
              "mount": 165, "openat": 257, "execveat": 322}
    allowed_nrs = {S._NR[n] for n in S._ALLOW}
    for name, nr in denied.items():
        assert nr not in allowed_nrs, f"{name} ({nr}) is allowlisted"


def test_clone_thread_shaped_only(prog):
    nr = S._NR["clone"]
    assert run_bpf(prog, nr, X64, S._CLONE_THREAD) == ALLOW
    assert run_bpf(prog, nr, X64, S._CLONE_THREAD | 0x11) == ALLOW
    assert run_bpf(prog, nr, X64, 0) == EPERM          # fork-shaped
    assert run_bpf(prog, nr, X64, 0x11) == EPERM       # SIGCHLD fork


def test_tgkill_self_only(prog):
    nr = S._NR["tgkill"]
    assert run_bpf(prog, nr, X64, PID) == ALLOW
    assert run_bpf(prog, nr, X64, 1) == EPERM          # init
    assert run_bpf(prog, nr, X64, PID + 1) == EPERM


def test_wrong_arch_kills(prog):
    AUDIT_ARCH_I386 = 0x40000003
    AUDIT_ARCH_AARCH64 = 0xC00000B7
    for arch in (AUDIT_ARCH_I386, AUDIT_ARCH_AARCH64, 0):
        # even an otherwise-allowed nr dies under the wrong arch
        assert run_bpf(prog, S._NR["read"], arch, 0) == KILL


def test_default_action_is_eperm_not_kill(prog):
    """The documented degrade-to-exception contract: an unexpected
    CPython-internal syscall surfaces as PermissionError, never a
    silent SIGSYS corpse."""
    assert run_bpf(prog, 999, X64, 0) == EPERM


def test_jump_resolution_in_range():
    """Classic BPF jumps are u8 — _assemble must fail loudly (not
    wrap) if the allowlist ever grows past jump reach. Today's
    program must resolve with every jump in [0, 255]."""
    prog = S._assemble(1)
    for code, jt, jf, k in prog:
        assert 0 <= jt <= 255 and 0 <= jf <= 255


def test_non_x86_64_returns_documented_negative(monkeypatch):
    """The aarch64 record (VERDICT r12 task 7): other arches degrade
    to the two remaining sandbox layers with the reason STRING, never
    a silent skip and never a wrong-table install."""
    monkeypatch.setattr(S.platform, "machine", lambda: "aarch64")
    reason = S.engage()
    assert reason is not None and "aarch64" in reason
    assert "x86_64" in reason  # names the table it refused to install
