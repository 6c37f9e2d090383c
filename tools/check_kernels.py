"""Kernel-change guard (round-4 VERDICT #8): make it impossible to land a
Pallas-kernel or serving-path edit with only the fast test tier green.

Mechanism: the bit-exactness suite for the adopted serving kernels lives in
the slow tier (tests/conftest.py SLOW_TESTS) because it costs ~30 min of
interpret-mode time on this single-core host. This tool

1. hashes every file the kernel contracts depend on (posetpu/ops/pallas/**,
   posetpu/serving.py, posetpu/models/quant.py, posetpu/ops/heatmap.py and
   the kernel test files themselves),
2. compares against the committed stamp `tools/kernel_guard.stamp`,
3. if the hash differs, runs the kernel bit-exactness tests (the kernel
   subset of the slow tier, plus the fast-tier smoke) and rewrites the
   stamp only on success.

The pre-commit hook installed by `python tools/check_kernels.py --install-hook`
refuses any commit that stages kernel-path changes while the stamp does not
match the STAGED content — so the guard must have passed on exactly the code
being committed. `--check` is the fast hash-compare (used by the hook);
the default mode runs the tests when needed.
"""

from __future__ import annotations

import argparse
import hashlib
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
STAMP = os.path.join(REPO, "tools", "kernel_guard.stamp")

# Files whose change invalidates the kernel bit-exactness evidence.
GUARDED_PATHS = [
    "posetpu/ops/pallas",
    "posetpu/serving.py",
    "posetpu/models/quant.py",
    "posetpu/ops/heatmap.py",
    "tests/test_phase_kernel.py",
    "tests/test_phase_tail.py",
    "tests/test_aggregation_kernel.py",
    "tests/test_tail_jns.py",
    "tests/test_serving.py",
    "tests/test_kernel_smoke.py",
]

# The bit-exactness suite: every slow-tier kernel test + the fast smoke.
KERNEL_TESTS = [
    "tests/test_phase_kernel.py",
    "tests/test_phase_tail.py",
    "tests/test_aggregation_kernel.py",
    "tests/test_tail_jns.py",
    "tests/test_serving.py",
    "tests/test_kernel_smoke.py",
    "tests/test_pallas_decode.py",
]


def _iter_guarded_files():
    for p in GUARDED_PATHS:
        full = os.path.join(REPO, p)
        if os.path.isdir(full):
            for root, _, files in os.walk(full):
                for f in sorted(files):
                    if f.endswith(".py"):
                        yield os.path.join(root, f)
        elif os.path.exists(full):
            yield full


def content_hash(staged: bool = False) -> str:
    """Hash of the guarded files — working tree, or the git index when
    ``staged`` (what the pre-commit hook must validate)."""
    h = hashlib.sha256()
    for path in sorted(_iter_guarded_files()):
        rel = os.path.relpath(path, REPO)
        h.update(rel.encode())
        if staged:
            out = subprocess.run(
                ["git", "show", f":{rel}"], cwd=REPO,
                capture_output=True)
            data = out.stdout if out.returncode == 0 else b""
        else:
            with open(path, "rb") as f:
                data = f.read()
        h.update(hashlib.sha256(data).digest())
    return h.hexdigest()


def read_stamp() -> str:
    if not os.path.exists(STAMP):
        return ""
    with open(STAMP) as f:
        for line in f:
            line = line.strip()
            if line and not line.startswith("#"):
                return line
    return ""


def write_stamp(digest: str) -> None:
    with open(STAMP, "w") as f:
        f.write("# sha256 over the kernel-guard file set "
                "(tools/check_kernels.py); regenerated only after the\n"
                "# kernel bit-exactness suite passed on that exact "
                "content. Do not hand-edit.\n")
        f.write(digest + "\n")


def run_suite() -> int:
    cmd = [sys.executable, "-m", "pytest", "--slow", "-q", *KERNEL_TESTS]
    print("kernel guard: running", " ".join(cmd), flush=True)
    return subprocess.run(cmd, cwd=REPO).returncode


HOOK = """#!/bin/sh
# kernel-change guard (tools/check_kernels.py --install-hook)
exec python tools/check_kernels.py --check --staged
"""


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true",
                    help="hash-compare only; exit 1 with instructions if "
                         "the guard is stale")
    ap.add_argument("--staged", action="store_true",
                    help="with --check: hash the git index instead of the "
                         "working tree (pre-commit mode)")
    ap.add_argument("--install-hook", action="store_true")
    args = ap.parse_args()

    if args.install_hook:
        hook = os.path.join(REPO, ".git", "hooks", "pre-commit")
        with open(hook, "w") as f:
            f.write(HOOK)
        os.chmod(hook, 0o755)
        print(f"installed {hook}")
        return 0

    digest = content_hash(staged=args.staged)
    if digest == read_stamp():
        print("kernel guard: up to date")
        return 0

    if args.check:
        print("kernel guard: STALE — a guarded kernel/serving file changed "
              "since the bit-exactness suite last passed.\n"
              "Run `python tools/check_kernels.py` (executes the kernel "
              "subset of the slow tier, ~30 min) and commit the updated "
              "tools/kernel_guard.stamp with your change.", file=sys.stderr)
        return 1

    rc = run_suite()
    if rc != 0:
        print("kernel guard: suite FAILED — stamp not updated",
              file=sys.stderr)
        return rc
    # Re-hash after the run (the suite itself must not mutate sources).
    write_stamp(content_hash())
    print(f"kernel guard: suite passed, stamp updated ({digest[:12]}…)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
