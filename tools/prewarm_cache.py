"""Regenerate the committed XLA compile cache (.jax_cache) from scratch.

The cache exists because the driver bench times out on cold compiles
through the remote tunnel (BENCH_r02.json rc=124 — see bench.py). It is
committed prewarmed, which means it accumulates stale entries whenever the
bench's HLO changes (ADVICE r3): entries are keyed by compiler version +
topology + HLO hash, and nothing else prunes them.

This tool rebuilds the cache to contain exactly what the current bench.py
compiles and nothing else:

  1. moves .jax_cache aside,
  2. runs `python bench.py` on the real chip with a long budget (every
     variant compiles fresh and lands its cache entry),
  3. prints the old/new entry counts and sizes, deletes the old cache.

Run it whenever bench.py's jitted pipelines change (new variant, changed
input contract) — the LAST step before round close, so the committed cache
matches the committed bench. `--keep-old` preserves the previous cache as
.jax_cache.old for diffing.
"""

from __future__ import annotations

import argparse
import os
import shutil
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CACHE = os.path.join(REPO, ".jax_cache")


def _du(path: str) -> tuple[int, int]:
    if not os.path.isdir(path):
        return 0, 0
    names = os.listdir(path)
    return len(names), sum(
        os.path.getsize(os.path.join(path, n)) for n in names
    )


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--keep-old", action="store_true",
                    help="keep the previous cache as .jax_cache.old")
    ap.add_argument("--budget", default="3000",
                    help="POSETPU_BENCH_BUDGET seconds for the bench run")
    args = ap.parse_args()

    old = CACHE + ".old"
    n0, b0 = _du(CACHE)
    if os.path.isdir(old):
        shutil.rmtree(old)
    if os.path.isdir(CACHE):
        os.rename(CACHE, old)

    env = dict(os.environ, POSETPU_BENCH_BUDGET=args.budget)
    print(f"old cache: {n0} entries, {b0 / 1e6:.1f} MB; "
          "running bench.py cold...", flush=True)
    rc = subprocess.call([sys.executable, os.path.join(REPO, "bench.py")],
                        env=env, cwd=REPO)
    n1, b1 = _du(CACHE)
    print(f"new cache: {n1} entries, {b1 / 1e6:.1f} MB (bench rc={rc})")
    if rc != 0:
        # restore the old cache — a broken bench must not strand the driver
        if os.path.isdir(CACHE):
            shutil.rmtree(CACHE)
        if os.path.isdir(old):
            os.rename(old, CACHE)
        print("bench FAILED — old cache restored")
        return rc
    if not args.keep_old and os.path.isdir(old):
        shutil.rmtree(old)
    return 0


if __name__ == "__main__":
    sys.exit(main())
