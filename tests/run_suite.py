#!/usr/bin/env python
"""Run the test suite with per-file process isolation (FALLBACK).

ROUND-5 STATUS: ``python -m pytest tests/`` in ONE process is green
(3 consecutive full runs) — the historic ~60% XLA:CPU segfault was
root-caused to cumulative in-process compiler state after ~300
compiles (not the cache, env, stack size, or concurrency — each
eliminated by direct experiment) and is fixed by the module-scoped
``jax.clear_caches()`` fixture in tests/conftest.py.  Prefer plain
pytest; this per-file-subprocess runner remains as the belt-and-braces
fallback for environments where the in-process instability resurfaces.

Usage:  python tests/run_suite.py [-k EXPR] [files...]
"""
from __future__ import annotations

import glob
import os
import subprocess
import sys
import time


def main() -> int:
    here = os.path.dirname(os.path.abspath(__file__))
    args = sys.argv[1:]
    extra: list = []
    files: list = []
    it = iter(args)
    for a in it:
        if a == "-k":
            extra += ["-k", next(it)]
        elif a.startswith("-"):
            extra.append(a)
        else:
            files.append(a)
    if not files:
        files = sorted(glob.glob(os.path.join(here, "test_*.py")))
    total_pass = total_fail = 0
    failures = []
    t0 = time.time()
    for f in files:
        name = os.path.basename(f)
        t1 = time.time()
        r = subprocess.run(
            [sys.executable, "-m", "pytest", f, "-q", "--no-header",
             *extra],
            capture_output=True, text=True,
            cwd=os.path.dirname(here))
        dt = time.time() - t1
        tail = (r.stdout.strip().splitlines() or [""])[-1]
        status = "ok" if r.returncode in (0, 5) else "FAIL"
        # returncode 5 = no tests collected (e.g. -k filtered everything)
        print(f"{status:4s} {name:32s} {dt:7.1f}s  {tail}", flush=True)
        if r.returncode not in (0, 5):
            total_fail += 1
            failures.append((name, r.stdout[-2000:], r.stderr[-2000:]))
        else:
            total_pass += 1
    print(f"\n{total_pass} file(s) green, {total_fail} failed, "
          f"{time.time() - t0:.0f}s total")
    for name, out, err in failures:
        print(f"\n===== {name} =====\n{out}\n{err}")
    return 1 if total_fail else 0


if __name__ == "__main__":
    sys.exit(main())
