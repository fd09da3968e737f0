#!/usr/bin/env python
"""Run the test suite with per-file process isolation.

The full suite in ONE process has repeatedly crashed this environment's
XLA:CPU backend at ~60% (segfaults inside the persistent-cache write
path and inside backend_compile of mid-suite programs — see
tests/conftest.py), while every file passes when run on its own.  This
runner is the committed, reproducible way to get a green full-suite
signal: one pytest subprocess per test file, shared persistent compile
cache, aggregated summary, nonzero exit on any failure.

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
