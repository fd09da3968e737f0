#!/usr/bin/env python
"""Generate the synthetic QPLIB benchmark sweep (VERDICT r3 item 10).

~20 problems varying size, density, bound structure and degeneracy,
written with the package's own QPLIB writer into examples/sweep/ plus a
list file for ``python -m galahad_tpu batch`` (the bin/galtests role,
reference bin/galtests:1-13).  Everything is generated from seeds — no
reference data is copied.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from galahad_tpu.io import qplib  # noqa: E402

INF = 1e20
OUT = os.path.join(os.path.dirname(__file__), "..", "examples", "sweep")


def tridiag_h(n, d=2.0, o=-1.0):
    hr = np.concatenate([np.arange(n), np.arange(1, n)])
    hc = np.concatenate([np.arange(n), np.arange(n - 1)])
    hv = np.concatenate([np.full(n, d), np.full(n - 1, o)])
    return hr, hc, hv


def banded_a(m, n, w=2, rng=None):
    ar = np.repeat(np.arange(m), w)
    ac = np.concatenate([[i + j for j in range(w)] for i in range(m)])
    av = (rng.uniform(0.5, 1.5, m * w) if rng is not None
          else np.ones(m * w))
    return ar, ac, av


def random_a(m, n, nnz_per_row, rng):
    ar = np.repeat(np.arange(m), nnz_per_row)
    ac = np.concatenate([
        rng.choice(n, nnz_per_row, replace=False) for _ in range(m)])
    av = rng.uniform(-1.0, 2.0, m * nnz_per_row)
    return ar, ac, av


def problem(name, ptype, n, m, h, g, a, c_l, c_u, x_l, x_u,
            minimize=True, f=0.0):
    if h is None:
        h = (np.zeros(0, int), np.zeros(0, int), np.zeros(0))
    if a is None:
        a = (np.zeros(0, int), np.zeros(0, int), np.zeros(0))
    return qplib.QPLIBProblem(
        name=name, ptype=ptype, minimize=minimize, n=n, m=m,
        H_coo=tuple(np.asarray(v) for v in h),
        g=np.asarray(g, float), f=float(f),
        A_coo=tuple(np.asarray(v) for v in a),
        c_l=np.asarray(c_l, float), c_u=np.asarray(c_u, float),
        x_l=np.asarray(x_l, float), x_u=np.asarray(x_u, float),
        x0=np.zeros(n), y0=np.zeros(m), z0=np.zeros(n),
        infinity=INF, var_types=np.zeros(n, int), H_c=[],
        x_names={}, c_names={})


def build_all():
    ps = []
    # --- LP family -----------------------------------------------------
    for n, seed in ((100, 0), (300, 1), (800, 2)):
        rng = np.random.default_rng(seed)
        m = n - 2
        a = banded_a(m, n, 2, rng)
        ps.append(problem(
            f"LPB{n}", "LML", n, m, None,
            -0.2 - 0.2 * (np.arange(n) % 5), a,
            np.ones(m), np.full(m, INF), np.zeros(n), np.full(n, 2.0)))
    # degenerate LP: duplicated columns -> non-unique optimum
    rng = np.random.default_rng(3)
    n, m = 120, 60
    a0 = random_a(m, n // 2, 3, rng)
    a0 = (a0[0], a0[1], np.abs(a0[2]) + 0.1)   # feasible: positive row sums
    a = (np.concatenate([a0[0], a0[0]]),
         np.concatenate([a0[1], a0[1] + n // 2]),
         np.concatenate([a0[2], a0[2]]))
    g = np.concatenate([rng.uniform(0.1, 1.0, n // 2)] * 2)
    ps.append(problem("LPDEGEN", "LML", n, m, None, g, a,
                      np.full(m, 1.0), np.full(m, INF),
                      np.zeros(n), np.full(n, 10.0)))
    # LP with ranges + equalities
    rng = np.random.default_rng(4)
    n, m = 150, 100
    a = random_a(m, n, 4, rng)
    c_l = rng.uniform(-1, 0, m)
    c_u = c_l + np.where(np.arange(m) % 3 == 0, 0.0, rng.uniform(0.5, 2, m))
    ps.append(problem("LPRANGE", "LML", n, m, None,
                      rng.normal(size=n), a, c_l, c_u,
                      np.full(n, -3.0), np.full(n, 3.0)))
    # --- convex QP family ---------------------------------------------
    for n, seed in ((100, 5), (400, 6), (1000, 7)):
        rng = np.random.default_rng(seed)
        m = n // 2
        h = tridiag_h(n, 4.0, -1.0)
        a = banded_a(m, n, 2, rng)
        ps.append(problem(
            f"QPB{n}", "QML", n, m, h, rng.normal(size=n), a,
            np.ones(m), np.full(m, INF), np.zeros(n), np.full(n, 2.0)))
    # diagonal-H separable QP
    rng = np.random.default_rng(8)
    n, m = 250, 120
    h = (np.arange(n), np.arange(n), rng.uniform(0.5, 4.0, n))
    a = random_a(m, n, 3, rng)
    ps.append(problem("QPDIAG", "QML", n, m, h, rng.normal(size=n), a,
                      np.full(m, -1.0), np.full(m, 1.0),
                      np.full(n, -5.0), np.full(n, 5.0)))
    # ill-conditioned H (6 decades of curvature spread).  NOTE: this
    # instance is INFEASIBLE by construction (verified with an exact LP
    # feasibility solve): the expected status is -5, testing the
    # infeasibility-detection path.
    rng = np.random.default_rng(9)
    n, m = 200, 80
    h = (np.arange(n), np.arange(n),
         10.0 ** rng.uniform(-3, 3, n))
    a = random_a(m, n, 4, rng)
    ps.append(problem("QPILL", "QML", n, m, h, rng.normal(size=n), a,
                      np.full(m, 0.5), np.full(m, INF),
                      np.zeros(n), np.full(n, 4.0)))
    # equality-constrained QP
    rng = np.random.default_rng(10)
    n, m = 180, 60
    h = tridiag_h(n, 3.0, -1.0)
    a = random_a(m, n, 5, rng)
    rhs = rng.normal(size=m)
    ps.append(problem("QPEQ", "QML", n, m, h, rng.normal(size=n), a,
                      rhs, rhs, np.full(n, -10.0), np.full(n, 10.0)))
    # fixed variables + free variables mix
    rng = np.random.default_rng(11)
    n, m = 160, 70
    h = tridiag_h(n, 2.0, -0.5)
    a = random_a(m, n, 3, rng)
    x_l = np.where(np.arange(n) % 7 == 0, 1.0, -INF)
    x_u = np.where(np.arange(n) % 7 == 0, 1.0, INF)
    x_l = np.where(np.arange(n) % 3 == 0, 0.0, x_l)
    ps.append(problem("QPMIXB", "QML", n, m, h, rng.normal(size=n), a,
                      np.full(m, -2.0), np.full(m, 2.0), x_l, x_u))
    # degenerate QP: many bounds active with zero multipliers
    rng = np.random.default_rng(12)
    n, m = 140, 50
    h = (np.arange(n), np.arange(n), np.full(n, 1.0))
    a = random_a(m, n, 3, rng)
    ps.append(problem("QPDEGEN", "QML", n, m, h, np.zeros(n), a,
                      np.full(m, 0.0), np.full(m, INF),
                      np.zeros(n), np.full(n, 1.0)))
    # maximize variant (sign handling)
    rng = np.random.default_rng(13)
    n, m = 90, 40
    h = (np.arange(n), np.arange(n), -np.full(n, 2.0))   # concave -> max
    a = random_a(m, n, 3, rng)
    ps.append(problem("QPMAX", "QML", n, m, h, rng.normal(size=n), a,
                      np.full(m, -1.0), np.full(m, 1.0),
                      np.full(n, -2.0), np.full(n, 2.0), minimize=False))
    # --- bound-constrained family -------------------------------------
    for n, seed in ((150, 14), (500, 15)):
        rng = np.random.default_rng(seed)
        h = tridiag_h(n, 4.0, -1.0)
        ps.append(problem(f"BQP{n}", "QMB", n, 0, h,
                          rng.normal(size=n), None,
                          np.zeros(0), np.zeros(0),
                          np.zeros(n), np.full(n, 1.5)))
    # dense-H QP (worst case for sparsity assumptions)
    rng = np.random.default_rng(16)
    n, m = 120, 60
    B = rng.normal(size=(n, 6))
    Hd = B @ B.T + 0.5 * np.eye(n)
    hr, hc = np.tril_indices(n)
    h = (hr, hc, Hd[hr, hc])
    a = random_a(m, n, 4, rng)
    ps.append(problem("QPDENSE", "QML", n, m, h, rng.normal(size=n), a,
                      np.full(m, -1.0), np.full(m, 3.0),
                      np.full(n, -2.0), np.full(n, 2.0)))
    # near-infeasible LP (tight activity range)
    rng = np.random.default_rng(17)
    n, m = 80, 60
    a = random_a(m, n, 3, rng)
    ps.append(problem("LPTIGHT", "LML", n, m, None,
                      rng.uniform(0.1, 1.0, n), a,
                      np.full(m, -0.05), np.full(m, 0.05),
                      np.zeros(n), np.full(n, 0.1)))
    # wide LP (m << n)
    rng = np.random.default_rng(18)
    n, m = 600, 30
    a = random_a(m, n, 8, rng)
    ps.append(problem("LPWIDE", "LML", n, m, None,
                      rng.uniform(0.05, 1.0, n), a,
                      np.full(m, 4.0), np.full(m, INF),
                      np.zeros(n), np.full(n, 1.0)))
    # tall LP (m close to n, mostly equalities)
    rng = np.random.default_rng(19)
    n, m = 200, 180
    a = random_a(m, n, 3, rng)
    rhs = rng.normal(size=m) * 0.1
    c_u = np.where(np.arange(m) % 2 == 0, rhs, rhs + 1.0)
    ps.append(problem("LPTALL", "LML", n, m, None,
                      rng.uniform(-1, 1, n), a, rhs, c_u,
                      np.full(n, -2.0), np.full(n, 2.0)))
    return ps


def main():
    os.makedirs(OUT, exist_ok=True)
    names = []
    for p in build_all():
        path = os.path.join(OUT, f"{p.name}.qplib")
        qplib.dump(p, path)
        names.append(path)
    listfile = os.path.join(OUT, "sweep.list")
    with open(listfile, "w") as fh:
        fh.write("\n".join(os.path.relpath(n, os.path.join(OUT, "..", ".."))
                           for n in names) + "\n")
    print(f"{len(names)} problems -> {OUT}")
    print(f"list file: {listfile}")


if __name__ == "__main__":
    main()
