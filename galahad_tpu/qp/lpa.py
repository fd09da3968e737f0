"""LP by the simplex method (vertex solutions).

TPU-native counterpart of GALAHAD's LPA (reference src/lpa/lpa.f90 —
a thin wrapper over HSL LA04's revised simplex; reorder-to-LA04-form at
lpa.f90:1189).  The simplex method is inherently sequential and
pivot-driven — the worst possible TPU fit — so, exactly as the
reference delegates to a host code, this implementation is a clean
host-side dense revised simplex (numpy, two-phase, Bland's rule for
cycling safety).  Its role in the framework matches LPA's in the
reference: produce *vertex* (basic) solutions, e.g. behind the
crossover path, while lpb/ipm_solve is the large-scale TPU path.

Standard form used internally: min g'v s.t. A_e v = b, v_lo <= v <= v_hi
(general constraints get slack variables; two-sided bounds kept on
variables — a bounded-variable simplex).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP
from ..core.status import Status


@control_dc
class LPAControl:
    maxit: int = 10000
    tol: float = 1.0e-9
    infinity: float = INFINITY


@dataclasses.dataclass
class LPAInfo:
    x: Any
    y: Any
    z: Any
    obj: float
    status: int
    iter: int
    basis: Any            # indices of basic variables (extended space)


def _bounded_simplex(g, A, b, lo, hi, basis, ctl, v=None, at_lo=None):
    """Bounded-variable revised simplex, min g'v, Av = b, lo<=v<=hi.
    ``basis``: initial basic index set (len m).  Nonbasic variables sit
    on a finite bound (at lo where finite, else hi, else 0).  ``v`` /
    ``at_lo`` carry the bound-flip state between phases; if omitted a
    cold nonbasic point is derived from the bounds."""
    m, n = A.shape
    if v is None:
        v = np.where(np.isfinite(lo), lo,
                     np.where(np.isfinite(hi), hi, 0.0))
    else:
        v = np.array(v, np.float64, copy=True)
    if at_lo is None:
        at_lo = np.isfinite(lo) | ~np.isfinite(hi)
    else:
        at_lo = np.array(at_lo, bool, copy=True)

    basis = list(basis)
    nonbasic = [j for j in range(n) if j not in set(basis)]
    for it in range(1, ctl.maxit + 1):
        B = A[:, basis]
        try:
            Binv_b = np.linalg.solve(B, b - A[:, nonbasic] @ v[nonbasic])
        except np.linalg.LinAlgError:
            return v, None, it, int(Status.FACTORIZATION), basis, at_lo
        v[basis] = Binv_b
        # duals & reduced costs
        yv = np.linalg.solve(B.T, g[basis])
        rc = g[nonbasic] - A[:, nonbasic].T @ yv
        # entering: Bland's rule — smallest eligible *variable index*
        # (not list order, which mutates under pivots) for anti-cycling
        enter_pos = None
        enter_var = n + 1
        for k, j in enumerate(nonbasic):
            free = not (np.isfinite(lo[j]) or np.isfinite(hi[j]))
            if (at_lo[j] or free) and rc[k] < -ctl.tol and j < enter_var:
                enter_pos, enter_var, direction = k, j, 1.0
            elif ((not at_lo[j]) or free) and rc[k] > ctl.tol \
                    and j < enter_var:
                enter_pos, enter_var, direction = k, j, -1.0
        if enter_pos is None:
            return v, yv, it, int(Status.OK), basis, at_lo
        j = nonbasic[enter_pos]
        d = np.linalg.solve(B, A[:, j]) * direction
        # ratio test on basic variables and the entering variable's
        # opposite bound
        alpha = hi[j] - lo[j] if np.isfinite(hi[j]) and np.isfinite(lo[j]) \
            else np.inf
        leave = None
        for i, bi in enumerate(basis):
            if d[i] > ctl.tol and np.isfinite(lo[bi]):
                a = (v[bi] - lo[bi]) / d[i]
                if a < alpha - 1e-15:
                    alpha, leave = a, (i, -1)
            elif d[i] < -ctl.tol and np.isfinite(hi[bi]):
                a = (v[bi] - hi[bi]) / d[i]
                if a < alpha - 1e-15:
                    alpha, leave = a, (i, 1)
        if not np.isfinite(alpha):
            return v, yv, it, int(Status.UNBOUNDED), basis, at_lo
        v[j] += direction * alpha
        v[basis] -= alpha * d
        if leave is not None:
            i, which = leave
            bi = basis[i]
            v[bi] = lo[bi] if which < 0 else hi[bi]
            at_lo[bi] = which < 0
            basis[i] = j
            nonbasic[enter_pos] = bi
        else:
            at_lo[j] = not at_lo[j]
    return v, None, ctl.maxit, int(Status.MAX_ITERATIONS), basis, at_lo


def lpa_solve(qp: QP, ctl: LPAControl = LPAControl()) -> LPAInfo:
    """Solve the LP min g'x s.t. c_l <= Ax <= c_u, x_l <= x <= x_u by
    two-phase simplex; returns a vertex solution with basis statistics
    (the LPA_solve contract, reference src/lpa/lpa.f90:712)."""
    g = np.asarray(qp.g, np.float64)
    n = g.shape[0]
    m = qp.m
    from ..core.problem import check_qp

    bad = check_qp(qp, ctl.infinity)           # -3 / -4 entry contract
    if bad != 0:
        return LPAInfo(x=np.zeros(n), y=np.zeros(m), z=np.zeros(n),
                       obj=float("nan"), status=bad, iter=0,
                       basis=np.zeros(0, np.int64))
    A = np.asarray(qp.A, np.float64) if m else np.zeros((0, n))
    inf = ctl.infinity
    xl = np.asarray(qp.x_l, np.float64)
    xu = np.asarray(qp.x_u, np.float64)
    cl = np.asarray(qp.c_l, np.float64) if m else np.zeros(0)
    cu = np.asarray(qp.c_u, np.float64) if m else np.zeros(0)
    xl = np.where(xl <= -inf, -np.inf, xl)
    xu = np.where(xu >= inf, np.inf, xu)
    cl = np.where(cl <= -inf, -np.inf, cl)
    cu = np.where(cu >= inf, np.inf, cu)

    # m == 0: the LP separates per variable (no simplex needed)
    if m == 0:
        import jax.numpy as jnp
        dt = qp.g.dtype
        unb = ((g < 0) & ~np.isfinite(xu)) | ((g > 0) & ~np.isfinite(xl))
        x = np.where(g > 0, xl, np.where(g < 0, xu,
                     np.where(np.isfinite(xl), xl, 0.0)))
        x = np.where(np.isfinite(x), x, 0.0)
        st = int(Status.UNBOUNDED) if unb.any() else int(Status.OK)
        return LPAInfo(x=jnp.asarray(x, qp.g.dtype), y=jnp.zeros(0, dt),
                       z=jnp.asarray(g, dt),
                       obj=float(g @ x) + float(qp.f), status=st, iter=0,
                       basis=np.zeros(0, np.int64))

    # extended: v = [x; s], A x - s = 0, cl <= s <= cu
    A_e = np.concatenate([A, -np.eye(m)], axis=1) if m else np.zeros((0, n))
    g_e = np.concatenate([g, np.zeros(m)])
    lo = np.concatenate([xl, cl])
    hi = np.concatenate([xu, cu])
    b = np.zeros(m)

    # phase 1: artificials with big-M-free approach — minimize sum of
    # artificial magnitudes with a crash basis of artificials.
    art = np.eye(m)
    A1 = np.concatenate([A_e, art], axis=1) if m else A_e
    v0 = np.where(np.isfinite(lo), lo, np.where(np.isfinite(hi), hi, 0.0))
    r0 = b - A_e @ v0 if m else b
    # artificial bounds chosen so the start is feasible: a_i = r0_i
    lo1 = np.concatenate([lo, np.minimum(r0, 0.0)])
    hi1 = np.concatenate([hi, np.maximum(r0, 0.0)])
    g1 = np.concatenate([np.zeros(n + m), np.sign(r0) + (r0 == 0)])
    basis = list(range(n + m, n + 2 * m))
    if m:
        v1, _, it1, st1, basis, at_lo1 = _bounded_simplex(
            g1, A1, b, lo1, hi1, basis, ctl)
        if st1 != int(Status.OK) or np.sum(np.abs(v1[n + m:])) > 1e-7:
            import jax.numpy as jnp
            return LPAInfo(x=jnp.asarray(v1[:n]), y=jnp.zeros(m),
                           z=jnp.zeros(n), obj=np.inf,
                           status=int(Status.PRIMAL_INFEASIBLE), iter=it1,
                           basis=np.asarray(basis))
        # drive artificials out of the basis where possible; keep with
        # zero bounds otherwise.  Phase 2 inherits v/at_lo from phase 1
        # so its bound-flip state (and hence feasibility) is preserved.
        lo1[n + m:] = 0.0
        hi1[n + m:] = 0.0
        v1[n + m:] = 0.0
        g2 = np.concatenate([g_e, np.zeros(m)])
        v2, yv, it2, st2, basis, _ = _bounded_simplex(
            g2, A1, b, lo1, hi1, basis, ctl, v=v1, at_lo=at_lo1)
        iters = it1 + it2
        if st2 == int(Status.OK):
            # guard: verify primal feasibility of the claimed optimum
            ftol = 1e-6 * (1.0 + np.abs(b).max(initial=0.0)
                           + np.abs(v2[:n + m]).max(initial=0.0))
            lo_ok = np.all(v2[:n + m] >= np.where(np.isfinite(lo), lo,
                                                  -np.inf) - ftol)
            hi_ok = np.all(v2[:n + m] <= np.where(np.isfinite(hi), hi,
                                                  np.inf) + ftol)
            res_ok = np.abs(A1 @ v2 - b).max(initial=0.0) <= ftol
            if not (lo_ok and hi_ok and res_ok):
                st2 = int(Status.PRIMAL_INFEASIBLE)
    else:
        v2 = v0
        yv = np.zeros(0)
        st2 = int(Status.OK)
        iters = 0

    x = v2[:n]
    y = yv if yv is not None else np.zeros(m)
    z = g - (A.T @ y if m else 0.0)
    import jax.numpy as jnp
    dt = qp.g.dtype
    return LPAInfo(
        x=jnp.asarray(x, dt), y=jnp.asarray(y, dt), z=jnp.asarray(z, dt),
        obj=float(g @ x) + float(qp.f), status=st2, iter=iters,
        basis=np.asarray([bi for bi in basis if bi < n + m]))
