"""Active-set (working-set) QP solver, and the QPC crossover composite.

TPU-native re-design of GALAHAD's QPA (reference src/qpa/qpa.f90:
QPA_solve :897 — an l1-penalty working-set method whose linear algebra
is an SLS factorization updated by SCU as the working set changes) and
QPC (src/qpc/qpc.f90 — interior point then active set).

TPU redesign.  The reference's working-set updates change matrix
*shapes* (rows enter/leave the KKT system); XLA needs static shapes, so
the working set is a boolean mask and the KKT matrix keeps its full
(n + m + n) layout: inactive general constraints and bounds are
replaced by identity rows fixing their multiplier to zero.  One masked
matrix assembly + one LU factorization per working-set change — each is
a fixed-shape MXU kernel, and whole batches of QPs vmap.  (SCU-style
low-rank updating is available in linalg/scu.py; the dense refactorize
is preferred here because a fresh (n+m)x(n+m) LU on the MXU is cheaper
than serialized rank-one updates for the sizes where a dense active-set
method is the right tool.  See BASELINE configs: active-set methods are
the worst TPU fit, kept for capability parity & crossover.)

Algorithm: primal active set (Fletcher/Goldfarb-Idnani flavor of
QPA's working-set mechanics): start feasible (via lsqp/phase-1), solve
the equality-constrained subproblem on the working set, ratio-test to
the nearest blocking constraint, add blockers, drop constraints whose
multiplier has the wrong sign.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP, classify_bounds
from ..core.status import Status


@control_dc
class QPAControl:
    """QPA_control_type equivalent (reference src/qpa/qpa.f90)."""

    maxit: int = 500
    feas_tol: float = 1.0e-8
    multiplier_tol: float = 1.0e-8   # wrong-sign threshold for drops
    reg: float = 1.0e-10             # KKT regularization
    infinity: float = INFINITY


@dataclasses.dataclass
class QPAInfo:
    x: Any
    y: Any
    z: Any
    obj: Any
    status: int
    iter: int
    c_stat: Any      # per-constraint: -1 lower active, 0 inactive, 1 upper
    b_stat: Any      # per-bound: same convention
    major_iter: int = 0


def _kkt_solve(H, A, act_c, act_b, sig_c, sig_b, rhs_x, rhs_c, rhs_b, reg):
    """Solve the working-set KKT system with masked rows.

    [ H      A_W'    I_B' ] [ dx ]   [ rhs_x ]
    [ A_W     0       0   ] [ -y ] = [ rhs_c ]   (active rows only)
    [ I_B     0       0   ] [ -z ]   [ rhs_b ]   (active bounds only)

    Inactive rows/cols are replaced by identity (multiplier := 0).
    """
    n = H.shape[0]
    m = A.shape[0] if A is not None and A.shape[0] else 0
    dt = H.dtype
    ac = act_c.astype(dt)
    ab = act_b.astype(dt)
    Am = A * ac[:, None] if m else jnp.zeros((0, n), dt)
    Ib = jnp.diag(ab)
    Z_mm = jnp.diag(1.0 - ac) if m else jnp.zeros((0, 0), dt)
    Z_bb = jnp.diag(1.0 - ab)
    top = jnp.concatenate([H + reg * jnp.eye(n, dtype=dt), Am.T, Ib], axis=1)
    mid = jnp.concatenate(
        [Am, -reg * jnp.eye(m, dtype=dt) + Z_mm, jnp.zeros((m, n), dt)],
        axis=1) if m else jnp.zeros((0, 2 * n + m), dt)
    bot = jnp.concatenate(
        [Ib, jnp.zeros((n, m), dt), -reg * jnp.eye(n, dtype=dt) + Z_bb],
        axis=1)
    K = jnp.concatenate([top, mid, bot], axis=0)
    rhs = jnp.concatenate([rhs_x, rhs_c * ac, rhs_b * ab])
    sol = jnp.linalg.solve(K, rhs)
    dx = sol[:n]
    y = -sol[n:n + m] * ac if m else jnp.zeros((0,), dt)
    z = -sol[n + m:] * ab
    return dx, y, z


def qpa_solve(qp: QP, x0=None, c_stat0=None, b_stat0=None,
              ctl: QPAControl = QPAControl()) -> QPAInfo:
    """Primal active-set solve.  ``x0`` must be feasible (phase 1 via
    lsqp_solve / wcp_solve if not supplied); c_stat0/b_stat0 warm-start
    the working set (the reference's C_stat/B_stat arrays)."""
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    from ..core.problem import check_qp

    bad = check_qp(qp, ctl.infinity)           # -3 / -4 entry contract
    if bad != 0:
        zn = jnp.zeros(n, dt)
        return QPAInfo(x=zn, y=jnp.zeros(m, dt), z=zn,
                       obj=jnp.asarray(jnp.nan, dt), status=bad, iter=0,
                       c_stat=jnp.zeros(m, jnp.int32),
                       b_stat=jnp.zeros(n, jnp.int32))
    masks = classify_bounds(qp, ctl.infinity)
    H = qp.H_dense()
    A = qp.A if m else None

    if x0 is None:
        from .frontend import lsqp_solve
        from ..qp.ipm import IPMControl
        lp = dataclasses.replace(qp, H=None, h_kind="zero", name="")
        x0, _, _, _ = lsqp_solve(lp, IPMControl(dtype=str(dt)))
    x = jnp.clip(jnp.asarray(x0, dt), qp.x_l, qp.x_u)

    # host-side working set (drives refactorizations; numpy bools)
    act_b = np.zeros(n, bool)
    sig_b = np.zeros(n, np.int8)
    act_c = np.zeros(m, bool)
    sig_c = np.zeros(m, np.int8)

    xh = np.asarray(x)
    if c_stat0 is not None:
        sig_c[:] = np.sign(np.asarray(c_stat0)).astype(np.int8)
        act_c[:] = sig_c != 0
    if b_stat0 is not None:
        sig_b[:] = np.sign(np.asarray(b_stat0)).astype(np.int8)
        act_b[:] = sig_b != 0
    # equalities always active; fixed variables always active
    eq = np.asarray(masks.c_equality)
    act_c |= eq
    sig_c[eq] = -1
    fx = np.asarray(masks.x_fixed)
    act_b |= fx
    sig_b[fx] = -1
    # activate bounds the start point sits on
    on_lo = np.asarray((jnp.abs(x - qp.x_l) < ctl.feas_tol) & masks.has_xl)
    on_hi = np.asarray((jnp.abs(qp.x_u - x) < ctl.feas_tol) & masks.has_xu)
    act_b |= on_lo | on_hi
    sig_b[on_lo] = -1
    sig_b[on_hi & ~on_lo] = 1

    solve = jax.jit(_kkt_solve)
    reg = jnp.asarray(ctl.reg, dt)
    status = int(Status.MAX_ITERATIONS)
    it = 0
    for it in range(1, ctl.maxit + 1):
        g_x = H @ x + qp.g
        ac = jnp.asarray(act_c)
        ab = jnp.asarray(act_b)
        dx, y, z = solve(H, A if m else jnp.zeros((0, n), dt),
                         ac, ab, jnp.asarray(sig_c, dt),
                         jnp.asarray(sig_b, dt),
                         -g_x, jnp.zeros(m, dt), jnp.zeros(n, dt), reg)
        norm_dx = float(jnp.max(jnp.abs(dx), initial=0.0))
        xscale = 1.0 + float(jnp.max(jnp.abs(x), initial=0.0))

        if norm_dx <= 1e-8 * xscale:
            # stationary on the working set: check multiplier signs.
            # Wrong sign: lower-active needs multiplier >= 0 (for a min
            # problem with c >= c_l convention, y_l >= 0).  The whole
            # scan is one masked argmin on device — no per-index host
            # loop (reference scans QPA_delete_constraint candidates
            # serially, qpa.f90; a TPU prefers a single reduction).
            BIG = jnp.asarray(jnp.inf, dt)
            vc = y * jnp.where(jnp.asarray(sig_c) < 0, 1.0, -1.0)
            vc = jnp.where(jnp.asarray(act_c & ~eq), vc, BIG)
            vb = z * jnp.where(jnp.asarray(sig_b) < 0, 1.0, -1.0)
            vb = jnp.where(jnp.asarray(act_b & ~fx), vb, BIG)
            allv = jnp.concatenate([vc, vb]) if m else vb
            k = int(jnp.argmin(allv))
            worst_val = float(allv[k])
            if worst_val >= -ctl.multiplier_tol:
                status = int(Status.OK)
                break
            if m and k < m:
                act_c[k] = False
                sig_c[k] = 0
            else:
                j = k - m if m else k
                act_b[j] = False
                sig_b[j] = 0
            continue

        # ratio test: largest alpha <= 1 keeping feasibility.  Vectorized
        # masked step-to-bound ratios + one argmin on device; only the
        # winning (alpha, index, side) crosses to the host.
        BIG = jnp.asarray(jnp.inf, dt)
        tiny = 1e-14
        if m:
            Ax = qp.Ax(x)
            Adx = qp.Ax(dx)
            inact_c = jnp.asarray(~act_c)
            a_cl = jnp.where(inact_c & (Adx < -tiny) & masks.has_cl,
                             (qp.c_l - Ax) / Adx, BIG)
            a_cu = jnp.where(inact_c & (Adx > tiny) & masks.has_cu,
                             (qp.c_u - Ax) / Adx, BIG)
        else:
            a_cl = a_cu = jnp.zeros((0,), dt) + BIG
        inact_b = jnp.asarray(~act_b)
        a_xl = jnp.where(inact_b & (dx < -tiny) & masks.has_xl,
                         (qp.x_l - x) / dx, BIG)
        a_xu = jnp.where(inact_b & (dx > tiny) & masks.has_xu,
                         (qp.x_u - x) / dx, BIG)
        ratios = jnp.concatenate([a_cl, a_cu, a_xl, a_xu])
        k = int(jnp.argmin(ratios)) if ratios.size else 0
        alpha = float(ratios[k]) if ratios.size else 1.0

        x = x + jnp.asarray(min(max(alpha, 0.0), 1.0), dt) * dx
        if alpha < 1.0:
            if k < m:
                act_c[k] = True
                sig_c[k] = -1
            elif k < 2 * m:
                act_c[k - m] = True
                sig_c[k - m] = 1
            elif k < 2 * m + n:
                act_b[k - 2 * m] = True
                sig_b[k - 2 * m] = -1
            else:
                act_b[k - 2 * m - n] = True
                sig_b[k - 2 * m - n] = 1

    obj = 0.5 * x @ (H @ x) + qp.g @ x + qp.f
    c_stat = jnp.asarray(np.where(act_c, sig_c, 0), jnp.int32)
    b_stat = jnp.asarray(np.where(act_b, sig_b, 0), jnp.int32)
    return QPAInfo(x=x, y=y, z=z, obj=obj, status=status, iter=it,
                   c_stat=c_stat, b_stat=b_stat)


def qpc_solve(qp: QP, ipm_ctl=None, qpa_ctl: QPAControl = QPAControl()):
    """QPC composite (reference src/qpc/qpc.f90): interior-point solve
    first, then an active-set clean-up warm-started from the IPM's
    active-set prediction — yields a basic ("crossed-over") solution."""
    from .ipm import IPMControl, ipm_solve

    ipm_ctl = ipm_ctl or IPMControl()
    x, y, z, st = ipm_solve(qp, ipm_ctl)

    # IPM indicator: primal distance to bound vs dual magnitude
    masks = classify_bounds(qp, qpa_ctl.infinity)
    tol = 1e-6
    on_lo = (jnp.abs(x - qp.x_l) < tol) & masks.has_xl
    on_hi = (jnp.abs(qp.x_u - x) < tol) & masks.has_xu
    b_stat0 = jnp.where(on_lo, -1, jnp.where(on_hi, 1, 0))
    if qp.m:
        c = qp.Ax(x)
        on_cl = (jnp.abs(c - qp.c_l) < tol) & masks.has_cl
        on_cu = (jnp.abs(qp.c_u - c) < tol) & masks.has_cu
        c_stat0 = jnp.where(on_cl, -1, jnp.where(on_cu, 1, 0))
    else:
        c_stat0 = jnp.zeros(0, jnp.int32)
    return qpa_solve(qp, x0=x, c_stat0=c_stat0, b_stat0=b_stat0, ctl=qpa_ctl)
