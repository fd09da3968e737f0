"""Crossover: interior-point solution -> basic (vertex-like) solution.

TPU-native re-design of GALAHAD's CRO (reference src/cro/cro.f90:
CRO_crossover_main :710 — given an IPM solution of a convex QP, reduce
the support of the multipliers to a linearly independent active set
while preserving the KKT conditions, using SLS+ULS+SBLS+SCU rank-one
updates).

Redesign: the reference's incremental SCU updating is replaced by one
pivoted-QR basis selection on the active constraint gradients
(linalg/uls.py: uls_find_basis — the same service MA48 provides it)
followed by a single least-squares multiplier recovery restricted to
that basis, then a sign-restoration sweep that drops wrong-signed
multipliers and re-solves.  Each re-solve is a fixed-shape masked
lstsq — MXU work — and the sweep converges in at most |active| drops.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP, classify_bounds
from ..core.status import Status
from ..linalg.uls import uls_find_basis


@control_dc
class CROControl:
    feas_tol: float = 1.0e-5      # activity detection tolerance (IPM
                                  # iterates sit O(stop_c/z) from bounds)
    sign_tol: float = 1.0e-9      # wrong-sign threshold
    max_sweeps: int = 50
    infinity: float = INFINITY


@dataclasses.dataclass
class CROInfo:
    x: Any
    y: Any
    z: Any
    c_stat: Any
    b_stat: Any
    status: int
    dependent: int      # active constraints dropped as dependent


def cro_crossover(qp: QP, x, y, z, ctl: CROControl = CROControl()) -> CROInfo:
    """Purify (x, y, z): keep x, rebuild (y, z) supported on a linearly
    independent subset of the active constraints with correct signs.
    Returns C_stat/B_stat activity flags (the reference's output
    contract, cro.f90:710 argument list)."""
    masks = classify_bounds(qp, ctl.infinity)
    n, m = qp.n, qp.m
    xh = np.asarray(x, np.float64)
    dt = qp.g.dtype

    # --- activity detection by the primal-dual indicator (reference
    # CQP_indicators, cqp.f90:9885: a bound is active when its dual
    # magnitude dominates the primal distance) plus an absolute
    # tolerance for exactly-attained bounds. ---
    zh = np.asarray(z, np.float64) if z is not None else np.zeros(n)
    yh = np.asarray(y, np.float64) if (y is not None and m) else np.zeros(m)
    xl = np.asarray(qp.x_l); xu = np.asarray(qp.x_u)
    on_lo = np.asarray(masks.has_xl) & (
        (xh - xl <= ctl.feas_tol * (1 + np.abs(xl)))
        | (np.maximum(zh, 0.0) > xh - xl))
    on_hi = np.asarray(masks.has_xu) & (
        (xu - xh <= ctl.feas_tol * (1 + np.abs(xu)))
        | (np.maximum(-zh, 0.0) > xu - xh))
    b_sig = np.where(on_lo, -1, np.where(on_hi, 1, 0)).astype(np.int8)
    if m:
        ch = np.asarray(qp.Ax(jnp.asarray(xh, dt)), np.float64)
        cl = np.asarray(qp.c_l); cu = np.asarray(qp.c_u)
        eq = np.asarray(masks.c_equality)
        on_cl = np.asarray(masks.has_cl) & (
            (ch - cl <= ctl.feas_tol * (1 + np.abs(cl)))
            | (np.maximum(yh, 0.0) > ch - cl))
        on_cu = np.asarray(masks.has_cu) & (
            (cu - ch <= ctl.feas_tol * (1 + np.abs(cu)))
            | (np.maximum(-yh, 0.0) > cu - ch))
        c_sig = np.where(eq | on_cl, -1, np.where(on_cu, 1, 0)).astype(np.int8)
    else:
        c_sig = np.zeros(0, np.int8)
        eq = np.zeros(0, bool)

    A = np.asarray(qp.A, np.float64) if m else np.zeros((0, n))

    # --- snap x onto the detected active set (the reference moves x to
    # satisfy the active constraints exactly while preserving KKT,
    # cro.f90 crossover main): bounds are set exactly; active general
    # constraints are restored by a minimum-norm correction on the
    # remaining degrees of freedom. ---
    xh = np.where(b_sig < 0, xl, np.where(b_sig > 0, xu, xh))
    act_c0 = np.nonzero(c_sig != 0)[0]
    if act_c0.size:
        target = np.where(c_sig[act_c0] < 0, np.asarray(qp.c_l)[act_c0],
                          np.asarray(qp.c_u)[act_c0])
        free = b_sig == 0
        r_act = target - A[act_c0] @ xh
        if free.any():
            corr, *_ = np.linalg.lstsq(A[np.ix_(act_c0, np.nonzero(free)[0])],
                                       r_act, rcond=None)
            xh[free] += corr

    # the min-norm correction may push "free" variables outside their
    # own box: re-project onto [x_l, x_u] and flag if the active general
    # constraints can then no longer be met (cro.f90 keeps all iterates
    # primal feasible throughout the crossover)
    purify_failed = False
    finite_lo = np.asarray(masks.has_xl)
    finite_hi = np.asarray(masks.has_xu)
    out_lo = finite_lo & (xh < xl - ctl.feas_tol * (1 + np.abs(xl)))
    out_hi = finite_hi & (xh > xu + ctl.feas_tol * (1 + np.abs(xu)))
    if out_lo.any() or out_hi.any():
        xh = np.where(finite_lo, np.maximum(xh, xl), xh)
        xh = np.where(finite_hi, np.minimum(xh, xu), xh)
        if act_c0.size:
            resid = np.abs(target - A[act_c0] @ xh)
            if resid.max(initial=0.0) > ctl.feas_tol * (
                    1 + np.abs(target).max(initial=0.0)):
                purify_failed = True

    Hx_g = np.asarray(qp.Hx(jnp.asarray(xh, dt)) + qp.g, np.float64)

    dependent = 0
    status = int(Status.TINY_STEP) if purify_failed else int(Status.OK)
    for _ in range(ctl.max_sweeps):
        act_c = np.nonzero(c_sig != 0)[0]
        act_b = np.nonzero(b_sig != 0)[0]
        # gradient matrix of active constraints: rows of A and unit rows
        G_T = np.concatenate(
            [A[act_c].T, np.eye(n)[:, act_b]], axis=1)  # (n, k)
        k = G_T.shape[1]
        if k == 0:
            y_new = np.zeros(m)
            z_new = np.zeros(n)
            break
        # independent subset (CRO's dependency removal, cro.f90 uses
        # ULS threshold pivoting for the same purpose): uls_find_basis
        # selects independent columns, so hand it G_T directly.
        basic, _, rank = uls_find_basis(G_T, tol=1e-10)
        keep = np.zeros(k, bool)
        keep[basic] = True
        dependent += int(k - rank)

        # KKT: G_keep * w = Hx + g  (least squares on the kept support)
        Gk = G_T[:, keep]
        w, *_ = np.linalg.lstsq(Gk, Hx_g, rcond=None)
        full_w = np.zeros(k)
        full_w[keep] = w

        y_new = np.zeros(m)
        y_new[act_c] = full_w[:len(act_c)]
        z_new = np.zeros(n)
        z_new[act_b] = full_w[len(act_c):]

        # sign check: lower-active want multiplier >= 0, upper-active <= 0
        bad = False
        for i in act_c:
            if eq[i]:
                continue
            v = y_new[i] * (1 if c_sig[i] < 0 else -1)
            if v < -ctl.sign_tol:
                c_sig[i] = 0
                bad = True
        fixed = np.asarray(masks.x_fixed)
        for j in act_b:
            if fixed[j]:
                continue
            v = z_new[j] * (1 if b_sig[j] < 0 else -1)
            if v < -ctl.sign_tol:
                b_sig[j] = 0
                bad = True
        if not bad:
            break
    else:
        status = int(Status.MAX_ITERATIONS)

    return CROInfo(
        x=jnp.asarray(xh, dt),
        y=jnp.asarray(y_new, dt),
        z=jnp.asarray(z_new, dt),
        c_stat=jnp.asarray(c_sig, jnp.int32),
        b_stat=jnp.asarray(b_sig, jnp.int32),
        status=status,
        dependent=dependent,
    )
