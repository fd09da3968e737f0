"""Nonconvex QP by an interior-point trust-region (Levenberg) method.

TPU-native re-design of GALAHAD's QPB (reference src/qpb/qpb.f90:
QPB_solve :1247 — barrier subproblems for general QPs with possibly
indefinite H, inner iterations trust-region constrained, inner systems
through SBLS).

TPU redesign.  The reference controls nonconvexity with an explicit
trust region whose subproblem GLTR solves by Lanczos; the equivalent
device-friendly mechanism is *Levenberg damping*: the barrier Newton
system
    [[H + D_bar + sigma I, A'], [A, 0]] [d; -y] = [-g_mu; -r_p]
is factorized by linalg/sbls.py, whose shifted Cholesky automatically
escalates sigma until the (1,1) block is positive definite — the same
lambda >= -lambda_min(H) shift the TRS secular iteration would find,
computed by refactorization exactly as TRS does (trs.f90:2260-2337).
A rejected step raises sigma further (radius shrink); acceptance is by
an Armijo test on the barrier merit.  Every heavy op is a fixed-shape
jitted kernel; the outer mu loop runs on the host.

Formulation: slack form v = [x; c] with A x - c = 0, barrier on all
finite bounds of v (the reference's formulation of the same systems).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP, classify_bounds
from ..core.status import Status
from ..linalg.sbls import sbls_factorize, sbls_solve


@control_dc
class QPBControl:
    """QPB_control_type equivalent (reference src/qpb/qpb.f90)."""

    maxit: int = 200
    mu_init: float = -1.0         # <0: from initial complementarity
    mu_reduce: float = 0.2
    stop_p: float = 1.0e-6
    stop_d: float = 1.0e-6
    stop_c: float = 1.0e-6
    sigma_init: float = 0.0
    sigma_grow: float = 10.0
    sigma_shrink: float = 0.3
    prfeas: float = 1.0
    tau: float = 0.9995           # fraction to boundary
    armijo: float = 1.0e-4
    infinity: float = INFINITY


@dataclasses.dataclass
class QPBInfo:
    x: Any
    y: Any
    z: Any
    obj: Any
    status: int
    iter: int
    res_p: Any
    res_d: Any
    res_c: Any


def qpb_solve(qp: QP, ctl: QPBControl = QPBControl()) -> QPBInfo:
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    nv = n + m
    from ..core.problem import check_qp

    bad = check_qp(qp, ctl.infinity)           # -3 / -4 entry contract
    if bad != 0:
        zn = jnp.zeros(n, dt)
        inf_ = jnp.asarray(jnp.inf, dt)
        return QPBInfo(x=zn, y=jnp.zeros(m, dt), z=zn,
                       obj=jnp.asarray(jnp.nan, dt), status=bad, iter=0,
                       res_p=inf_, res_d=inf_, res_c=inf_)
    masks = classify_bounds(qp, ctl.infinity)

    # --- slack-form bounds and masks over v = [x; c] ---
    lo = jnp.concatenate([qp.x_l, qp.c_l]) if m else qp.x_l
    hi = jnp.concatenate([qp.x_u, qp.c_u]) if m else qp.x_u
    has_lo = jnp.concatenate([masks.has_xl, masks.has_cl]) if m else masks.has_xl
    has_hi = jnp.concatenate([masks.has_xu, masks.has_cu]) if m else masks.has_xu
    fixed = jnp.concatenate(
        [masks.x_fixed, masks.c_equality]) if m else masks.x_fixed
    ml = has_lo & ~fixed
    mh = has_hi & ~fixed

    H = qp.H_dense()
    E = jnp.concatenate([qp.A, -jnp.eye(m, dtype=dt)], axis=1) \
        if m else jnp.zeros((0, n), dt)

    def q_obj(v):
        x = v[:n]
        return 0.5 * x @ (H @ x) + qp.g @ x

    def q_grad(v):
        x = v[:n]
        return jnp.concatenate([H @ x + qp.g, jnp.zeros(m, dt)])

    # --- interior start ---
    x0 = qp.x if qp.x is not None else jnp.zeros(n, dt)
    v = jnp.concatenate([x0, qp.Ax(x0)]) if m else x0
    gap = jnp.where(has_lo & has_hi, hi - lo, jnp.inf)
    xi = jnp.minimum(jnp.asarray(ctl.prfeas, dt), 0.4999 * gap)
    v = jnp.where(ml | fixed, jnp.maximum(v, lo + jnp.where(fixed, 0.0, xi)), v)
    v = jnp.where(mh, jnp.minimum(v, hi - xi), v)
    v = jnp.where(fixed, lo, v)

    def dists(v):
        s_l = jnp.where(ml, v - lo, 1.0)
        s_u = jnp.where(mh, hi - v, 1.0)
        return s_l, s_u

    def barrier_merit(v, mu, pen):
        s_l, s_u = dists(v)
        bar = -mu * (jnp.sum(jnp.where(ml, jnp.log(jnp.maximum(s_l, 1e-300)), 0.0))
                     + jnp.sum(jnp.where(mh, jnp.log(jnp.maximum(s_u, 1e-300)), 0.0)))
        res = jnp.sum(jnp.abs(E @ v)) if m else 0.0
        return q_obj(v) + bar + pen * res

    @jax.jit
    def step(v, mu, sigma, pen):
        s_l, s_u = dists(v)
        g_bar = -mu * (jnp.where(ml, 1.0 / s_l, 0.0)
                       - jnp.where(mh, 1.0 / s_u, 0.0))
        d_bar = mu * (jnp.where(ml, 1.0 / s_l ** 2, 0.0)
                      + jnp.where(mh, 1.0 / s_u ** 2, 0.0))
        g_mu = q_grad(v) + g_bar
        g_mu = jnp.where(fixed, 0.0, g_mu)

        Hv = jnp.zeros((nv, nv), dt).at[:n, :n].set(H)
        B = Hv + jnp.diag(d_bar + sigma + jnp.where(fixed, 1.0 / 1e-12, 0.0))
        if m:
            r_p = E @ v
            f = sbls_factorize(B, E, jnp.zeros(m, dt), rho=0.0, delta=1e-10)
            d, w = sbls_solve(f, -g_mu, -r_p, apply_G=lambda u: B @ u,
                              refine=1)
            y = -w
        else:
            from ..linalg.cholesky import chol_factor_shifted, chol_solve
            L, _, _ = chol_factor_shifted(B, 0.0)
            d = chol_solve(L, -g_mu)
            y = jnp.zeros(0, dt)
        d = jnp.where(fixed, 0.0, d)

        # fraction to boundary
        tau = jnp.asarray(ctl.tau, dt)
        neg = ml & (d < 0)
        a1 = jnp.min(jnp.where(neg, -tau * s_l / jnp.where(neg, d, -1.0),
                               jnp.inf), initial=jnp.inf)
        pos = mh & (d > 0)
        a2 = jnp.min(jnp.where(pos, tau * s_u / jnp.where(pos, d, 1.0),
                               jnp.inf), initial=jnp.inf)
        alpha = jnp.minimum(jnp.asarray(1.0, dt), jnp.minimum(a1, a2))

        phi0 = barrier_merit(v, mu, pen)
        slope = g_mu @ d - (pen * jnp.sum(jnp.abs(E @ v)) if m else 0.0)

        # backtracking Armijo (fixed unrolled trials, jit-friendly)
        def try_alpha(a):
            return barrier_merit(v + a * d, mu, pen)

        accept = jnp.asarray(False)
        a_used = alpha
        vn = v
        for k in range(8):
            a = alpha * (0.5 ** k)
            phi1 = try_alpha(a)
            good = (~accept) & (phi1 <= phi0 + ctl.armijo * a * slope)
            vn = jnp.where(good, v + a * d, vn)
            a_used = jnp.where(good, a, a_used)
            accept = accept | good

        # KKT residuals at the new point
        s_l2, s_u2 = dists(vn)
        z_l = jnp.where(ml, mu / s_l2, 0.0)
        z_u = jnp.where(mh, mu / s_u2, 0.0)
        g_new = q_grad(vn) - (E.T @ y if m else 0.0) - (z_l - z_u)
        g_new = jnp.where(fixed, 0.0, g_new)
        res_d = jnp.max(jnp.abs(g_new))
        res_p = jnp.max(jnp.abs(E @ vn), initial=0.0) if m else jnp.asarray(0.0, dt)
        return vn, y, accept, res_d, res_p

    mu = jnp.asarray(1.0 if ctl.mu_init <= 0 else ctl.mu_init, dt)
    sigma = ctl.sigma_init
    pen = 1.0e3
    y = jnp.zeros(m, dt)
    status = int(Status.MAX_ITERATIONS)
    it = 0
    for it in range(1, ctl.maxit + 1):
        v_new, y_new, accept, res_d, res_p = step(
            v, mu, jnp.asarray(sigma, dt), jnp.asarray(pen, dt))
        if bool(accept):
            v, y = v_new, y_new
            sigma = max(sigma * ctl.sigma_shrink, 0.0)
            if float(res_d) <= max(10.0 * float(mu), ctl.stop_d):
                mu = mu * ctl.mu_reduce
        else:
            sigma = max(sigma * ctl.sigma_grow, 1e-8)
            if sigma > 1e12:
                # stalled: if the ACCEPTED iterate (v with its accepted
                # multiplier y — not the rejected trial's y) already
                # satisfies the stopping tolerances at a small barrier
                # parameter, this is a successful exit, not a failure
                # (the reference also accepts optimal-but-unimprovable
                # points, qpb.f90)
                s_l0, s_u0 = dists(v)
                zf = (jnp.where(ml, mu / s_l0, 0.0)
                      - jnp.where(mh, mu / s_u0, 0.0))
                rr = q_grad(v) - (E.T @ y if m else 0.0) - zf
                # dual feasibility concerns the x-rows; the slack rows
                # carry y vs mu/s complementarity handled by res_c
                rd_t = float(jnp.max(jnp.abs(
                    jnp.where(fixed, 0.0, rr)[:n])))
                rp_t = (float(jnp.max(jnp.abs(E @ v), initial=0.0))
                        if m else 0.0)
                if (float(mu) < 1e-5 and rd_t < ctl.stop_d
                        and rp_t < ctl.stop_p):
                    status = int(Status.OK)
                else:
                    status = int(Status.TINY_STEP)
                break
        if float(mu) < 1e-10 and float(res_d) < ctl.stop_d \
                and float(res_p) < ctl.stop_p:
            status = int(Status.OK)
            break

    x = v[:n]
    s_l, s_u = dists(v)
    z_full = (jnp.where(ml, mu / s_l, 0.0) - jnp.where(mh, mu / s_u, 0.0))
    z = z_full[:n]
    r = qp.Hx(x) + qp.g - (qp.Aty(y) if m else 0.0)
    z = jnp.where(masks.x_fixed, r, z)
    if m:
        ax = qp.Ax(x)
        res_p = jnp.max(jnp.maximum(ax - qp.c_u, 0.0)
                        + jnp.maximum(qp.c_l - ax, 0.0))
    else:
        res_p = jnp.asarray(0.0, dt)
    res_d = jnp.max(jnp.abs(jnp.where(masks.x_fixed, 0.0, r - z)))
    obj = q_obj(v) + qp.f
    return QPBInfo(x=x, y=y, z=z, obj=obj, status=status, iter=it,
                   res_p=res_p, res_d=res_d, res_c=mu)
