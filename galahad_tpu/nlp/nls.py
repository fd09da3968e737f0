"""Nonlinear least squares by adaptive regularization (NLS).

TPU-native re-design of GALAHAD's NLS (reference src/nls/nls.f90:
NLS_solve :1287; the 8 model variants :115-123; regularization norms
:125-137; weight-update strategies :144-148; Gauss-Newton-to-Newton
switch :3118 at norm_g < switch_to_newton).  Here:

  min_x  1/2 ||r(x)||^2     for a jax-traceable residual r: R^n -> R^m

Model menu (reference model codes in parentheses):
  * "first_order" (1):     H = 0 — regularized steepest descent.
  * "diagonal" (2):        H = I — barely second order.
  * "gauss_newton" (3):    H = J'J via one MXU matmul (the BSC
                           normal-equations assembly, bsc.f90:372).
  * "newton" (4):          H = J'J + sum_i r_i Hess r_i (jax.hessian).
  * "gauss_to_newton" (5): Gauss-Newton until ||g|| < switch_to_newton,
                           then Newton (nls.f90:3118).
  * "tensor_gauss_newton" (6) / "tensor_newton" (7) /
    "tensor_gauss_to_newton" (8): step obtained by (approximately)
    minimizing the regularized TENSOR model
        1/2 || r + J s + 1/2 D^2r(x)[s,s] ||^2 + (sigma/p)||s||^p
    with a fixed-length inner Gauss-Newton (6, 8) or Newton (7) loop.
    The tensor residual T(s) is quadratic in s, so its s-Jacobian is
    J + D^2r[s,.] (one jvp tower) and its s-Hessian is exactly
    D^2r(x) — no third derivatives, matching the reference's inner
    NLS_subproblem recursion (nls.f90:213-217) without the recursion.

Regularization norm (||v||_S, reference codes): "euclidean" (-1),
"diagonal_jtj" (1), "diagonal_hessian" (2), "band" (3) — all passed as
the M matrix of the eigen-secular RQS solver.

Weight updates: "basic" (1), "zero_reset" (2: very-successful steps
reset the weight to ~0, nls.f90:2703), "imitate_tr" (3), "increase" (4).

All fully jittable: lax.while_loop outer, lax.fori_loop inner.
"""
from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from ..core.status import Status
from ..tr.trs import rqs_solve
from .tru import TRUState

_TENSOR_MODELS = ("tensor_gauss_newton", "tensor_newton",
                  "tensor_gauss_to_newton")


@control_dc
class NLSControl:
    """Mirrors NLS_control_type defaults where meaningful
    (reference src/nls/nls.f90 controls; model :213-217)."""

    maxit: int = 100
    initial_weight: float = 1.0
    minimum_weight: float = 1.0e-16
    weight_zero: float = 1.0e-14       # zero-reset target (~epsmch)
    stop_g_absolute: float = 1.0e-6
    stop_g_relative: float = 1.0e-8
    stop_c_absolute: float = 1.0e-12   # stop when ||r||^2 below this
    eta_successful: float = 1.0e-2
    eta_very_successful: float = 0.9
    weight_decrease: float = 0.5
    weight_increase: float = 2.0
    power: float = 3.0
    model: str = "gauss_newton"
    # "first_order" | "diagonal" | "gauss_newton" | "newton" |
    # "gauss_to_newton" | "tensor_gauss_newton" | "tensor_newton" |
    # "tensor_gauss_to_newton"
    norm: str = "euclidean"
    # "euclidean" | "diagonal_jtj" | "diagonal_hessian" | "band"
    semi_bandwidth: int = 5            # for norm="band"
    min_diagonal: float = 1.0e-5       # PSLS_control%min_diagonal analogue
    switch_to_newton: float = 0.1      # nls.f90:320
    weight_update: str = "basic"
    # "basic" | "zero_reset" | "imitate_tr" | "increase"
    inner_its: int = 4                 # tensor-model inner iterations


def _reg_norm(ctl: NLSControl, J, Hfull):
    """The S matrix of the regularization norm (None = identity)."""
    if ctl.norm == "euclidean":
        return None
    if ctl.norm == "diagonal_jtj":
        d = jnp.maximum(jnp.sum(J * J, axis=0), ctl.min_diagonal)
        return jnp.diag(d)
    if ctl.norm == "diagonal_hessian":
        d = jnp.maximum(jnp.diagonal(Hfull), ctl.min_diagonal)
        return jnp.diag(d)
    if ctl.norm == "band":
        n = Hfull.shape[0]
        i = jnp.arange(n)
        band = jnp.abs(i[:, None] - i[None, :]) <= ctl.semi_bandwidth
        S = jnp.where(band, Hfull, 0.0)
        # definite safeguard: shift by the most negative Gershgorin bound
        off = jnp.sum(jnp.abs(S), axis=1) - jnp.abs(jnp.diagonal(S))
        shift = jnp.maximum(
            jnp.max(off - jnp.diagonal(S)), 0.0) + ctl.min_diagonal
        return S + shift * jnp.eye(n, dtype=S.dtype)
    raise ValueError(f"unknown regularization norm '{ctl.norm}'")


def _tensor_step(residual, x, r, J, sigma, p, ctl: NLSControl, newton):
    """Approximate minimizer of the regularized tensor model by a
    fixed-length inner GN/Newton loop (reference models 6-8)."""
    n = x.shape[0]
    dt = x.dtype

    def T(s):
        # r(x) + J s + 1/2 D^2 r(x)[s, s] via one jvp tower
        _, Hss = jax.jvp(
            lambda xx: jax.jvp(residual, (xx,), (s,))[1], (x,), (s,))
        return r + J @ s + 0.5 * Hss

    def phi(s):
        t = T(s)
        return 0.5 * jnp.sum(t * t) + (sigma / p) * jnp.linalg.norm(s) ** p

    def inner(k, carry):
        del k
        s, best = carry
        t = T(s)
        JT = jax.jacfwd(T)(s)          # J + D^2 r[s, .]
        g_in = JT.T @ t
        H_in = JT.T @ JT
        if newton is not False:
            # s-Hessian of 1/2||T||^2 = JT'JT + sum_i T_i D^2 r_i;
            # D^2 r_i is the x-Hessian of r_i (T is quadratic in s).
            # `newton` may be a traced bool (model 8's armed switch).
            Hw = jax.hessian(lambda xx: t @ residual(xx))(x)
            H_in = H_in + jnp.asarray(newton, H_in.dtype) * Hw
        sub = rqs_solve(H_in, g_in, sigma, p=p)
        s_try = s + sub.x
        better = phi(s_try) < best
        s = jnp.where(better, s_try, s)
        best = jnp.minimum(phi(s_try), best)
        return s, best

    s0 = jnp.zeros(n, dt)
    s, _ = lax.fori_loop(0, ctl.inner_its, inner, (s0, phi(s0)))
    return s


def nls_solve(residual: Callable, x0, ctl: NLSControl = NLSControl()):
    """Minimize 1/2||r(x)||^2.  Fully jittable.  Returns TRUState
    (f = 1/2||r||^2, g = J'r, radius = current weight sigma)."""
    x0 = jnp.asarray(x0)
    dt = x0.dtype
    p = ctl.power

    def obj(x):
        r = residual(x)
        return 0.5 * jnp.sum(r * r)

    def full_hess(x):
        return jax.hessian(obj)(x)

    r0 = residual(x0)
    J0 = jax.jacfwd(residual)(x0)
    g0 = J0.T @ r0
    ng0 = jnp.linalg.norm(g0)
    stop_g = jnp.maximum(ctl.stop_g_absolute, ctl.stop_g_relative * ng0)

    st0 = TRUState(
        x=x0, f=0.5 * jnp.sum(r0 * r0), g=g0,
        radius=jnp.asarray(ctl.initial_weight, dt),
        iter=jnp.array(0, jnp.int32),
        converged=(ng0 <= stop_g),
        status=jnp.where(ng0 <= stop_g, int(Status.OK),
                         int(Status.MAX_ITERATIONS)).astype(jnp.int32),
        norm_g=ng0,
    )
    # newton_on: active for pure-Newton; armed later by the transitions
    newton0 = jnp.asarray(ctl.model in ("newton", "tensor_newton"), bool)

    def cond(carry):
        st, _ = carry
        return (~st.converged) & (st.iter < ctl.maxit)

    def body(carry):
        st, newton_on = carry
        sigma = st.radius
        r = residual(st.x)
        J = jax.jacfwd(residual)(st.x)
        g = J.T @ r
        gn = J.T @ J

        if ctl.model in _TENSOR_MODELS:
            if ctl.model == "tensor_newton":
                use_newton = True
            elif ctl.model == "tensor_gauss_to_newton":
                use_newton = newton_on       # traced: armed by the switch
            else:
                use_newton = False
            s = _tensor_step(residual, st.x, r, J, sigma, p, ctl,
                             newton=use_newton)
            # model value for the ratio test: the tensor model itself
            _, Hss = jax.jvp(
                lambda xx: jax.jvp(residual, (xx,), (s,))[1], (st.x,), (s,))
            t = r + J @ s + 0.5 * Hss
            pred = st.f - 0.5 * jnp.sum(t * t)
            norm_s = jnp.linalg.norm(s)
        else:
            if ctl.model == "first_order":
                H = jnp.zeros_like(gn)
            elif ctl.model == "diagonal":
                H = jnp.eye(st.x.shape[0], dtype=dt)
            elif ctl.model == "newton":
                H = full_hess(st.x)
            elif ctl.model == "gauss_to_newton":
                H = jnp.where(newton_on, full_hess(st.x), gn)
            else:  # gauss_newton
                H = gn
            S = _reg_norm(ctl, J, H)
            sub = rqs_solve(H, g, sigma, p=p, M=S)
            s = sub.x
            pred = -(sub.obj - (sigma / p) * sub.norm_x ** p)
            norm_s = sub.norm_x

        f_trial = obj(st.x + s)
        tiny = jnp.finfo(dt).tiny
        ratio = (st.f - f_trial) / jnp.maximum(pred, tiny)
        success = ratio >= ctl.eta_successful
        very = ratio >= ctl.eta_very_successful

        x = jnp.where(success, st.x + s, st.x)
        f = jnp.where(success, f_trial, st.f)
        r_new = residual(x)
        J_new = jax.jacfwd(residual)(x)
        g_new = J_new.T @ r_new

        if ctl.weight_update == "zero_reset":
            sigma = jnp.where(
                very, jnp.asarray(ctl.weight_zero, dt),
                jnp.where(success, sigma, ctl.weight_increase * sigma))
        elif ctl.weight_update == "imitate_tr":
            # TR-style: grow the implied radius ~ ||s|| on very successful
            sigma = jnp.where(
                very,
                jnp.maximum(ctl.minimum_weight,
                            jnp.minimum(ctl.weight_decrease * sigma,
                                        sigma / jnp.maximum(norm_s, 1.0))),
                jnp.where(success, sigma, ctl.weight_increase * sigma))
        elif ctl.weight_update == "increase":
            sigma = jnp.where(success, sigma, ctl.weight_increase * sigma)
        else:  # basic
            sigma = jnp.where(
                very,
                jnp.maximum(ctl.minimum_weight,
                            ctl.weight_decrease * sigma),
                jnp.where(success, sigma, ctl.weight_increase * sigma))

        ng = jnp.linalg.norm(g_new)
        if ctl.model in ("gauss_to_newton", "tensor_gauss_to_newton"):
            newton_on = newton_on | (ng < ctl.switch_to_newton)
        conv = (ng <= stop_g) | (f <= ctl.stop_c_absolute)
        return TRUState(
            x=x, f=f, g=g_new, radius=sigma, iter=st.iter + 1,
            converged=conv,
            status=jnp.where(conv, int(Status.OK),
                             int(Status.MAX_ITERATIONS)).astype(jnp.int32),
            norm_g=ng,
        ), newton_on

    st, _ = lax.while_loop(cond, body, (st0, newton0))
    return st


def nls_solve_sparse(residual: Callable, jac_vals: Callable, j_pat,
                     x0, ctl: NLSControl = NLSControl()):
    """Sparse Gauss-Newton NLS: minimize 1/2||r(x)||^2 with a SPARSE
    Jacobian given as (pattern, value-callback) — the reference's
    eval_J contract (src/nls/nls.f90 J%row/J%col/J%val callbacks).
    Nothing is densified: the normal matrix J'J is assembled on its
    analysed sparse pattern (linalg/bsc.bsc_analyse — BSC_form,
    reference src/bsc/bsc.f90:372) and the regularized system
    (J'J + sigma I) s = -g is factorized by the flat supernodal LDL^T
    (analyse once, numeric per iteration).  Host loop + jitted
    segments; suitable for m ~ 1e4+ residuals.

    jac_vals(x) -> (nnz,) Jacobian values aligned with j_pat (COO).
    Returns TRUState (f = 1/2||r||^2, g = J'r, radius = sigma)."""
    import numpy as np

    from ..core.sparse import COOPattern
    from ..linalg.bsc import bsc_analyse, bsc_form_sparse
    from ..linalg.supernodal_flat import flat_analyse, flat_factorize, \
        flat_solve

    x = jnp.asarray(x0)
    dt = x.dtype
    n = x.shape[0]
    jr = jnp.asarray(np.asarray(j_pat.rows), jnp.int32)
    jc = jnp.asarray(np.asarray(j_pat.cols), jnp.int32)
    # J'J = (J') D (J')' with A := J' (n, m): transpose the pattern
    jt_pat = COOPattern(j_pat.cols, j_pat.rows, j_pat.n, j_pat.m)
    bplan = bsc_analyse(jt_pat)
    sp = bplan.s_pat
    # aggressive amalgamation: GN patterns are often long/thin; bigger
    # supernodes keep the level count (and compile size) down.  For
    # strictly BANDED J'J prefer qp/ipm_banded's O(n b^2) path instead.
    splan = flat_analyse(np.asarray(sp.rows), np.asarray(sp.cols), n,
                         order="amd", relax_cols=32)

    @jax.jit
    def eval_all(x):
        r = residual(x)
        jv = jnp.asarray(jac_vals(x), dt)
        g = jnp.zeros(n, dt).at[jc].add(jv * r[jr])
        return r, jv, g, 0.5 * jnp.sum(r * r)

    r, jv, g, f = eval_all(x)
    ng0 = float(jnp.linalg.norm(g))
    stop_g = max(ctl.stop_g_absolute, ctl.stop_g_relative * ng0)
    sigma = float(ctl.initial_weight)
    status = int(Status.MAX_ITERATIONS)
    it = 0
    for it in range(1, ctl.maxit + 1):
        if float(jnp.linalg.norm(g)) <= stop_g:
            status = int(Status.OK)
            break
        svals = bsc_form_sparse(bplan, jv)
        fac = flat_factorize(splan, svals, shift=sigma)
        s = flat_solve(splan, fac, -g)
        xt = x + s
        rt, jvt, gt, ft = eval_all(xt)
        pred = -(jnp.vdot(g, s) + 0.5 * jnp.vdot(s, -g - sigma * s))
        rho = float((f - ft) / jnp.maximum(pred, 1e-30))
        if rho >= ctl.eta_successful:
            x, r, jv, g, f = xt, rt, jvt, gt, ft
            if rho >= ctl.eta_very_successful:
                sigma = max(sigma * ctl.weight_decrease, 1e-12)
        else:
            sigma = sigma * ctl.weight_increase
    converged = status == int(Status.OK)
    return TRUState(
        x=x, f=f, g=g, radius=jnp.asarray(sigma, dt),
        iter=jnp.asarray(it, jnp.int32),
        converged=jnp.asarray(converged),
        status=jnp.asarray(status, jnp.int32),
        norm_g=jnp.linalg.norm(g))
