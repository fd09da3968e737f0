"""Primal-dual interior-point method for convex QP / LP.

TPU-native re-design of GALAHAD's CQP / LPB / BQPB family
(reference src/cqp/cqp.f90: CQP_solve :1178, CQP_solve_main :2967;
src/lpb/lpb.f90; src/bqpb/bqpb.f90).  The algorithm follows the same
infeasible primal-dual framework (explicit slack variable c with
two-sided bounds, z = z_l - z_u, y = y_l - y_u conventions, Mehrotra
predictor-corrector = the reference's Zhang arc at Taylor order 2,
cqp.f90:194-205) but the mechanics are rebuilt for XLA:

  * no QPP permutation into standard form — bound structure is boolean
    masks (core/problem.py), so one compiled program serves every
    problem of a given shape and batches of problems vmap;
  * the per-iteration KKT system
        [[H + D_x, A'], [A, -D_c^-1]] [dx; -dy] = [b1; b2]
    (reference cqp.f90:5950-5955) is solved by the Schur-complement
    double-Cholesky of linalg/sbls.py — MXU matmuls, no pivoting — with
    iterative refinement instead of dynamic pivoting;
  * the whole iteration is a pure jittable function, so the solver runs
    either as a host loop (single problem, early exit) or under
    lax.while_loop (vmapped batches, convergence masking).

Higher-order Taylor/Puiseux arcs (series_order up to 5, extra backsolves
on the same factors, cqp.f90:345-349) are provided by the corrector
loop (``control.series_order``).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP, BoundMasks, classify_bounds
from ..core.status import Status
from ..linalg.sbls import sbls_factorize, sbls_solve

BIG = 1.0e20


@control_dc
class IPMControl:
    """Mirrors CQP_control_type defaults where meaningful
    (reference src/cqp/cqp.f90:134-343)."""

    maxit: int = 200
    stop_abs_p: float = 1.0e-6
    stop_rel_p: float = 0.0
    stop_abs_d: float = 1.0e-6
    stop_rel_d: float = 0.0
    stop_abs_c: float = 1.0e-6
    stop_rel_c: float = 0.0
    prfeas: float = 1.0e2       # min initial distance from primal bounds
    dufeas: float = 1.0e2       # initial magnitude of dual variables
    rho: float = 0.0            # primal regularization (0 -> auto shift)
    delta: float = 1.0e-8       # dual regularization on equality rows
    refine: int = 2             # iterative-refinement sweeps per solve
    steps_per_fetch: int = 1    # iterations per device dispatch: > 1
                                # runs a lax.while_loop of up to this
                                # many steps between host monitor
                                # fetches (remote backends: each fetch
                                # costs ~30 ms and each dispatch has
                                # fixed overhead; the flagship bench
                                # uses 4).  Monitoring/checkpoint
                                # granularity coarsens accordingly.
    tau: float = 0.995          # fraction-to-boundary factor
    series_order: int = 2       # 1 = pure Newton, 2 = Mehrotra PC, 3+ extra correctors
    arc: str = "mehrotra"       # "mehrotra" | "taylor" (Zhang arc) |
                                # "puiseux" (Zhang-Puiseux, (1-a)^2 path) |
                                # "zhao_sun" (ZS center-pulling arc) —
                                # series order <= 4 with ROOTS step lengths
                                # (reference cqp.f90:194-205, 345-349,
                                # 4356-4365, 8996)
    print_level: int = 0        # >= 1: one line per iteration on stdout
                                # (the reference's printi/printt logging,
                                # cqp.f90:2926 "Iter p-feas d-feas ...")
    mu_min_factor: float = 1.0e-12
    mu_target: float = 0.0      # > 0: stop the barrier AT this value and
                                # converge to a mu-centered point (the WCP
                                # mode, reference src/wcp/wcp.f90:935)
    gamma_c: float = 0.1        # centrality band [gamma*mu_t, mu_t/gamma]
                                # (WCP's gamma_c0 control)
    infeas_max: int = 10        # consecutive non-improving iterations before
                                # declaring infeasibility (cqp.f90:163-168)
    indicator_type: str = "pd_ratio"   # 'primal' | 'pd_ratio' | 'tapia'
                                # (CQP_indicators, cqp.f90:9885 + controls
                                # :189-213)
    indicator_tol_p: float = 1.0e-5    # primal-distance activity cutoff
    indicator_tol_pd: float = 1.0      # dual/primal magnitude ratio cutoff
    indicator_tol_tapia: float = 0.9   # Tapia iterate-ratio cutoff
    reduce_infeas: float = 0.98  # required per-iteration infeasibility factor
    clock_time_limit: float = -1.0  # wall seconds; < 0 = no limit (cqp.f90:311-317)
    infinity: float = INFINITY
    dtype: str = "float64"
    endgame_f64: bool = True    # f32 sparse solves: when the dual
                                # residual floors above stop_abs_d with
                                # primal/comp already converged, fold the
                                # double-word iterate into f64 and take a
                                # few f64 'island' iterations (SURVEY
                                # §7.1: 'f32 with f64 islands'; measured:
                                # ONE island step closes a 5e-6 -> 1e-6
                                # gap).  No-op when the backend lacks f64.


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "c", "y", "z_l", "z_u", "y_l", "y_u",
                 "x_lo", "c_lo", "y_lo", "zl_lo", "zu_lo", "yl_lo", "yu_lo",
                 "s_l", "s_u", "t_l", "t_u", "mu",
                 "iter", "converged", "halt", "status",
                 "res_p", "res_d", "res_c", "best_infeas", "stall"],
    meta_fields=[],
)
@dataclasses.dataclass
class IPMState:
    x: Any
    c: Any
    y: Any            # (m,) full multiplier: y_l - y_u on inequality, free on equality
    z_l: Any
    z_u: Any
    y_l: Any
    y_u: Any
    x_lo: Any         # double-word low words of the iterate: the KKT
    c_lo: Any         # residual of an f32-rounded point is floored at
    y_lo: Any         # eps*|H||x| ~ 1e-6, so to CONVERGE below that on
    zl_lo: Any        # f32 hardware the iterate itself is carried as a
    zu_lo: Any        # (hi, lo) pair and residuals are evaluated against
    yl_lo: Any        # both words (Carson-Higham mixed-precision IR,
    yu_lo: Any        # linalg/dw.py; replaces the reference's fp64 path)
    s_l: Any          # carried bound distances x - x_l (DIST_X_l, the
    s_u: Any          # reference maintains these explicitly rather than
    t_l: Any          # recomputing x - x_l: near convergence the distance
    t_u: Any          # is far below one ulp OF X, so x_u - x would round
                      # to 0 in f32 and z/s -> inf; cqp.f90 state docs)
    mu: Any
    iter: Any
    converged: Any
    halt: Any         # stop the loop (success OR declared failure)
    status: Any
    res_p: Any
    res_d: Any
    res_c: Any
    best_infeas: Any  # best primal infeasibility so far (divergence guard)
    stall: Any        # consecutive non-improving iterations


def _safe_div(a, b, mask):
    return jnp.where(mask, a / jnp.where(mask, b, 1.0), 0.0)


def ipm_init(qp: QP, masks: BoundMasks, ctl: IPMControl) -> IPMState:
    """Strictly interior starting point (reference cqp.f90:242-250: move
    the user point at least prfeas/dufeas inside the bounds)."""
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    x0 = qp.x if qp.x is not None else jnp.zeros(n, dt)

    def interior(v, lo, hi, has_lo, has_hi, fixed, margin):
        gap = jnp.where(has_lo & has_hi, hi - lo, jnp.inf)
        xi = jnp.minimum(margin, 0.4999 * gap)
        v = jnp.where(has_lo, jnp.maximum(v, lo + xi), v)
        v = jnp.where(has_hi, jnp.minimum(v, hi - xi), v)
        return jnp.where(fixed, lo, v)

    margin = jnp.asarray(ctl.prfeas, dt)
    x = interior(x0, qp.x_l, qp.x_u, masks.has_xl, masks.has_xu,
                 masks.x_fixed, margin)
    if m > 0:
        c0 = qp.Ax(x)
        c = interior(c0, qp.c_l, qp.c_u, masks.has_cl, masks.has_cu,
                     masks.c_equality, margin)
    else:
        c = jnp.zeros((0,), dt)

    duf = jnp.asarray(ctl.dufeas, dt)
    z_l = jnp.where(masks.has_xl & ~masks.x_fixed, duf, 0.0)
    z_u = jnp.where(masks.has_xu & ~masks.x_fixed, duf, 0.0)
    y_l = jnp.where(masks.has_cl & ~masks.c_equality, duf, 0.0)
    y_u = jnp.where(masks.has_cu & ~masks.c_equality, duf, 0.0)
    y0 = qp.y if qp.y is not None else jnp.zeros(m, dt)
    y = jnp.where(masks.c_equality, y0, y_l - y_u)

    s_l, s_u, t_l, t_u = _distances(qp, masks, x, c)
    mu = _avg_complementarity(masks, s_l, s_u, t_l, t_u, z_l, z_u, y_l, y_u,
                              dt)
    inf = jnp.asarray(jnp.inf, dt)
    zn, zm = jnp.zeros_like(x), jnp.zeros_like(c)
    return IPMState(
        x=x, c=c, y=y, z_l=z_l, z_u=z_u, y_l=y_l, y_u=y_u,
        x_lo=zn, c_lo=zm, y_lo=zm, zl_lo=zn, zu_lo=zn, yl_lo=zm, yu_lo=zm,
        s_l=s_l, s_u=s_u, t_l=t_l, t_u=t_u, mu=mu,
        iter=jnp.array(0, jnp.int32),
        converged=jnp.array(False),
        halt=jnp.array(False),
        status=jnp.array(int(Status.MAX_ITERATIONS), jnp.int32),
        res_p=inf, res_d=inf, res_c=inf,
        best_infeas=inf, stall=jnp.array(0, jnp.int32),
    )


def _distances(qp: QP, masks: BoundMasks, x, c):
    s_l = jnp.where(masks.has_xl & ~masks.x_fixed, x - qp.x_l, 1.0)
    s_u = jnp.where(masks.has_xu & ~masks.x_fixed, qp.x_u - x, 1.0)
    t_l = jnp.where(masks.has_cl & ~masks.c_equality, c - qp.c_l, 1.0)
    t_u = jnp.where(masks.has_cu & ~masks.c_equality, qp.c_u - c, 1.0)
    return s_l, s_u, t_l, t_u


def _avg_complementarity(masks, s_l, s_u, t_l, t_u, z_l, z_u, y_l, y_u, dt):
    ml_x = masks.has_xl & ~masks.x_fixed
    mu_x = masks.has_xu & ~masks.x_fixed
    ml_c = masks.has_cl & ~masks.c_equality
    mu_c = masks.has_cu & ~masks.c_equality
    total = (
        jnp.sum(jnp.where(ml_x, z_l * s_l, 0.0))
        + jnp.sum(jnp.where(mu_x, z_u * s_u, 0.0))
        + jnp.sum(jnp.where(ml_c, y_l * t_l, 0.0))
        + jnp.sum(jnp.where(mu_c, y_u * t_u, 0.0))
    )
    count = (
        jnp.sum(ml_x) + jnp.sum(mu_x) + jnp.sum(ml_c) + jnp.sum(mu_c)
    ).astype(dt)
    return total / jnp.maximum(count, 1.0)


def _residual_vectors(qp: QP, masks: BoundMasks, st: IPMState):
    """Componentwise (r_d, r_p) evaluated against BOTH words of the
    double-word iterate (compensated, linalg/dw.py) so the measurement
    is faithful below the f32 floor (SURVEY §7.3)."""
    from ..linalg.dw import residual as dw_residual

    z = st.z_l - st.z_u
    z_lo = st.zl_lo - st.zu_lo
    if qp.m > 0:
        r_d = dw_residual(qp.Hx(st.x), -qp.g, z, qp.Aty(st.y),
                          -qp.Hx(st.x_lo), z_lo, qp.Aty(st.y_lo))
        r_p = dw_residual(qp.Ax(st.x), st.c, -qp.Ax(st.x_lo), st.c_lo)
    else:
        r_d = dw_residual(qp.Hx(st.x), -qp.g, z, -qp.Hx(st.x_lo), z_lo)
        r_p = jnp.zeros((0,), qp.g.dtype)
    r_d = jnp.where(masks.x_fixed, 0.0, r_d)
    return r_d, r_p


def _comp_inf(qp: QP, masks: BoundMasks, st: IPMState):
    """inf-norm of the complementarity products (carried distances)."""
    s_l, s_u, t_l, t_u = st.s_l, st.s_u, st.t_l, st.t_u
    comp = jnp.maximum(
        jnp.max(jnp.where(masks.has_xl & ~masks.x_fixed,
                          jnp.abs(st.z_l * s_l), 0.0), initial=0.0),
        jnp.max(jnp.where(masks.has_xu & ~masks.x_fixed,
                          jnp.abs(st.z_u * s_u), 0.0), initial=0.0),
    )
    if qp.m > 0:
        comp = jnp.maximum(
            comp,
            jnp.maximum(
                jnp.max(jnp.where(masks.has_cl & ~masks.c_equality,
                                  jnp.abs(st.y_l * t_l), 0.0), initial=0.0),
                jnp.max(jnp.where(masks.has_cu & ~masks.c_equality,
                                  jnp.abs(st.y_u * t_u), 0.0), initial=0.0),
            ),
        )
    return comp


def _residuals(qp: QP, masks: BoundMasks, st: IPMState):
    """(r_p, r_d, comp) inf-norms for the termination test
    (componentwise test, reference cqp.f90:4369-4385)."""
    r_d, r_p = _residual_vectors(qp, masks, st)
    res_p = jnp.max(jnp.abs(r_p), initial=0.0)
    res_d = jnp.max(jnp.abs(r_d))
    return res_p, res_d, _comp_inf(qp, masks, st)


def _fraction_to_boundary(v, dv, mask, tau, dtype):
    """max alpha <= 1 with v + alpha dv >= (1 - tau) v on masked entries."""
    neg = mask & (dv < 0)
    ratio = jnp.where(neg, -tau * v / jnp.where(neg, dv, -1.0), jnp.inf)
    return jnp.minimum(jnp.asarray(1.0, dtype), jnp.min(ratio, initial=jnp.inf))


def ipm_step(qp: QP, masks: BoundMasks, st: IPMState, ctl: IPMControl) -> IPMState:
    """One predictor-corrector iteration (pure function, jittable).

    Mirrors the body of CQP_solve_main (reference cqp.f90:2967+):
    barrier Hessian -> KKT factorize -> predictor solve -> corrector
    solve(s) on the same factors -> step -> update.
    """
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    tau = jnp.asarray(ctl.tau, dt)

    ml_x = masks.has_xl & ~masks.x_fixed
    mu_x = masks.has_xu & ~masks.x_fixed
    ml_c = masks.has_cl & ~masks.c_equality
    mu_c = masks.has_cu & ~masks.c_equality

    s_l, s_u, t_l, t_u = st.s_l, st.s_u, st.t_l, st.t_u
    z = st.z_l - st.z_u

    # --- barrier (primal-dual) diagonal terms (cqp.f90:4726-4740) ---
    D_x = (
        jnp.where(ml_x, st.z_l / s_l, 0.0)
        + jnp.where(mu_x, st.z_u / s_u, 0.0)
        + jnp.where(masks.x_fixed, BIG, 0.0)
    )
    if m > 0:
        D_c = jnp.where(ml_c, st.y_l / t_l, 0.0) + jnp.where(mu_c, st.y_u / t_u, 0.0)
        # (2,2) block of the augmented system: C = D_c^{-1}; equality rows 0,
        # vacuous (free) rows effectively infinite.
        C_diag = jnp.where(
            masks.c_equality, 0.0,
            jnp.where(masks.c_free, BIG, 1.0 / jnp.maximum(D_c, 1.0 / BIG)),
        )
    else:
        D_c = jnp.zeros((0,), dt)
        C_diag = jnp.zeros((0,), dt)

    # --- assemble & factorize (SBLS_form_and_factorize, cqp.f90:4781).
    # Structured problem types (BandedQP, ...) supply their own KKT
    # factorization through build_kkt; the dense default is SBLS's
    # Schur-complement double Cholesky.
    if hasattr(qp, "build_kkt"):
        kkt_solve = qp.build_kkt(D_x, C_diag, ctl)
    else:
        diag_G = qp.h_kind in ("zero", "diagonal", "identity",
                               "scaled_identity")
        if diag_G:
            G = qp.H_diag() + D_x
            apply_G = lambda v: G * v
        else:
            G = qp.H + jnp.diag(D_x)
            apply_G = lambda v: G @ v

        if m > 0:
            f = sbls_factorize(
                G, qp.A, C_diag, g_is_diag=diag_G,
                rho=ctl.rho, delta=ctl.delta,
            )

            def kkt_solve(b1, b2):
                dx, v = sbls_solve(f, b1, b2, apply_G=apply_G,
                                   refine=ctl.refine)
                return dx, -v  # system was in terms of -dy
        else:
            from ..linalg.cholesky import chol_factor_shifted, chol_solve

            if diag_G:
                def kkt_solve(b1, b2):
                    return b1 / G, b2
            else:
                L, _, _ = chol_factor_shifted(G, ctl.rho)

                def kkt_solve(b1, b2):
                    return chol_solve(L, b1), b2

    # --- residuals (dw-accurate: both words of the iterate enter, so
    # the Newton RHS keeps reducing the TRUE residual past the f32
    # representation floor) ---
    from ..linalg.dw import residual as _dw_res

    z_lo = st.zl_lo - st.zu_lo
    if m > 0:
        r_d = _dw_res(qp.Hx(st.x), -qp.g, z, qp.Aty(st.y),
                      -qp.Hx(st.x_lo), z_lo, qp.Aty(st.y_lo))
        r_p = _dw_res(qp.Ax(st.x), st.c, -qp.Ax(st.x_lo), st.c_lo)
    else:
        r_d = _dw_res(qp.Hx(st.x), -qp.g, z, -qp.Hx(st.x_lo), z_lo)
        r_p = jnp.zeros((0,), dt)
    r_d = jnp.where(masks.x_fixed, 0.0, r_d)

    def solve_direction(mu_target, corr, first=True, res_scale=1.0):
        """Newton direction for target complementarity mu_target with
        second-order correction terms ``corr`` (dicts of products).

        ``first=False`` computes a HIGHER-ORDER series coefficient: the
        linear (primal/dual) residuals are already removed by the
        order-1 term, so those RHS blocks are zero and only the
        complementarity convolution drives the solve (one extra
        backsolve on the same factors — reference cqp.f90:345-349).

        ``res_scale`` scales both the linear residuals and the SZ part
        of the complementarity base — the Puiseux arc's residual path
        (1-alpha)^2 puts 2x the residual at order 1 and 1x again at
        order 2 (reference cqp.f90:5058-5095)."""
        rs = jnp.asarray(res_scale, dt)
        base_l = mu_target - rs * st.z_l * s_l if first else mu_target
        base_u = mu_target - rs * st.z_u * s_u if first else mu_target
        r_cl = jnp.where(ml_x, base_l - corr["xl"], 0.0)
        r_cu = jnp.where(mu_x, base_u - corr["xu"], 0.0)
        rd_k = rs * r_d if first else jnp.zeros_like(r_d)
        b1 = -rd_k + _safe_div(r_cl, s_l, ml_x) - _safe_div(r_cu, s_u, mu_x)
        b1 = jnp.where(masks.x_fixed, 0.0, b1)
        if m > 0:
            rp_k = rs * r_p if first else jnp.zeros_like(r_p)
            base_tl = mu_target - rs * st.y_l * t_l if first else mu_target
            base_tu = mu_target - rs * st.y_u * t_u if first else mu_target
            r_tl = jnp.where(ml_c, base_tl - corr["cl"], 0.0)
            r_tu = jnp.where(mu_c, base_tu - corr["cu"], 0.0)
            w = _safe_div(r_tl, t_l, ml_c) - _safe_div(r_tu, t_u, mu_c)
            b2 = jnp.where(
                masks.c_free, 0.0,
                -rp_k + jnp.where(masks.c_equality, 0.0, w * C_diag),
            )
            dx, dy = kkt_solve(b1, b2)
            dc = qp.Ax(dx) + rp_k
            dy_l = _safe_div(r_tl - st.y_l * dc, t_l, ml_c)
            dy_u = _safe_div(r_tu + st.y_u * dc, t_u, mu_c)
        else:
            dx, _ = kkt_solve(b1, jnp.zeros((0,), dt))
            dc = jnp.zeros((0,), dt)
            dy = jnp.zeros((0,), dt)
            dy_l = dy_u = dc
        dz_l = _safe_div(r_cl - st.z_l * dx, s_l, ml_x)
        dz_u = _safe_div(r_cu + st.z_u * dx, s_u, mu_x)
        dx = jnp.where(masks.x_fixed, 0.0, dx)
        return dict(dx=dx, dc=dc, dy=dy, dz_l=dz_l, dz_u=dz_u,
                    dy_l=dy_l, dy_u=dy_u)

    zero_corr = dict(xl=0.0, xu=0.0, cl=0.0, cu=0.0)

    # --- predictor (affine-scaling, mu = 0) ---
    aff = solve_direction(jnp.asarray(0.0, dt), zero_corr)
    a_p_aff, a_d_aff = _step_lengths(
        masks, s_l, s_u, t_l, t_u, st, aff, tau, dt, ml_x, mu_x, ml_c, mu_c
    )
    mu_now = _avg_complementarity(masks, s_l, s_u, t_l, t_u,
                                  st.z_l, st.z_u, st.y_l, st.y_u, dt)

    if ctl.series_order >= 2:
        # complementarity attained by the affine step -> centering sigma
        # (trial distances updated incrementally, like the state update)
        mu_aff = _avg_complementarity(
            masks,
            s_l + a_p_aff * aff["dx"], s_u - a_p_aff * aff["dx"],
            t_l + a_p_aff * aff["dc"], t_u - a_p_aff * aff["dc"],
            st.z_l + a_d_aff * aff["dz_l"], st.z_u + a_d_aff * aff["dz_u"],
            st.y_l + a_d_aff * aff["dy_l"], st.y_u + a_d_aff * aff["dy_u"],
            dt,
        )
        sigma = (mu_aff / jnp.maximum(mu_now, 1e-30)) ** 3
        sigma = jnp.clip(sigma, 1e-4, 1.0 - 1e-4)
        # Barrier floor: targeting mu below what the termination test
        # needs (comp <= stop_abs_c) only ill-conditions the KKT — in
        # f32 the z/s barrier diagonal overflows the factorization's
        # accuracy and the duals diverge.  Floor the center target a
        # couple of orders under stop_abs_c (the mu_min/pounce role of
        # the reference's mu controls, cqp.f90:169-177,292-296).
        mu_floor = jnp.asarray(3e-3 * ctl.stop_abs_c, dt)
        sigma = jnp.clip(sigma * jnp.ones((), dt),
                         mu_floor / jnp.maximum(mu_now, 1e-30), 10.0)
        if ctl.mu_target > 0:
            # WCP mode: the barrier target never drops below mu_target
            # (reference wcp.f90 drives pairs TO mu, not to zero)
            sigma = jnp.maximum(
                sigma, jnp.asarray(ctl.mu_target, dt)
                / jnp.maximum(mu_now, 1e-30))
            sigma = jnp.minimum(sigma, 2.0)

    if ctl.arc in ("taylor", "puiseux", "zhao_sun") \
            and ctl.series_order >= 2:
        # --- series arcs of order K <= 4 -------------------------------
        # v(alpha) = v + sum_k alpha^k v^k following the chosen path:
        #   "taylor"   (Zhang arc, cqp.f90:194-205):
        #       residual(alpha) = (1-alpha) residual,
        #       comp(alpha) = (1-alpha) SZ + alpha sigma mu;
        #   "puiseux"  (Zhang-Puiseux, cqp.f90:5058-5095 — the theta^2
        #       path written in Taylor coefficients):
        #       residual(alpha) = (1-alpha)^2 residual,
        #       comp(alpha) = (1-alpha)^2 SZ + (1-(1-alpha)^2) sigma mu
        #       => order-1 RHS doubled, residuals re-appear at order 2;
        #   "zhao_sun" (ZS arc, cqp.f90:5088-5095 "arc 2"):
        #       comp(alpha) = (1-alpha) SZ
        #                     + sigma (1-alpha) alpha (mu e - SZ)
        #       — bows toward the mu-center mid-arc, reaches the affine
        #       target at alpha = 1.
        # Order-k complementarity RHS is the convolution of lower-order
        # coefficient products, one extra backsolve per order on the
        # SAME factors (cqp.f90:4237-4247, 5862-5935); the step is the
        # exact smallest positive root of the per-component
        # neighborhood polynomials via ROOTS (cqp.f90:8996).
        K = min(ctl.series_order, 4)
        z0 = jnp.zeros((), dt)

        def conv_at(coefs, k):
            conv = dict(xl=z0, xu=z0, cl=z0, cu=z0)
            for j in range(1, k):
                a, b_ = coefs[j - 1], coefs[k - j - 1]
                conv = dict(
                    xl=conv["xl"] + a["dx"] * b_["dz_l"],
                    xu=conv["xu"] - a["dx"] * b_["dz_u"],
                    cl=conv["cl"] + a["dc"] * b_["dy_l"],
                    cu=conv["cu"] - a["dc"] * b_["dy_u"],
                )
            return conv

        if ctl.arc == "puiseux":
            coefs = [solve_direction(2.0 * sigma * mu_now, zero_corr,
                                     res_scale=2.0)]
            if K >= 2:
                coefs.append(solve_direction(
                    sigma * mu_now, conv_at(coefs, 2), first=True,
                    res_scale=1.0))
            for k in range(3, K + 1):
                coefs.append(solve_direction(z0, conv_at(coefs, k),
                                             first=False))
        elif ctl.arc == "zhao_sun":
            # center-pull term w = sigma (mu e - SZ), per family
            w = dict(xl=sigma * (mu_now - st.z_l * s_l),
                     xu=sigma * (mu_now - st.z_u * s_u),
                     cl=sigma * (mu_now - st.y_l * t_l),
                     cu=sigma * (mu_now - st.y_u * t_u))
            corr1 = {k2: -w[k2] for k2 in w}
            coefs = [solve_direction(z0, corr1)]
            if K >= 2:
                conv = conv_at(coefs, 2)
                corr2 = {k2: w[k2] + conv[k2] for k2 in w}
                coefs.append(solve_direction(z0, corr2, first=False))
            for k in range(3, K + 1):
                coefs.append(solve_direction(z0, conv_at(coefs, k),
                                             first=False))
        else:  # "taylor"
            coefs = [solve_direction(sigma * mu_now, zero_corr)]
            for k in range(2, K + 1):
                coefs.append(solve_direction(z0, conv_at(coefs, k),
                                             first=False))
        fams = [
            (s_l, [c["dx"] for c in coefs], ml_x),
            (s_u, [-c["dx"] for c in coefs], mu_x),
            (st.z_l, [c["dz_l"] for c in coefs], ml_x),
            (st.z_u, [c["dz_u"] for c in coefs], mu_x),
        ]
        if m > 0:
            fams += [
                (t_l, [c["dc"] for c in coefs], ml_c),
                (t_u, [-c["dc"] for c in coefs], mu_c),
                (st.y_l, [c["dy_l"] for c in coefs], ml_c),
                (st.y_u, [c["dy_u"] for c in coefs], mu_c),
            ]
        # every-order selection: compute the max step of each truncation
        # order and take the order whose arc permits the longest step
        # (the reference's every_order / iorder loop, cqp.f90:6512-6545)
        # — guards against higher-order coefficients exploding near the
        # boundary and stalling the iteration.
        alphas = []
        for j in range(1, K + 1):
            aj = jnp.asarray(1.0, dt)
            for v0, deltas, mask in fams:
                aj = jnp.minimum(
                    aj, _arc_max_step(v0, deltas[:j], mask, tau))
            alphas.append(aj * jnp.asarray(0.9999, dt))
        alphas = jnp.stack(alphas)                      # (K,)
        # prefer the higher order on (near-)ties
        jbest = (K - 1) - jnp.argmax(alphas[::-1])
        alpha = alphas[jbest]
        # evaluate the chosen truncated arc at alpha (FIT polynomial
        # evaluation of the Taylor coefficients, fit.f90:318 role); the
        # common update x + a * d then applies sum_{k<=jbest} alpha^k v^k
        from ..core.fit import polyval

        d = {}
        for key in coefs[0]:
            cstack = jnp.stack(
                [jnp.where(k <= jbest, 1.0, 0.0) * c[key]
                 for k, c in enumerate(coefs)], axis=-1)
            d[key] = polyval(cstack, alpha)
        a_p = a_d = alpha
    elif ctl.series_order >= 2:
        d = aff
        for _ in range(ctl.series_order - 1):
            corr = dict(
                xl=d["dz_l"] * d["dx"],
                xu=-d["dz_u"] * d["dx"],
                cl=d["dy_l"] * d["dc"],
                cu=-d["dy_u"] * d["dc"],
            )
            d = solve_direction(sigma * mu_now, corr)
        a_p, a_d = _step_lengths(
            masks, s_l, s_u, t_l, t_u, st, d, tau, dt, ml_x, mu_x, ml_c, mu_c
        )
    else:
        d = aff
        a_p, a_d = _step_lengths(
            masks, s_l, s_u, t_l, t_u, st, d, tau, dt, ml_x, mu_x, ml_c, mu_c
        )

    return _apply_direction(qp, masks, st, ctl, d, a_p, a_d,
                            s_l, s_u, t_l, t_u, ml_x, mu_x, ml_c, mu_c)


def _apply_direction(qp, masks, st, ctl, d, a_p, a_d,
                     s_l, s_u, t_l, t_u, ml_x, mu_x, ml_c, mu_c):
    """Shared step tail: dw update, dual absorption, convergence
    test, failure guards and the non-finite rollback (used by both
    the fused ipm_step and the sparse split-step driver)."""
    dt = qp.g.dtype
    m = qp.m
    # --- update (double-word: hi + lo words carry the iterate to ~2x
    # f32 precision so the attainable KKT residual is set by one
    # matvec's rounding, not the f32 representation of x) ---
    from ..linalg.dw import dw_add

    x, x_lo = dw_add(st.x, st.x_lo, a_p * d["dx"])
    c, c_lo = dw_add(st.c, st.c_lo, a_p * d["dc"])
    z_l, zl_lo = dw_add(st.z_l, st.zl_lo, a_d * d["dz_l"])
    z_u, zu_lo = dw_add(st.z_u, st.zu_lo, a_d * d["dz_u"])
    y_l, yl_lo = dw_add(st.y_l, st.yl_lo, a_d * d["dy_l"])
    y_u, yu_lo = dw_add(st.y_u, st.yu_lo, a_d * d["dy_u"])
    z_l = jnp.where(ml_x, z_l, 0.0)
    zl_lo = jnp.where(ml_x, zl_lo, 0.0)
    z_u = jnp.where(mu_x, z_u, 0.0)
    zu_lo = jnp.where(mu_x, zu_lo, 0.0)
    y_l = jnp.where(ml_c, y_l, 0.0)
    yl_lo = jnp.where(ml_c, yl_lo, 0.0)
    y_u = jnp.where(mu_c, y_u, 0.0)
    yu_lo = jnp.where(mu_c, yu_lo, 0.0)
    yf, yf_lo = dw_add(st.y, st.y_lo, a_d * d["dy"])
    y = jnp.where(masks.c_equality, yf, y_l - y_u)
    y_lo = jnp.where(masks.c_equality, yf_lo, yl_lo - yu_lo)
    # carried distances: incremental update at the DISTANCE's own scale
    # (never recomputed as x_u - x, which cancels below one ulp of x in
    # f32 near convergence — the DIST_X/DIST_C state of cqp.f90).  The
    # fraction-to-boundary rule keeps s + a ds >= (1-tau) s > 0 up to
    # rounding of the same scale; the floor guards the rounding.
    dtiny = jnp.asarray(np.finfo(np.dtype(dt.name)).tiny * 16, dt)
    ns_l = jnp.where(ml_x, jnp.maximum(s_l + a_p * d["dx"], dtiny), 1.0)
    ns_u = jnp.where(mu_x, jnp.maximum(s_u - a_p * d["dx"], dtiny), 1.0)
    nt_l = jnp.where(ml_c, jnp.maximum(t_l + a_p * d["dc"], dtiny), 1.0)
    nt_u = jnp.where(mu_c, jnp.maximum(t_u - a_p * d["dc"], dtiny), 1.0)

    new = dataclasses.replace(
        st, x=x, c=c, y=y, z_l=z_l, z_u=z_u, y_l=y_l, y_u=y_u,
        x_lo=x_lo, c_lo=c_lo, y_lo=y_lo, zl_lo=zl_lo, zu_lo=zu_lo,
        yl_lo=yl_lo, yu_lo=yu_lo,
        s_l=ns_l, s_u=ns_u, t_l=nt_l, t_u=nt_u,
        mu=_avg_complementarity(masks, ns_l, ns_u, nt_l, nt_u,
                                z_l, z_u, y_l, y_u, dt),
        iter=st.iter + 1,
    )
    # --- dual-residual absorption into bounded duals -------------------
    # z enters the dual residual linearly with coefficient -1, so
    # wherever a bound dual exists, z <- z + r_d zeroes that component
    # EXACTLY while perturbing complementarity by only s * |r_d|.
    # Guarded to fire only when that perturbation is far below the stop
    # tolerance and the dual stays safely positive — this removes the
    # f32 KKT-solve noise that otherwise makes the dual endgame wander
    # (the role dynamic-pivoting accuracy plays for the reference).
    r_d_vec, r_p_vec = _residual_vectors(qp, masks, new)
    tol_c = jnp.asarray(0.1 * ctl.stop_abs_c, dt)
    take_l = (ml_x & (new.z_l >= new.z_u) & (r_d_vec >= -0.5 * new.z_l)
              & (new.s_l * jnp.abs(r_d_vec) <= tol_c))
    take_u = (mu_x & ~take_l & (r_d_vec <= 0.5 * new.z_u)
              & (new.s_u * jnp.abs(r_d_vec) <= tol_c))
    az_l, azl_lo = dw_add(new.z_l, new.zl_lo,
                          jnp.where(take_l, r_d_vec, 0.0))
    az_u, azu_lo = dw_add(new.z_u, new.zu_lo,
                          jnp.where(take_u, -r_d_vec, 0.0))
    new = dataclasses.replace(
        new, z_l=az_l, zl_lo=azl_lo, z_u=az_u, zu_lo=azu_lo)
    r_d_vec = jnp.where(take_l | take_u, 0.0, r_d_vec)
    res_d = jnp.max(jnp.abs(r_d_vec))
    res_p = jnp.max(jnp.abs(r_p_vec), initial=0.0)
    res_c = _comp_inf(qp, masks, new)
    if ctl.mu_target > 0:
        # WCP convergence: feasibility + every active complementarity
        # pair inside the two-sided band [gamma*mu_t, mu_t/gamma]
        # (the centered-point measures of WCP_solve, wcp.f90:935)
        mu_t = jnp.asarray(ctl.mu_target, dt)

        def in_band(prod, mask):
            return jnp.all(jnp.where(
                mask,
                (prod >= ctl.gamma_c * mu_t) & (prod <= mu_t / ctl.gamma_c),
                True))

        cent = (in_band(new.z_l * ns_l, ml_x) & in_band(new.z_u * ns_u, mu_x))
        if m > 0:
            cent = cent & in_band(new.y_l * nt_l, ml_c) \
                & in_band(new.y_u * nt_u, mu_c)
        conv = (res_p <= ctl.stop_abs_p) & (res_d <= ctl.stop_abs_d) & cent
    else:
        conv = (
            (res_p <= ctl.stop_abs_p)
            & (res_d <= ctl.stop_abs_d)
            & (res_c <= ctl.stop_abs_c)
        )
    # --- failure guards ------------------------------------------------
    # Divergence: infeas_max consecutive iterations without the primal
    # infeasibility improving by reduce_infeas -> declare infeasible
    # (reference cqp.f90:163-168 control semantics).
    improved = res_p <= ctl.reduce_infeas * st.best_infeas
    feas_now = res_p <= ctl.stop_abs_p
    stall = jnp.where(improved | feas_now, 0, st.stall + 1).astype(jnp.int32)
    # Stalled step lengths: no movement possible.  With stubbornly large
    # primal infeasibility this IS the infeasibility certificate; on a
    # feasible problem it is a plain TINY_STEP stall (-13).
    tiny_step = (jnp.maximum(a_p, a_d) < 1e-10) & ~conv
    infeasible = ((stall >= ctl.infeas_max)
                  | (tiny_step & (stall >= 2))) & ~feas_now
    tiny = tiny_step & ~infeasible
    status = jnp.where(
        conv, int(Status.OK),
        jnp.where(infeasible, int(Status.PRIMAL_INFEASIBLE),
                  jnp.where(tiny, int(Status.TINY_STEP), new.status)),
    ).astype(jnp.int32)
    out = dataclasses.replace(
        new,
        res_p=res_p, res_d=res_d, res_c=res_c,
        converged=conv,
        halt=conv | infeasible | tiny,
        status=status,
        best_infeas=jnp.minimum(st.best_infeas, res_p),
        stall=stall,
    )
    # --- non-finite guard: NEVER return NaN with a confident status ----
    # The reference monitors residuals every iteration and exits with a
    # diagnosed code (cqp.f90:163-168; symbols.f90:52-102); here a
    # non-finite step rolls the state back to the best (previous)
    # iterate and halts with ILL_CONDITIONED (-12) so inform reports the
    # honest residuals actually attained (VERDICT r3 item 2).
    bad = ~jnp.isfinite(res_p + res_d + res_c + a_p + a_d
                        + jnp.sum(x) + jnp.sum(z_l) + jnp.sum(z_u))
    rolled = jax.tree_util.tree_map(
        lambda prev_leaf, new_leaf: jnp.where(bad, prev_leaf, new_leaf),
        st, out)
    # a blow-up while the primal infeasibility is still LARGE is the
    # classic infeasibility certificate (diverging duals), not a
    # numerical accident: diagnose -5, else -12 (symbols.f90 registry)
    far = jnp.isfinite(st.best_infeas) \
        & (st.best_infeas > jnp.maximum(1e3 * ctl.stop_abs_p, 1e-3))
    bad_status = jnp.where(far, int(Status.PRIMAL_INFEASIBLE),
                           int(Status.ILL_CONDITIONED))
    return dataclasses.replace(
        rolled,
        iter=out.iter,
        halt=jnp.where(bad, True, out.halt),
        converged=jnp.where(bad, st.converged, out.converged),
        status=jnp.where(bad, bad_status, out.status).astype(jnp.int32),
    )


def _arc_max_step(v0, deltas, mask, tau):
    """Largest alpha with  v(alpha) >= (1 - tau) v0  componentwise along
    the polynomial arc v(alpha) = v0 + sum_k deltas[k-1] alpha^k: the
    smallest positive root of  tau v0 + sum_k deltas[k-1] alpha^k  per
    component, found in closed form (ROOTS role — the reference solves
    the same per-component polynomials with ROOTS_quadratic/cubic/
    quartic, CQP_compute_lmaxstep cqp.f90:8996; here one vmapped
    quartic call covers every component)."""
    from ..core.roots import roots_quartic, smallest_positive_root

    a = [jnp.where(mask, tau * v0, 1.0)]
    for dk in deltas:
        a.append(jnp.where(mask, dk, 0.0))
    while len(a) < 5:
        a.append(jnp.zeros_like(v0))
    nr, rts = roots_quartic(a[0], a[1], a[2], a[3], a[4])
    best = smallest_positive_root(nr, rts)
    return jnp.min(best, initial=jnp.inf)


def _step_lengths(masks, s_l, s_u, t_l, t_u, st, d, tau, dt,
                  ml_x, mu_x, ml_c, mu_c):
    a_p = jnp.minimum(
        _fraction_to_boundary(s_l, d["dx"], ml_x, tau, dt),
        _fraction_to_boundary(s_u, -d["dx"], mu_x, tau, dt),
    )
    # Dual-growth cap: the plain predictor-corrector has no central-path
    # neighborhood (the reference's gamma_f test, cqp.f90:4190-4229), so
    # a near-degenerate KKT solve can propose dual steps orders of
    # magnitude beyond the current duals and the dual residual explodes
    # (observed: d-res oscillating 1e-2 <-> 1e+7 on a mixed-bound QP).
    # Cap the dual step so the dual iterate grows at most ~10x per
    # iteration — inactive on healthy steps.
    dual_now = jnp.maximum(
        jnp.max(jnp.where(ml_x, jnp.abs(st.z_l), 0.0), initial=0.0),
        jnp.max(jnp.where(mu_x, jnp.abs(st.z_u), 0.0), initial=0.0))
    step_max = jnp.maximum(
        jnp.max(jnp.where(ml_x, jnp.abs(d["dz_l"]), 0.0), initial=0.0),
        jnp.max(jnp.where(mu_x, jnp.abs(d["dz_u"]), 0.0), initial=0.0))
    if st.c.shape[-1] > 0:
        dual_now = jnp.maximum(
            dual_now,
            jnp.maximum(
                jnp.max(jnp.where(ml_c, jnp.abs(st.y_l), 0.0), initial=0.0),
                jnp.max(jnp.where(mu_c, jnp.abs(st.y_u), 0.0),
                        initial=0.0)))
        step_max = jnp.maximum(
            step_max,
            jnp.maximum(
                jnp.max(jnp.where(ml_c, jnp.abs(d["dy_l"]), 0.0),
                        initial=0.0),
                jnp.max(jnp.where(mu_c, jnp.abs(d["dy_u"]), 0.0),
                        initial=0.0)))
    a_cap = 10.0 * (dual_now + 1.0) / jnp.maximum(step_max, 1e-30)
    if st.c.shape[-1] > 0:
        a_p = jnp.minimum(
            a_p,
            jnp.minimum(
                _fraction_to_boundary(t_l, d["dc"], ml_c, tau, dt),
                _fraction_to_boundary(t_u, -d["dc"], mu_c, tau, dt),
            ),
        )
    a_d = jnp.minimum(
        _fraction_to_boundary(st.z_l, d["dz_l"], ml_x, tau, dt),
        _fraction_to_boundary(st.z_u, d["dz_u"], mu_x, tau, dt),
    )
    if st.c.shape[-1] > 0:
        a_d = jnp.minimum(
            a_d,
            jnp.minimum(
                _fraction_to_boundary(st.y_l, d["dy_l"], ml_c, tau, dt),
                _fraction_to_boundary(st.y_u, d["dy_u"], mu_c, tau, dt),
            ),
        )
    a_d = jnp.minimum(a_d, a_cap.astype(dt))
    return a_p, a_d


# ---------------------------------------------------------------------------
# Indicators (active-set prediction)
# ---------------------------------------------------------------------------


def ipm_indicators(qp: QP, masks: BoundMasks, st: IPMState, ctl: IPMControl,
                   prev: IPMState | None = None):
    """Predict the optimal active set from the (near-)converged IPM
    iterate (CQP_indicators, reference src/cqp/cqp.f90:9885; controls
    :189-213).  Returns (b_stat, c_stat) int32 arrays with the reference
    convention: -1 active at lower, +1 active at upper, 0 inactive.

    Three indicator types:
      * 'primal':   distance-to-bound < indicator_tol_p;
      * 'pd_ratio': dual magnitude exceeds indicator_tol_pd * distance
        (the default; scale-free);
      * 'tapia':    ratio of successive distances -> 0 on the active set
        and -> 1 off it (needs ``prev``; falls back to pd_ratio when the
        previous iterate is unavailable).
    """
    s_l, s_u, t_l, t_u = st.s_l, st.s_u, st.t_l, st.t_u
    kind = ctl.indicator_type
    if kind == "tapia" and prev is None:
        kind = "pd_ratio"

    def decide(dist_l, dist_u, dual_l, dual_u, has_l, has_u,
               pdist_l=None, pdist_u=None):
        if kind == "primal":
            lo = has_l & (dist_l < ctl.indicator_tol_p)
            hi = has_u & (dist_u < ctl.indicator_tol_p)
        elif kind == "tapia":
            r_l = dist_l / jnp.maximum(pdist_l, 1e-30)
            r_u = dist_u / jnp.maximum(pdist_u, 1e-30)
            lo = has_l & (r_l < 1.0 - ctl.indicator_tol_tapia)
            hi = has_u & (r_u < 1.0 - ctl.indicator_tol_tapia)
        else:  # pd_ratio
            lo = has_l & (dual_l > ctl.indicator_tol_pd * dist_l)
            hi = has_u & (dual_u > ctl.indicator_tol_pd * dist_u)
        # ties: the side with the smaller distance wins
        both = lo & hi
        lo = jnp.where(both, dist_l <= dist_u, lo)
        hi = jnp.where(both, dist_u < dist_l, hi)
        return jnp.where(lo, -1, jnp.where(hi, 1, 0)).astype(jnp.int32)

    if prev is not None:
        ps_l, ps_u, pt_l, pt_u = prev.s_l, prev.s_u, prev.t_l, prev.t_u
    else:
        ps_l = ps_u = pt_l = pt_u = None
    b_stat = decide(s_l, s_u, st.z_l, st.z_u,
                    masks.has_xl & ~masks.x_fixed,
                    masks.has_xu & ~masks.x_fixed, ps_l, ps_u)
    b_stat = jnp.where(masks.x_fixed, -1, b_stat)
    if qp.m > 0:
        c_stat = decide(t_l, t_u, st.y_l, st.y_u,
                        masks.has_cl & ~masks.c_equality,
                        masks.has_cu & ~masks.c_equality, pt_l, pt_u)
        c_stat = jnp.where(masks.c_equality, -1, c_stat)
    else:
        c_stat = jnp.zeros((0,), jnp.int32)
    return b_stat, c_stat


# ---------------------------------------------------------------------------
# Drivers
# ---------------------------------------------------------------------------


def extract_solution(qp: QP, masks: BoundMasks, st: IPMState):
    """Final (x, y, z): bound dual z from z_l - z_u; fixed variables get
    the exact dual residual as their multiplier (the reference eliminates
    fixed variables in QPP and recovers z the same way on restore)."""
    z = st.z_l - st.z_u
    r = qp.Hx(st.x) + qp.g
    if qp.m > 0:
        r = r - qp.Aty(st.y)
    z = jnp.where(masks.x_fixed, r, z)
    return st.x, st.y, z


def solution_dw(qp: QP, masks: BoundMasks, st: IPMState):
    """(x, y, z) as float64 numpy, combining BOTH words of the
    double-word iterate — on f32 hardware this is the solver's actual
    accuracy (each f32 (hi, lo) pair sums exactly in f64); use it when
    evaluating final KKT residuals outside the solver."""
    import numpy as _np

    f8 = _np.float64
    x = _np.asarray(st.x, f8) + _np.asarray(st.x_lo, f8)
    y = _np.asarray(st.y, f8) + _np.asarray(st.y_lo, f8)
    z = (_np.asarray(st.z_l, f8) + _np.asarray(st.zl_lo, f8)
         - _np.asarray(st.z_u, f8) - _np.asarray(st.zu_lo, f8))
    fixed = _np.asarray(masks.x_fixed)
    if fixed.any():
        _, _, z_hi = extract_solution(qp, masks, st)
        z = _np.where(fixed, _np.asarray(z_hi, f8), z)
    return x, y, z


@dataclasses.dataclass
class PhaseTimes:
    """Per-phase wall clocks (the PKG_time_type contract,
    reference src/cqp/cqp.f90:429-473)."""

    total: float = 0.0
    preprocess: float = 0.0      # init / bound classification
    analyse: float = 0.0         # first-step trace+compile (symbolic work)
    solve: float = 0.0           # iteration wall time after compile


@dataclasses.dataclass
class IPMInform:
    """Host-side inform record (reference CQP_inform_type,
    src/cqp/cqp.f90:484-575): status + statistics + per-phase times +
    convergence-history checkpoints (checkpoint.f90:37-62 wired in at
    cqp.f90:566)."""

    status: int = int(Status.MAX_ITERATIONS)
    iter: int = 0
    nfacts: int = 0              # KKT factorizations (one per iteration)
    nbacts: int = 0              # backsolves (series + refinement sweeps)
    obj: float = 0.0
    primal_infeasibility: float = float("inf")
    dual_infeasibility: float = float("inf")
    complementary_slackness: float = float("inf")
    time: PhaseTimes = dataclasses.field(default_factory=PhaseTimes)
    checkpoints_iter: Any = None   # (16,) first iter with res <= 10^-i
    checkpoints_time: Any = None   # (16,) first wall time with res <= 10^-i
    b_stat: Any = None             # (n,) predicted bound activity (-1/0/+1)
    c_stat: Any = None             # (m,) predicted constraint activity


@partial(jax.jit, static_argnames=("ctl", "h_kind"))
def _jitted_step(qp: QP, masks: BoundMasks, st: IPMState, ctl: IPMControl,
                 h_kind: str):
    return ipm_step(qp, masks, st, ctl)


@partial(jax.jit, static_argnames=("ctl", "h_kind"))
def _jitted_multi_step(qp: QP, masks: BoundMasks, st: IPMState,
                       ctl: IPMControl, h_kind: str):
    """Up to ctl.steps_per_fetch iterations in ONE device dispatch
    (early exit on halt): amortizes fixed dispatch overhead and host
    monitor fetches on remote backends."""
    B = max(1, ctl.steps_per_fetch)

    def cond(c):
        s, k = c
        return (~s.halt) & (k < B) & (s.iter < ctl.maxit)

    def body(c):
        s, k = c
        return ipm_step(qp, masks, s, ctl), k + 1

    s, _ = jax.lax.while_loop(
        cond, body, (st, jnp.asarray(0, jnp.int32)))
    return s


# ---------------------------------------------------------------------------
# Split-step driver for SPARSE problems.
#
# The supernodal KKT path is host-orchestrated over shape-cached kernels
# (linalg/supernodal_flat.py) and must NOT be traced into one giant XLA
# program (231 s compile at n=144, VERDICT r3 item 3).  Running the whole
# step eagerly instead costs hundreds of per-op compiles (measured ~250
# distinct op shapes, ~1 s each on XLA:CPU).  The resolution: the step's
# dense math is grouped into FIVE jitted segments — pre-KKT barrier,
# RHS build, direction recovery, centering sigma, and the
# update/guard/absorption finish — with the flat KKT factorize+solves
# called on the host between them.  Five compiles per problem shape,
# ~10 jit dispatches per iteration.
# ---------------------------------------------------------------------------


def _active_masks(masks):
    return (masks.has_xl & ~masks.x_fixed, masks.has_xu & ~masks.x_fixed,
            masks.has_cl & ~masks.c_equality,
            masks.has_cu & ~masks.c_equality)


def _barrier_diagonals(qp, masks, st, ctl):
    dt = qp.g.dtype
    ml_x, mu_x, ml_c, mu_c = _active_masks(masks)
    D_x = (
        jnp.where(ml_x, st.z_l / st.s_l, 0.0)
        + jnp.where(mu_x, st.z_u / st.s_u, 0.0)
        + jnp.where(masks.x_fixed, BIG, 0.0)
    )
    if qp.m > 0:
        D_c = (jnp.where(ml_c, st.y_l / st.t_l, 0.0)
               + jnp.where(mu_c, st.y_u / st.t_u, 0.0))
        C_diag = jnp.where(
            masks.c_equality, 0.0,
            jnp.where(masks.c_free, BIG, 1.0 / jnp.maximum(D_c, 1.0 / BIG)),
        )
    else:
        C_diag = jnp.zeros((0,), dt)
    return D_x, C_diag


@partial(jax.jit, static_argnames=("ctl",))
def _sp_pre(qp, masks, st, ctl):
    return _barrier_diagonals(qp, masks, st, ctl)


def _corr_terms(st, d_prev, affine):
    if affine:
        # dtype-pinned: an untyped zeros(()) is a STRONG f64 scalar under
        # x64 and silently promoted the whole f32 state to f64
        z = jnp.zeros((), st.x.dtype)
        return dict(xl=z, xu=z, cl=z, cu=z)
    return dict(
        xl=d_prev["dz_l"] * d_prev["dx"],
        xu=-d_prev["dz_u"] * d_prev["dx"],
        cl=d_prev["dy_l"] * d_prev["dc"],
        cu=-d_prev["dy_u"] * d_prev["dc"],
    )


@partial(jax.jit, static_argnames=("ctl", "affine"))
def _sp_rhs(qp, masks, st, ctl, mu_t, d_prev, C_diag, affine):
    ml_x, mu_x, ml_c, mu_c = _active_masks(masks)
    s_l, s_u, t_l, t_u = st.s_l, st.s_u, st.t_l, st.t_u
    r_d, r_p = _residual_vectors(qp, masks, st)
    corr = _corr_terms(st, d_prev, affine)
    r_cl = jnp.where(ml_x, mu_t - st.z_l * s_l - corr["xl"], 0.0)
    r_cu = jnp.where(mu_x, mu_t - st.z_u * s_u - corr["xu"], 0.0)
    b1 = -r_d + _safe_div(r_cl, s_l, ml_x) - _safe_div(r_cu, s_u, mu_x)
    b1 = jnp.where(masks.x_fixed, 0.0, b1)
    if qp.m > 0:
        r_tl = jnp.where(ml_c, mu_t - st.y_l * t_l - corr["cl"], 0.0)
        r_tu = jnp.where(mu_c, mu_t - st.y_u * t_u - corr["cu"], 0.0)
        w = _safe_div(r_tl, t_l, ml_c) - _safe_div(r_tu, t_u, mu_c)
        b2 = jnp.where(
            masks.c_free, 0.0,
            -r_p + jnp.where(masks.c_equality, 0.0, w * C_diag),
        )
    else:
        b2 = jnp.zeros((0,), qp.g.dtype)
    return b1, b2


@partial(jax.jit, static_argnames=("ctl", "affine"))
def _sp_recover(qp, masks, st, ctl, mu_t, d_prev, dx, dy, affine):
    ml_x, mu_x, ml_c, mu_c = _active_masks(masks)
    s_l, s_u, t_l, t_u = st.s_l, st.s_u, st.t_l, st.t_u
    dt = qp.g.dtype
    corr = _corr_terms(st, d_prev, affine)
    r_cl = jnp.where(ml_x, mu_t - st.z_l * s_l - corr["xl"], 0.0)
    r_cu = jnp.where(mu_x, mu_t - st.z_u * s_u - corr["xu"], 0.0)
    if qp.m > 0:
        _, r_p = _residual_vectors(qp, masks, st)
        r_tl = jnp.where(ml_c, mu_t - st.y_l * t_l - corr["cl"], 0.0)
        r_tu = jnp.where(mu_c, mu_t - st.y_u * t_u - corr["cu"], 0.0)
        dc = qp.Ax(dx) + r_p
        dy_l = _safe_div(r_tl - st.y_l * dc, t_l, ml_c)
        dy_u = _safe_div(r_tu + st.y_u * dc, t_u, mu_c)
    else:
        dc = jnp.zeros((0,), dt)
        dy = jnp.zeros((0,), dt)
        dy_l = dy_u = dc
    dz_l = _safe_div(r_cl - st.z_l * dx, s_l, ml_x)
    dz_u = _safe_div(r_cu + st.z_u * dx, s_u, mu_x)
    dx = jnp.where(masks.x_fixed, 0.0, dx)
    return dict(dx=dx, dc=dc, dy=dy, dz_l=dz_l, dz_u=dz_u,
                dy_l=dy_l, dy_u=dy_u)


@partial(jax.jit, static_argnames=("ctl",))
def _sp_sigma(qp, masks, st, ctl, aff):
    """Centering target sigma * mu from the affine predictor step."""
    dt = qp.g.dtype
    tau = jnp.asarray(ctl.tau, dt)
    ml_x, mu_x, ml_c, mu_c = _active_masks(masks)
    s_l, s_u, t_l, t_u = st.s_l, st.s_u, st.t_l, st.t_u
    a_p, a_d = _step_lengths(
        masks, s_l, s_u, t_l, t_u, st, aff, tau, dt, ml_x, mu_x, ml_c, mu_c)
    mu_now = _avg_complementarity(masks, s_l, s_u, t_l, t_u,
                                  st.z_l, st.z_u, st.y_l, st.y_u, dt)
    mu_aff = _avg_complementarity(
        masks,
        s_l + a_p * aff["dx"], s_u - a_p * aff["dx"],
        t_l + a_p * aff["dc"], t_u - a_p * aff["dc"],
        st.z_l + a_d * aff["dz_l"], st.z_u + a_d * aff["dz_u"],
        st.y_l + a_d * aff["dy_l"], st.y_u + a_d * aff["dy_u"], dt)
    sigma = (mu_aff / jnp.maximum(mu_now, 1e-30)) ** 3
    sigma = jnp.clip(sigma, 1e-4, 1.0 - 1e-4)
    mu_floor = jnp.asarray(3e-3 * ctl.stop_abs_c, dt)
    sigma = jnp.clip(sigma * jnp.ones((), dt),
                     mu_floor / jnp.maximum(mu_now, 1e-30), 10.0)
    if ctl.mu_target > 0:
        sigma = jnp.maximum(
            sigma, jnp.asarray(ctl.mu_target, dt)
            / jnp.maximum(mu_now, 1e-30))
        sigma = jnp.minimum(sigma, 2.0)
    return sigma * mu_now


@partial(jax.jit, static_argnames=("ctl",))
def _sp_finish(qp, masks, st, ctl, d):
    """Step lengths, dw update, absorption, convergence test and guards
    — the tail of ipm_step for a host-supplied direction."""
    dt = qp.g.dtype
    tau = jnp.asarray(ctl.tau, dt)
    ml_x, mu_x, ml_c, mu_c = _active_masks(masks)
    s_l, s_u, t_l, t_u = st.s_l, st.s_u, st.t_l, st.t_u
    a_p, a_d = _step_lengths(
        masks, s_l, s_u, t_l, t_u, st, d, tau, dt, ml_x, mu_x, ml_c, mu_c)
    return _apply_direction(qp, masks, st, ctl, d, a_p, a_d,
                            s_l, s_u, t_l, t_u, ml_x, mu_x, ml_c, mu_c)


def _sparse_ipm_step(qp, masks, st: IPMState, ctl: IPMControl) -> IPMState:
    """One Mehrotra predictor-corrector iteration with the KKT solves on
    the host flat path and the dense math in jitted segments."""
    import os as _os
    import time as _time

    verbose = _os.environ.get("GALAHAD_TPU_VERBOSE")
    t0 = _time.perf_counter()
    D_x, C_diag = _sp_pre(qp, masks, st, ctl)
    kkt_solve = qp.build_kkt(D_x, C_diag, ctl)
    dt = qp.g.dtype
    zero = jnp.zeros((), dt)
    zn = jnp.zeros_like(st.x)
    zm = jnp.zeros_like(st.c)
    zero_d = dict(dx=zn, dc=zm, dy=zm, dz_l=zn, dz_u=zn, dy_l=zm, dy_u=zm)

    b1, b2 = _sp_rhs(qp, masks, st, ctl, zero, zero_d, C_diag, True)
    dx, dy = kkt_solve(b1, b2)
    aff = _sp_recover(qp, masks, st, ctl, zero, zero_d, dx, dy, True)
    if ctl.series_order >= 2:
        mu_t = _sp_sigma(qp, masks, st, ctl, aff)
        d = aff
        for _ in range(ctl.series_order - 1):
            b1, b2 = _sp_rhs(qp, masks, st, ctl, mu_t, d, C_diag, False)
            dx, dy = kkt_solve(b1, b2)
            d = _sp_recover(qp, masks, st, ctl, mu_t, d, dx, dy, False)
    else:
        d = aff
    out = _sp_finish(qp, masks, st, ctl, d)
    if verbose:
        out.res_p.block_until_ready()
        print(f"[galahad_tpu] sparse step {int(st.iter)}: "
              f"{_time.perf_counter() - t0:.1f}s", flush=True)
    return out


_F64_PROBE: list = []


def _backend_supports_f64() -> bool:
    """One-time probe: can the default backend execute a float64 op?"""
    if not _F64_PROBE:
        import jax as _jax

        prev = bool(_jax.config.jax_enable_x64)
        try:
            if not prev:
                _jax.config.update("jax_enable_x64", True)
            v = (jnp.zeros((), jnp.float64) + 1.0)
            v.block_until_ready()
            _F64_PROBE.append(bool(v.dtype == jnp.float64))
        except Exception:   # noqa: BLE001 — backend capability probe
            _F64_PROBE.append(False)
        finally:
            if not prev:
                _jax.config.update("jax_enable_x64", False)
    return _F64_PROBE[0]


def _sparse_f64_island(qp, st: IPMState, ctl: IPMControl,
                       extra_iters: int = 6) -> IPMState:
    """Continue a stalled f32 sparse solve in f64 from the folded
    double-word iterate (the 'f64 island' of SURVEY §7.1): the f32 KKT
    solves floor the dual residual a few times above 1e-6; one or two
    f64 iterations from an otherwise-converged point finish the job.
    The symbolic KKT plan (pattern analysis, index maps) is REUSED —
    only the numeric kernels recompile at f64."""
    import jax as _jax

    # scope the x64 flag to the island: flipping it process-wide would
    # silently change dtype semantics of subsequent f32 work (advisor
    # r4); existing f64 arrays in the returned state keep their dtype
    # after restore, so the caller's extraction still sees f64
    _prev_x64 = bool(_jax.config.jax_enable_x64)
    if not _prev_x64:
        _jax.config.update("jax_enable_x64", True)
    # a failed accelerator f64 compile costs minutes; remember it
    # ACROSS processes (marker next to the persistent compile cache)
    # so reruns go straight to the CPU island
    _marker = None
    cache_dir = _jax.config.jax_compilation_cache_dir
    if cache_dir:
        import os as _os

        _marker = _os.path.join(
            cache_dir, f"island-f64-fail-{qp.n}-{qp.m}-"
            f"{_jax.default_backend()}")
    try:
        try:
            if _marker and _os.path.exists(_marker):
                raise _jax.errors.JaxRuntimeError(
                    "accelerator f64 island previously failed here "
                    "(marker file); using the CPU island")
            return _sparse_f64_island_body(qp, st, ctl, extra_iters)
        except _jax.errors.JaxRuntimeError as e:
            if _marker and not _os.path.exists(_marker):
                try:
                    _os.makedirs(cache_dir, exist_ok=True)
                    with open(_marker, "w") as fh:
                        fh.write(str(e)[:500])
                except OSError:
                    pass
            # some accelerator stacks cannot compile/execute the big
            # f64 program (observed: remote TPU compile helper failing
            # on the fused f64 solve); the island is a few short
            # iterations, so rerun it on the host CPU backend — same
            # f64 numerics, bounded cost
            cpus = _jax.devices("cpu")
            if not cpus:
                raise
            import warnings

            warnings.warn(
                f"f64 endgame island fell back to CPU: {e}",
                RuntimeWarning, stacklevel=2)
            dev0 = next(iter(qp.g.devices()))
            with _jax.default_device(cpus[0]):
                st_cpu = _jax.device_put(st, cpus[0])
                qp_cpu = _jax.device_put(qp, cpus[0])
                out = _sparse_f64_island_body(qp_cpu, st_cpu, ctl,
                                              extra_iters)
            # hand the (dw-folded f32) state back on the caller's device
            return _jax.device_put(out, dev0)
    finally:
        if not _prev_x64:
            _jax.config.update("jax_enable_x64", False)


def _sparse_f64_island_body(qp, st: IPMState, ctl: IPMControl,
                            extra_iters: int) -> IPMState:
    f8 = jnp.float64

    def up(hi, lo=None):
        v = jnp.asarray(hi, f8)
        if lo is not None:
            v = v + jnp.asarray(lo, f8)
        return v

    qp64 = dataclasses.replace(
        qp, g=up(qp.g), f=float(qp.f),
        c_l=up(qp.c_l), c_u=up(qp.c_u), x_l=up(qp.x_l), x_u=up(qp.x_u),
        h_vals=up(qp.h_vals), a_vals=up(qp.a_vals),
        x=None if qp.x is None else up(qp.x),
        y=None if qp.y is None else up(qp.y),
        z=None if qp.z is None else up(qp.z))
    masks = classify_bounds(qp64, ctl.infinity)
    zn = jnp.zeros(qp.n, f8)
    zm = jnp.zeros(qp.m, f8)
    st64 = dataclasses.replace(
        st,
        x=up(st.x, st.x_lo), c=up(st.c, st.c_lo), y=up(st.y, st.y_lo),
        z_l=up(st.z_l, st.zl_lo), z_u=up(st.z_u, st.zu_lo),
        y_l=up(st.y_l, st.yl_lo), y_u=up(st.y_u, st.yu_lo),
        x_lo=zn, c_lo=zm, y_lo=zm, zl_lo=zn, zu_lo=zn,
        yl_lo=zm, yu_lo=zm,
        s_l=up(st.s_l), s_u=up(st.s_u), t_l=up(st.t_l), t_u=up(st.t_u),
        mu=up(st.mu), res_p=up(st.res_p), res_d=up(st.res_d),
        res_c=up(st.res_c), best_infeas=up(st.best_infeas),
        halt=jnp.array(False), converged=jnp.array(False),
        stall=jnp.array(0, jnp.int32))
    ctl64 = dataclasses.replace(ctl, dtype="float64")
    for _ in range(extra_iters):
        st64 = _sparse_ipm_step(qp64, masks, st64, ctl64)
        if bool(st64.halt):
            break
    if qp.g.dtype == jnp.float64:
        return st64
    # fold the refined f64 iterate BACK into the caller's double-word
    # f32 representation (hi = f32(v), lo = f32(v - hi)) so downstream
    # extraction/indicators keep f32 semantics after the x64 flag is
    # restored; solution_dw reconstructs the full-accuracy values
    f4 = jnp.float32

    def dw(v):
        hi = jnp.asarray(v, f4)
        return hi, jnp.asarray(v - hi.astype(f8), f4)

    x, x_lo = dw(st64.x)
    c, c_lo = dw(st64.c)
    y, y_lo = dw(st64.y)
    z_l, zl_lo = dw(st64.z_l)
    z_u, zu_lo = dw(st64.z_u)
    y_l, yl_lo = dw(st64.y_l)
    y_u, yu_lo = dw(st64.y_u)
    return dataclasses.replace(
        st64,
        x=x, x_lo=x_lo, c=c, c_lo=c_lo, y=y, y_lo=y_lo,
        z_l=z_l, zl_lo=zl_lo, z_u=z_u, zu_lo=zu_lo,
        y_l=y_l, yl_lo=yl_lo, y_u=y_u, yu_lo=yu_lo,
        s_l=jnp.asarray(st64.s_l, f4), s_u=jnp.asarray(st64.s_u, f4),
        t_l=jnp.asarray(st64.t_l, f4), t_u=jnp.asarray(st64.t_u, f4),
        mu=jnp.asarray(st64.mu, f4),
        res_p=jnp.asarray(st64.res_p, f4),
        res_d=jnp.asarray(st64.res_d, f4),
        res_c=jnp.asarray(st64.res_c, f4),
        best_infeas=jnp.asarray(st64.best_infeas, f4))


def ipm_solve(qp: QP, ctl: IPMControl = IPMControl()):
    """Host-loop driver (single problem, early exit).

    Returns (x, y, z, state) — state carries status/iterations/residuals;
    a host-side ``state.inform`` (IPMInform) adds per-phase wall times,
    factorization/backsolve counts, and residual-history checkpoints
    (the inform contract, reference cqp.f90:484-575)."""
    import time as _time

    from ..core.checkpoint import checkpoint_init, checkpoint_update

    t_start = _time.perf_counter()
    # entry restrictions (-3) / bound consistency (-4): the per-solver
    # input checks of the reference (src/cqp/cqp.f90 n >= 1, m >= 0,
    # x_l <= x_u, c_l <= c_u -> statuses -3 / -4)
    from ..core.problem import check_qp

    bad = check_qp(qp, ctl.infinity)
    if bad != 0:
        # the offending problem may not even have consistent shapes;
        # scaffold the returned state from a well-formed zero problem
        dt = qp.g.dtype
        qp = QP(H=None, g=jnp.zeros(qp.n, dt),
                A=jnp.zeros((qp.m, qp.n), dt),
                c_l=jnp.full(qp.m, -INFINITY, dt),
                c_u=jnp.full(qp.m, INFINITY, dt),
                x_l=jnp.full(qp.n, -INFINITY, dt),
                x_u=jnp.full(qp.n, INFINITY, dt), h_kind="zero")
    masks = classify_bounds(qp, ctl.infinity)
    st = ipm_init(qp, masks, ctl)
    if bad != 0:
        st = dataclasses.replace(
            st, halt=jnp.array(True),
            status=jnp.array(bad, jnp.int32))
    qp = dataclasses.replace(qp, name="")   # avoid per-name recompilation
    # Sparse problems now run the SAME single fused jitted step as the
    # dense path: the flat supernodal factorize/solve are trace-safe
    # (supernodal_flat._factorize_body/_solve_body) and their inner
    # shape-cached kernels become shared subcomputations, so the whole
    # Mehrotra/series-arc iteration — KKT assemble + factorize +
    # predictor/corrector solves + step — compiles into ONE XLA program
    # per (pattern, ctl) and dispatches ONCE per iteration (round-5 fix
    # for the ~4700 host dispatches/iteration; series arcs now run on
    # the flagship path too).  GALAHAD_TPU_FUSED=0 restores the round-4
    # split/eager drivers.
    from ..linalg.supernodal_flat import _fused_enabled

    if getattr(qp, "h_kind", None) == "sparse" and not _fused_enabled():
        if ctl.arc in ("taylor", "puiseux", "zhao_sun") \
                and ctl.series_order >= 2:
            # series arcs keep the generic (eager) step — correct but
            # per-op dispatched; the flagship default is the split step
            step = lambda q, mk, s: ipm_step(q, mk, s, ctl)
        else:
            step = lambda q, mk, s: _sparse_ipm_step(q, mk, s, ctl)
    elif ctl.steps_per_fetch > 1 and ctl.print_level < 1:
        step = lambda q, mk, s: _jitted_multi_step(q, mk, s, ctl,
                                                   q.h_kind)
    else:
        step = lambda q, mk, s: _jitted_step(q, mk, s, ctl, q.h_kind)
    t_pre = _time.perf_counter()
    cp = checkpoint_init()
    t_analyse = 0.0
    t_solve = 0.0
    timed_out = False
    prev_st = None
    best_st = None
    best_kkt = float("inf")
    d_hist: list = []   # dual-stall detector for the f64 island
    sparse_f32 = (getattr(qp, "h_kind", None) == "sparse"
                  and qp.g.dtype == jnp.float32)
    import numpy as _np

    it_now = 0
    first_fetch = True
    while it_now < (0 if bad != 0 else ctl.maxit):
        t0 = _time.perf_counter()
        prev_st = st
        st = step(qp, masks, st)   # 1..steps_per_fetch iterations
        # ONE host fetch per dispatch round: through a remote/tunnel
        # backend each device->host scalar read costs ~30 ms, so the
        # loop's monitoring scalars travel together (also the true
        # completion fence — block_until_ready can be acked before
        # execution on relay backends)
        f = jnp.float64 if st.res_p.dtype == jnp.float64 else jnp.float32
        mon = _np.asarray(jnp.stack([
            st.res_p.astype(f), st.res_d.astype(f), st.res_c.astype(f),
            st.mu.astype(f), st.halt.astype(f),
            st.iter.astype(f)]))
        res_p, res_d, res_c, mu_h = (float(mon[0]), float(mon[1]),
                                     float(mon[2]), float(mon[3]))
        it_now = int(round(float(mon[5])))
        dt_it = _time.perf_counter() - t0
        if first_fetch:
            t_analyse = dt_it            # trace + compile + first round
        else:
            t_solve += dt_it
        cp = checkpoint_update(
            cp, max(res_p, res_d, res_c),
            it_now, _time.perf_counter() - t_start)
        if ctl.print_level >= 1:
            if first_fetch:
                print(" iter     p-feas     d-feas   com-slck"
                      "         mu    time")
            print(f"{it_now:5d} {res_p:10.2e}"
                  f" {res_d:10.2e} {res_c:10.2e}"
                  f" {mu_h:10.2e}"
                  f" {_time.perf_counter() - t_start:7.2f}")
        first_fetch = False
        kkt_now = max(res_p, res_d, res_c)
        if kkt_now < best_kkt:
            best_kkt = kkt_now
            best_st = st
        if mon[4] != 0.0:                # halt flag
            break
        # dual-stall: primal+comp done, dual floored by f32 solve
        # accuracy and no longer improving -> stop burning f32
        # iterations; the f64 island below finishes (SURVEY §7.1)
        if (sparse_f32 and ctl.endgame_f64
                and res_p <= ctl.stop_abs_p
                and res_c <= ctl.stop_abs_c):
            d_hist.append(res_d)
            if (len(d_hist) >= 4
                    and min(d_hist[-2:]) > 0.7 * min(d_hist[:-2])):
                break
        # the limit governs SOLVE time: the first iteration's wall is
        # dominated by trace+XLA compile (an artifact of the jit
        # execution model with no reference analogue), so it is
        # excluded — otherwise a cold-cache run at n~1e5 spends the
        # whole budget compiling and reports -19 after one step
        if (ctl.clock_time_limit >= 0
                and _time.perf_counter() - t_start - t_analyse
                > ctl.clock_time_limit):
            timed_out = True
            break
    if timed_out and not bool(st.converged):
        st = dataclasses.replace(
            st, halt=jnp.array(True),
            status=jnp.array(int(Status.CPU_LIMIT), jnp.int32))
    # Best-iterate recovery (cqp.f90:163-168 residual-monitoring
    # contract): if late iterations degraded the KKT residuals, report
    # the best iterate actually attained, keeping the diagnosed status.
    if (best_st is not None and not bool(st.converged)
            and best_kkt < max(float(st.res_p), float(st.res_d),
                               float(st.res_c))):
        st = dataclasses.replace(
            best_st, iter=st.iter, halt=st.halt, status=st.status,
            converged=st.converged)
    # --- f64 endgame island (sparse f32 path) --------------------------
    # The f32 KKT solves floor the DUAL residual a few times above 1e-6
    # once primal/complementarity are done; one or two f64 iterations
    # from the folded double-word iterate close the gap (SURVEY §7.1).
    if (ctl.endgame_f64 and not bool(st.converged)
            and getattr(qp, "h_kind", None) == "sparse"
            and qp.g.dtype == jnp.float32
            and float(st.res_p) <= 10 * ctl.stop_abs_p
            and float(st.res_c) <= 10 * ctl.stop_abs_c):
        # probe f64 support once instead of swallowing island failures
        # wholesale (advisor r4: a blanket except hid real bugs)
        if _backend_supports_f64():
            st = _sparse_f64_island(qp, st, ctl, extra_iters=6)
        else:
            import warnings

            warnings.warn(
                "f64 endgame island skipped: backend has no float64 "
                "support; dual residual may floor above stop_abs_d",
                RuntimeWarning, stacklevel=2)
    x, y, z = extract_solution(qp, masks, st)
    b_stat, c_stat = ipm_indicators(qp, masks, st, ctl, prev=prev_st)
    iters = int(st.iter)
    st.inform = IPMInform(
        status=int(st.status), iter=iters,
        nfacts=iters,
        nbacts=iters * max(ctl.series_order, 1) * (1 + ctl.refine),
        obj=float(qp.objective(x)),
        primal_infeasibility=float(st.res_p),
        dual_infeasibility=float(st.res_d),
        complementary_slackness=float(st.res_c),
        time=PhaseTimes(
            total=_time.perf_counter() - t_start,
            preprocess=t_pre - t_start,
            analyse=t_analyse,
            solve=t_solve,
        ),
        checkpoints_iter=np_asarray_int(cp.iters),
        checkpoints_time=np_asarray_f(cp.times),
        b_stat=np_asarray_int(b_stat),
        c_stat=np_asarray_int(c_stat),
    )
    return x, y, z, st


def np_asarray_int(a):
    import numpy as _np

    return _np.asarray(a, _np.int32)


def np_asarray_f(a):
    import numpy as _np

    return _np.asarray(a, _np.float64)


def ipm_solve_compiled(qp: QP, ctl: IPMControl = IPMControl()):
    """Fully-compiled driver: lax.while_loop, suitable for vmap/shard_map
    over batches of same-shape problems (SURVEY §5.7: the batched-
    subproblem axis is the TPU headline win)."""
    masks = classify_bounds(qp, ctl.infinity)
    st0 = ipm_init(qp, masks, ctl)

    def cond(st):
        return (~st.halt) & (st.iter < ctl.maxit)

    def body(st):
        return ipm_step(qp, masks, st, ctl)

    st = jax.lax.while_loop(cond, body, st0)
    x, y, z = extract_solution(qp, masks, st)
    return x, y, z, st
