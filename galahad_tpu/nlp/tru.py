"""Trust-region unconstrained / bound-constrained minimization (TRU, TRB).

TPU-native re-design of GALAHAD's TRU (reference src/tru/tru.f90:
TRU_solve :1102, main loop :2041-3649, TRS call :2845, GLTR call :2935,
ratio/radius update :2623-2650) and TRB (src/trb/trb.f90: TRB_solve
:1120, projection :2261).

Re-designs (SURVEY §7.1):
  * CUTEst eval callbacks / reverse communication -> a jax-traceable
    ``objective(x)`` callable; gradients via jax.grad, Hessians via
    jax.hessian, Hessian-vector products via jvp-of-grad.  The entire
    solve compiles into one XLA program (lax.while_loop), so batches of
    minimizations vmap.
  * subproblem_direct switch kept: True -> exact batched eigen-TRS
    (tr/trs.py), False -> GLTR Krylov with an HVP closure (no Hessian
    materialization; the O(n^2)-memory-free path).
  * TRB's gradient-projection + subspace iteration becomes a projected
    Cauchy search along the projected-gradient arc plus a masked-free-
    variable TRS step, shapes static throughout.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from ..core.problem import INFINITY
from ..core.status import Status
from ..tr.gltr import GLTRControl, gltr_solve
from ..tr.trs import TRSControl, trs_solve


@control_dc
class TRUControl:
    """Mirrors TRU_control_type defaults where meaningful
    (reference src/tru/tru.f90:226-440)."""

    maxit: int = 100
    initial_radius: float = 1.0e2
    maximum_radius: float = 1.0e8
    stop_g_absolute: float = 1.0e-5
    stop_g_relative: float = 1.0e-8
    eta_successful: float = 1.0e-2
    eta_very_successful: float = 0.9
    eta_too_successful: float = 2.0
    radius_increase: float = 2.0
    radius_reduce: float = 0.5
    subproblem_direct: bool = True
    gltr_itmax: int = 64
    model: str = "newton"       # "newton" | "bfgs" | "sr1" (LMS Hessians,
    # reference tru.f90 hessian_available=false paths via src/lms)
    lms_memory: int = 10
    dtype: str = "float64"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "f", "g", "radius", "iter", "converged", "status",
                 "norm_g"],
    meta_fields=[],
)
@dataclasses.dataclass
class TRUState:
    x: Any
    f: Any
    g: Any
    radius: Any
    iter: Any
    converged: Any
    status: Any
    norm_g: Any


def _hvp(objective, x):
    """Hessian-vector product closure at fixed x (replaces eval_HPROD,
    reference tru.f90 reverse-communication status 3)."""

    def hv(v):
        return jax.jvp(jax.grad(objective), (x,), (v,))[1]

    return hv


def _tr_step(objective, st, ctl: TRUControl, trs_ctl: TRSControl):
    """One TR iteration on the unconstrained problem."""
    if ctl.subproblem_direct:
        H = jax.hessian(objective)(st.x)
        tr = trs_solve(H, st.g, st.radius, ctl=trs_ctl)
    else:
        tr = gltr_solve(
            _hvp(objective, st.x), st.g, st.radius,
            ctl=GLTRControl(itmax=ctl.gltr_itmax),
        )
    s = tr.x
    f_trial = objective(st.x + s)
    pred = -tr.obj                        # model decrease (>= 0)
    ared = st.f - f_trial
    tiny = jnp.finfo(st.f.dtype).tiny
    ratio = ared / jnp.maximum(pred, tiny)
    return s, f_trial, ratio, tr.norm_x


def _radius_update(radius, ratio, norm_s, ctl: TRUControl, dt):
    """Reference tru.f90:2623-2650: shrink on failure, expand when very
    (but not 'too') successful."""
    very = (ratio >= ctl.eta_very_successful) & (ratio <= ctl.eta_too_successful)
    fail = ratio < ctl.eta_successful
    r = jnp.where(fail, ctl.radius_reduce * norm_s, radius)
    r = jnp.where(very, jnp.minimum(
        jnp.asarray(ctl.maximum_radius, dt),
        jnp.maximum(radius, ctl.radius_increase * norm_s)), r)
    return r


def tru_solve(objective: Callable, x0, ctl: TRUControl = TRUControl()):
    """Minimize a smooth objective from x0.  Fully jittable; batches of
    problems vmap over x0 (with a vmapped objective).

    model="newton" uses exact second derivatives (jax.hessian / HVP);
    "bfgs"/"sr1" use limited-memory secant Hessians (qn/lms.py) with
    GLTR subproblems — the reference's hessian-free configuration.

    Returns TRUState (the inform contract: status, iter, f, norm_g)."""
    x0 = jnp.asarray(x0)
    dt = x0.dtype
    trs_ctl = TRSControl()
    use_qn = ctl.model in ("bfgs", "sr1")
    if use_qn:
        from ..qn.lms import LMSControl, lms_apply, lms_setup, lms_update

    f0, g0 = jax.value_and_grad(objective)(x0)
    ng0 = jnp.linalg.norm(g0)
    stop_g = jnp.maximum(ctl.stop_g_absolute, ctl.stop_g_relative * ng0)

    st0 = TRUState(
        x=x0, f=f0, g=g0,
        radius=jnp.asarray(ctl.initial_radius, dt),
        iter=jnp.array(0, jnp.int32),
        converged=ng0 <= stop_g,
        status=jnp.where(ng0 <= stop_g, int(Status.OK),
                         int(Status.MAX_ITERATIONS)).astype(jnp.int32),
        norm_g=ng0,
    )

    def cond(carry):
        st = carry[0]
        return (~st.converged) & (st.iter < ctl.maxit)

    def body(carry):
        st, qn = carry
        if use_qn:
            tr = gltr_solve(lambda v: lms_apply(qn, v), st.g, st.radius,
                            ctl=GLTRControl(itmax=ctl.gltr_itmax))
            s = tr.x
            f_trial = objective(st.x + s)
            tiny = jnp.finfo(dt).tiny
            ratio = (st.f - f_trial) / jnp.maximum(-tr.obj, tiny)
            norm_s = tr.norm_x
        else:
            s, f_trial, ratio, norm_s = _tr_step(objective, st, ctl, trs_ctl)
        success = ratio >= ctl.eta_successful
        x = jnp.where(success, st.x + s, st.x)
        f = jnp.where(success, f_trial, st.f)
        g_new = jax.grad(objective)(x)
        g = jnp.where(success, g_new, st.g)
        if use_qn:
            qn_upd = lms_update(qn, s, g_new - st.g)
            qn = jax.tree_util.tree_map(
                lambda a, b: jnp.where(success, a, b), qn_upd, qn
            )
        radius = _radius_update(st.radius, ratio, norm_s, ctl, dt)
        ng = jnp.linalg.norm(g)
        conv = ng <= stop_g
        return TRUState(
            x=x, f=f, g=g, radius=radius, iter=st.iter + 1,
            converged=conv,
            status=jnp.where(conv, int(Status.OK),
                             int(Status.MAX_ITERATIONS)).astype(jnp.int32),
            norm_g=ng,
        ), qn

    if use_qn:
        qn0 = lms_setup(x0.shape[-1],
                        LMSControl(memory=ctl.lms_memory, method=ctl.model),
                        dtype=dt)
    else:
        qn0 = jnp.zeros((0,), dt)   # placeholder leaf
    st, _ = lax.while_loop(cond, body, (st0, qn0))
    return st


# ---------------------------------------------------------------------------
# TRB: bound-constrained trust region (reference src/trb/trb.f90)
# ---------------------------------------------------------------------------


@control_dc
class TRBControl(TRUControl):
    """TRB adds the Cauchy-search controls (reference trb.f90 controls)."""

    cauchy_backtracks: int = 20
    infinity: float = INFINITY


def _project(x, x_l, x_u):
    """TRB_projection (reference src/trb/trb.f90:50,2261)."""
    return jnp.clip(x, x_l, x_u)


def trb_solve(objective: Callable, x0, x_l, x_u,
              ctl: TRBControl = TRBControl()):
    """Bound-constrained TR minimization.

    Structure (reference trb.f90): at each iterate compute a generalized
    Cauchy point by backtracking along the projected-gradient arc of the
    quadratic model; fix the active set there; improve within the trust
    region over the free variables by a masked exact TRS; project the
    trial step; accept/reject on the true objective.
    Convergence on the projected-gradient norm ||P(x - g) - x||.
    """
    x0 = jnp.asarray(x0)
    x_l = jnp.asarray(x_l, x0.dtype)
    x_u = jnp.asarray(x_u, x0.dtype)
    dt = x0.dtype
    n = x0.shape[-1]
    trs_ctl = TRSControl()

    x0 = _project(x0, x_l, x_u)
    f0, g0 = jax.value_and_grad(objective)(x0)

    def pg_norm(x, g):
        return jnp.linalg.norm(_project(x - g, x_l, x_u) - x)

    ng0 = pg_norm(x0, g0)
    stop_g = jnp.maximum(ctl.stop_g_absolute, ctl.stop_g_relative * ng0)

    st0 = TRUState(
        x=x0, f=f0, g=g0,
        radius=jnp.asarray(ctl.initial_radius, dt),
        iter=jnp.array(0, jnp.int32),
        converged=ng0 <= stop_g,
        status=jnp.where(ng0 <= stop_g, int(Status.OK),
                         int(Status.MAX_ITERATIONS)).astype(jnp.int32),
        norm_g=ng0,
    )

    # "hvp": never materialize the Hessian — all curvature through
    # jvp-of-grad products and a masked GLTR free-subspace solve.  The
    # large-n configuration (LANCELOT's group-partial-separability role
    # is played by AD + XLA fusion; SURVEY §3.3).
    matrix_free = ctl.model == "hvp"

    def cauchy_point(st, Hop, model_q):
        """Backtracking projected search: t = t0 * beta^k, k = 0..K-1;
        pick the largest model decrease among feasible arc points within
        the radius (monotone Armijo-free variant of trb.f90's
        TRB_cauchy_get)."""
        t0 = st.radius / jnp.maximum(jnp.linalg.norm(st.g), 1e-30)
        betas = 0.5 ** jnp.arange(ctl.cauchy_backtracks, dtype=dt)

        def eval_t(t):
            s = _project(st.x - t * st.g, x_l, x_u) - st.x
            nrm = jnp.linalg.norm(s)
            ok = nrm <= st.radius
            m = model_q(s)
            return jnp.where(ok, m, jnp.inf), s

        ms, ss = jax.vmap(eval_t)(t0 * betas)
        k = jnp.argmin(ms)
        return ss[k], jnp.minimum(ms[k], 0.0)

    def body(st):
        if matrix_free:
            Hop = _hvp(objective, st.x)
            H = None
        else:
            H = jax.hessian(objective)(st.x)
            Hop = lambda v: H @ v  # noqa: E731

        def model_q(s):
            return jnp.dot(st.g, s) + 0.5 * jnp.dot(s, Hop(s))

        s_c, m_c = cauchy_point(st, Hop, model_q)
        # active set at the Cauchy point (reference: fix variables at
        # their bounds, solve on the free subspace)
        x_c = st.x + s_c
        eps_b = jnp.asarray(1e-10, dt)
        active = (x_c <= x_l + eps_b) | (x_c >= x_u - eps_b)
        free = ~active
        mask = free.astype(dt)
        g_f = jnp.where(free, st.g + Hop(s_c), 0.0)
        rad_left = jnp.sqrt(
            jnp.maximum(st.radius**2 - jnp.sum(s_c * s_c), 0.0)
        )
        if matrix_free:
            # masked Krylov solve: operator acts on the free subspace,
            # identity on the fixed one
            def op(v):
                return (mask * Hop(mask * v)
                        + (1.0 - mask) * v)

            tr = gltr_solve(op, g_f, rad_left,
                            ctl=GLTRControl(itmax=ctl.gltr_itmax))
        else:
            # masked TRS over free variables: freeze actives via unit diag
            H_ff = H * mask[:, None] * mask[None, :] + jnp.diag(
                jnp.where(free, 0.0, 1.0)
            )
            tr = trs_solve(H_ff, g_f, rad_left, ctl=trs_ctl)
        s_f = jnp.where(free, tr.x, 0.0)
        # combined step, projected to remain feasible
        s_trial = _project(st.x + s_c + s_f, x_l, x_u) - st.x
        m_trial = model_q(s_trial)
        # fall back to the Cauchy step if the subspace step hurt the model
        use_sub = m_trial <= m_c
        s = jnp.where(use_sub, s_trial, s_c)
        m_s = jnp.where(use_sub, m_trial, m_c)

        f_trial = objective(st.x + s)
        tiny = jnp.finfo(dt).tiny
        ratio = (st.f - f_trial) / jnp.maximum(-m_s, tiny)
        success = (ratio >= ctl.eta_successful) & (m_s < 0)
        x = jnp.where(success, st.x + s, st.x)
        f = jnp.where(success, f_trial, st.f)
        g = jnp.where(success, jax.grad(objective)(x), st.g)
        norm_s = jnp.linalg.norm(s)
        radius = _radius_update(st.radius, jnp.where(m_s < 0, ratio, 0.0),
                                jnp.maximum(norm_s, 1e-30), ctl, dt)
        ng = pg_norm(x, g)
        conv = ng <= stop_g
        return TRUState(
            x=x, f=f, g=g, radius=radius, iter=st.iter + 1,
            converged=conv,
            status=jnp.where(conv, int(Status.OK),
                             int(Status.MAX_ITERATIONS)).astype(jnp.int32),
            norm_g=ng,
        )

    def cond(st):
        return (~st.converged) & (st.iter < ctl.maxit)

    return lax.while_loop(cond, body, st0)
