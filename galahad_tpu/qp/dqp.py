"""Strictly-convex QP by dual projection (DQP) and the CCQP crossover.

TPU-native re-design of GALAHAD's DQP (reference src/dqp/dqp.f90:
DQP_solve :1111, DQP_solve_main :2705, exact arc search :306-310,
dual gradient step :4362-4431) and CCQP (src/ccqp/ccqp.f90:
CCQP_solve :690 — CQP interior point, then DQP refinement to a basic
solution).

For H SPD the Lagrange dual over w = (y_l, y_u, z_l, z_u) >= 0 is the
smooth concave quadratic

    theta(w) = -1/2 u' H^-1 u + b' w,   u(w) = B' w - g,
    B' w = A'(y_l - y_u) + (z_l - z_u),
    b = (c_l, -c_u, x_l, -x_u)

maximized over the nonnegative orthant (equality rows carry a free
multiplier).  Two methods:

  * ``exact_arc=True`` (default, the reference algorithm): alternate
      1. an EXACT arc search along the projected dual gradient — the
         dual restricted to the projected ray is piecewise quadratic
         with breakpoints where components hit their bound; the search
         walks the sorted breakpoints updating the directional gradient/
         curvature by ONE rank-one backsolve per segment (exactly the
         reference's exact_arc_search economics, dqp.f90:306 — its SCU
         face updates likewise cost one solve per face change), then
      2. a subspace Newton step on the free face, solved matrix-free by
         CG on K = B_F' H^-1 B_F (the reference's subspace_direct /
         GLTR alternative, dqp.f90:312-322),
    all inside one lax.while_loop — no host round trips.
  * ``exact_arc=False``: hand the dual to the projected trust-region
    engine (nlp/tru.trb_solve) — same fixed point, simpler machinery.

H^-1 is ONE upfront Cholesky (reference: single SLS factorization of H).

Warm starting — DQP's signature strength (the `warm` driver,
src/warm/usewarm.f90) — is first-class: pass (y, z) to start from.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP, classify_bounds
from ..core.status import Status
from ..linalg.cholesky import chol_factor_shifted, chol_solve
from ..nlp.tru import TRBControl, trb_solve

BIG = 1.0e30


@control_dc
class DQPControl:
    maxit: int = 200
    stop_d: float = 1.0e-8       # projected dual gradient stop
    exact_arc: bool = True       # exact piecewise-linear arc search
    max_arc_segments: int = 64   # breakpoints walked per arc search
    cg_maxit: int = 32           # subspace CG iterations
    infinity: float = INFINITY


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "z", "obj", "iter", "converged", "status",
                 "norm_pg"],
    meta_fields=[],
)
@dataclasses.dataclass
class DQPInfo:
    x: Any
    y: Any
    z: Any
    obj: Any
    iter: Any
    converged: Any
    status: Any
    norm_pg: Any


def _dual_pieces(qp: QP, masks, ctl):
    """Static dual-space data: bounds (w_lo, w_hi), linear term b, and
    the B' / B actions (u = B'w - g)."""
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    big = jnp.asarray(BIG, dt)

    yl_lo = jnp.where(masks.c_equality, -big, 0.0)
    yl_hi = jnp.where(masks.has_cl | masks.c_equality, big, 0.0)
    yu_hi = jnp.where(masks.has_cu & ~masks.c_equality, big, 0.0)
    zl_lo = jnp.where(masks.x_fixed, -big, 0.0)
    zl_hi = jnp.where(masks.has_xl, big, 0.0)
    zu_hi = jnp.where(masks.has_xu & ~masks.x_fixed, big, 0.0)
    w_lo = jnp.concatenate([yl_lo, jnp.zeros(m, dt), zl_lo, jnp.zeros(n, dt)])
    w_hi = jnp.concatenate([yl_hi, yu_hi, zl_hi, zu_hi])

    c_l = jnp.where(masks.has_cl, qp.c_l, 0.0) if m else qp.c_l
    c_u = jnp.where(masks.has_cu, qp.c_u, 0.0) if m else qp.c_u
    x_l = jnp.where(masks.has_xl, qp.x_l, 0.0)
    x_u = jnp.where(masks.has_xu, qp.x_u, 0.0)
    b = jnp.concatenate([c_l, -c_u, x_l, -x_u])

    def Bt(w):          # (2m+2n,) -> (n,):  A'(y_l - y_u) + z_l - z_u
        y = w[:m] - w[m:2 * m]
        z = w[2 * m:2 * m + n] - w[2 * m + n:]
        return z + (qp.Aty(y) if m else 0.0)

    def Bv(v):          # (n,) -> (2m+2n,): adjoint
        Av = qp.Ax(v) if m else jnp.zeros((0,), dt)
        return jnp.concatenate([Av, -Av, v, -v])

    return w_lo, w_hi, b, Bt, Bv


def dqp_solve(qp: QP, y0=None, z0=None,
              ctl: DQPControl = DQPControl()) -> DQPInfo:
    """Solve a strictly convex QP through its dual.  H must be SPD
    (h_kind dense/diagonal/identity/scaled_identity with positive
    entries).  y0/z0 warm-start the duals."""
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    from ..core.problem import check_qp

    bad = check_qp(qp, ctl.infinity)           # -3 / -4 entry contract
    if bad != 0:
        z0_ = jnp.zeros(n, dt)
        return DQPInfo(x=z0_, y=jnp.zeros(m, dt), z=z0_,
                       obj=jnp.asarray(jnp.nan, dt),
                       iter=jnp.asarray(0, jnp.int32),
                       converged=jnp.asarray(False),
                       status=jnp.asarray(bad, jnp.int32),
                       norm_pg=jnp.asarray(jnp.inf, dt))
    masks = classify_bounds(qp, ctl.infinity)

    # H^-1 closure: one factorization up front
    if qp.h_kind in ("diagonal", "identity", "scaled_identity", "zero"):
        hd = qp.H_diag()
        Hinv = lambda v: v / hd
    else:
        L, _, _ = chol_factor_shifted(qp.H, 0.0)
        Hinv = lambda v: chol_solve(L, v)

    w_lo, w_hi, b, Bt, Bv = _dual_pieces(qp, masks, ctl)

    if y0 is None:
        y0 = jnp.zeros(m, dt)
    if z0 is None:
        z0 = jnp.zeros(n, dt)
    w0 = jnp.concatenate([
        jnp.maximum(y0, 0.0), jnp.maximum(-y0, 0.0),
        jnp.maximum(z0, 0.0), jnp.maximum(-z0, 0.0),
    ])
    w0 = jnp.clip(w0, w_lo, w_hi)

    if not ctl.exact_arc:
        def neg_dual(w):
            u = Bt(w) - qp.g
            return -( -0.5 * jnp.dot(u, Hinv(u)) + jnp.dot(b, w))

        st = trb_solve(neg_dual, w0, w_lo, w_hi,
                       TRBControl(maxit=ctl.maxit,
                                  stop_g_absolute=ctl.stop_d,
                                  stop_g_relative=0.0))
        w, iters, conv, status, npg = (st.x, st.iter, st.converged,
                                       st.status, st.norm_g)
    else:
        def grad_theta(w):
            u = Bt(w) - qp.g
            return b - Bv(Hinv(u))

        def proj_grad(w, g):
            lo_act = w <= w_lo
            hi_act = w >= w_hi
            d = jnp.where(lo_act, jnp.maximum(g, 0.0), g)
            d = jnp.where(hi_act, jnp.minimum(d, 0.0), d)
            return d

        Hig = Hinv(qp.g)

        def arc_search(w, d):
            """Exact arc search along the projected ray w(t) = P(w + td).

            The path is piecewise linear; between breakpoints theta is a
            concave quadratic whose slope p(t) = b'd - v'H^-1 u(t) and
            curvature q = -v'H^-1 v update across each breakpoint by
            removing that component's rank-one contribution — ONE H^-1
            backsolve per segment (the reference exact_arc_search
            economics, dqp.f90:306; its SCU face updates likewise cost
            one solve per face change)."""
            dt_ = w.dtype
            eps = jnp.asarray(1e-30, dt_)
            t_hit = jnp.where(
                d < 0, (w_lo - w) / jnp.where(d < 0, d, -1.0),
                jnp.where(d > 0, (w_hi - w) / jnp.where(d > 0, d, 1.0), BIG),
            )
            t_hit = jnp.where(jnp.abs(t_hit) >= BIG, BIG,
                              jnp.maximum(t_hit, 0.0))
            order = jnp.argsort(t_hit)
            K = min(ctl.max_arc_segments, int(t_hit.shape[0]))
            v0 = Bt(d)
            # unbounded-ray cap: theta increasing past every breakpoint
            # means the dual is unbounded (primal infeasible); move a
            # large FINITE multiple of the direction instead of BIG so
            # the iterate never jumps to the 1e30 bound sentinels
            nd = jnp.linalg.norm(d)
            t_cap = (1.0 + jnp.linalg.norm(w)) * 1e10 / jnp.maximum(nd, eps)
            carry0 = (jnp.array(0, jnp.int32), jnp.asarray(0.0, dt_), d,
                      v0, Hinv(v0), Hinv(Bt(w)) - Hig,
                      jnp.asarray(0.0, dt_), jnp.array(False))

            def cond(c):
                k, *_, done = c
                return (~done) & (k < K)

            def body(c):
                k, t_cur, d_cur, v, Hiv, Hiu, t_best, done = c
                j = order[k]
                t_next = jnp.minimum(t_hit[j], BIG)
                p = jnp.dot(b, d_cur) - jnp.dot(v, Hiu)
                q = -jnp.dot(v, Hiv)
                p_pos = p > eps          # noise-level slope = converged
                t_star = jnp.where(q < -eps, t_cur - p / q, BIG)
                inside = p_pos & (t_star < t_next)
                unbounded = p_pos & ~inside & (t_next >= BIG)
                t_take = jnp.where(
                    ~p_pos, t_cur,
                    jnp.where(inside, t_star,
                              jnp.where(unbounded,
                                        jnp.minimum(t_star, t_cap), t_next)))
                t_best = jnp.where(done, t_best, t_take)
                done = done | inside | ~p_pos | (t_next >= BIG)
                seg = t_next - t_cur
                Hiu = Hiu + seg * Hiv
                ej = jnp.zeros_like(d_cur).at[j].set(d_cur[j])
                vj = Bt(ej)
                return (k + 1, t_next, d_cur.at[j].set(0.0), v - vj,
                        Hiv - Hinv(vj), Hiu, t_best, done)

            out = lax.while_loop(cond, body, carry0)
            t_best = jnp.where(out[7], out[6], jnp.minimum(out[1], t_cap))
            return jnp.clip(w + t_best * d, w_lo, w_hi)

        def subspace_step(w):
            """CG on the free face: maximize theta over {i: w_i strictly
            inside} (the reference's subspace step, dqp.f90:312-322)."""
            g = grad_theta(w)
            free = (w > w_lo) & (w < w_hi)
            gm = jnp.where(free, g, 0.0)

            def Kmul(p):
                return jnp.where(free, Bv(Hinv(Bt(jnp.where(free, p, 0.0)))),
                                 0.0)

            # CG for K dw = gm (K PSD)
            def cg_body(i, c):
                p, r, x_, rs = c
                Kp = Kmul(p)
                denom = jnp.maximum(jnp.dot(p, Kp), 1e-30)
                alpha = rs / denom
                x_ = x_ + alpha * p
                r = r - alpha * Kp
                rs_new = jnp.dot(r, r)
                beta = rs_new / jnp.maximum(rs, 1e-30)
                return (r + beta * p, r, x_, rs_new)

            r0 = gm
            c0 = (r0, r0, jnp.zeros_like(w), jnp.dot(r0, r0))
            _, _, dw, _ = lax.fori_loop(0, ctl.cg_maxit, cg_body, c0)
            # fraction to boundary then exact arc polish along dw
            return arc_search(w, jnp.where(free, dw, 0.0))

        def pg_norm(w):
            g = grad_theta(w)
            return jnp.linalg.norm(proj_grad(w, g))

        def body(carry):
            w, it, _ = carry
            g = grad_theta(w)
            d = proj_grad(w, g)
            w = arc_search(w, d)
            w = subspace_step(w)
            return (w, it + 1, pg_norm(w))

        def cond(carry):
            w, it, npg_ = carry
            return (npg_ > ctl.stop_d) & (it < ctl.maxit)

        w, iters, npg = lax.while_loop(
            cond, body, (w0, jnp.array(0, jnp.int32), pg_norm(w0)))
        conv = npg <= ctl.stop_d
        status = jnp.where(conv, int(Status.OK),
                           int(Status.MAX_ITERATIONS)).astype(jnp.int32)

    y_l, y_u = w[:m], w[m:2 * m]
    z_l, z_u = w[2 * m:2 * m + n], w[2 * m + n:]
    y = y_l - y_u
    z = z_l - z_u
    u = z - qp.g + (qp.Aty(y) if m else 0.0)
    x = Hinv(u)
    return DQPInfo(
        x=x, y=y, z=z, obj=qp.objective(x),
        iter=iters, converged=conv, status=status,
        norm_pg=npg,
    )


def ccqp_solve(qp: QP, ipm_ctl=None, dqp_ctl: DQPControl = DQPControl()):
    """CCQP: interior-point solve then dual-projection refinement
    (reference src/ccqp/ccqp.f90:690).  The IPM supplies near-optimal
    duals; DQP sharpens them to an exact face, giving the basic
    solution the pure IPM cannot."""
    from .ipm import IPMControl, ipm_solve

    x, y, z, st = ipm_solve(qp, ipm_ctl or IPMControl())
    return dqp_solve(qp, y0=y, z0=z, ctl=dqp_ctl)
