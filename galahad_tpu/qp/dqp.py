"""Strictly-convex QP by dual projection (DQP) and the CCQP crossover.

TPU-native re-design of GALAHAD's DQP (reference src/dqp/dqp.f90:
DQP_solve :1111, DQP_solve_main :2705, dual gradient step :4362-4431)
and CCQP (src/ccqp/ccqp.f90: CCQP_solve :690 — CQP interior point, then
DQP refinement to a basic solution).

For H SPD the Lagrange dual over w = (y_l, y_u, z_l, z_u) >= 0 is the
smooth concave quadratic

    theta(w) = -1/2 u'H^-1 u - g'H^-1 u ... with u = A'(y_l - y_u) + (z_l - z_u)

maximized over the nonnegative orthant (equality rows carry a free
multiplier).  The reference alternates exact piecewise-linear arc
searches with subspace steps on the active face, using SCU updates as
the face changes.  Here the dual is handed to the projected trust-region
engine (nlp/tru.trb_solve): the projected Cauchy arc plays the arc
search, the masked-subspace TRS is the face step solved *exactly*, and
active-set changes cost nothing because shapes are static.  H^-1 is one
upfront Cholesky (reference: single SLS factorization of H,
dqp.f90 "factorize H once").

Warm starting — DQP's signature strength (the `warm` driver,
src/warm/usewarm.f90) — is first-class: pass (y, z) to start from.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP, classify_bounds
from ..linalg.cholesky import chol_factor_shifted, chol_solve
from ..nlp.tru import TRBControl, trb_solve


@control_dc
class DQPControl:
    maxit: int = 200
    stop_d: float = 1.0e-8       # projected dual gradient stop
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


def dqp_solve(qp: QP, y0=None, z0=None,
              ctl: DQPControl = DQPControl()) -> DQPInfo:
    """Solve a strictly convex QP through its dual.  H must be SPD
    (h_kind dense/diagonal/identity/scaled_identity with positive
    entries).  y0/z0 warm-start the duals."""
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    masks = classify_bounds(qp, ctl.infinity)

    # H^-1 closure: one factorization up front
    if qp.h_kind in ("diagonal", "identity", "scaled_identity", "zero"):
        hd = qp.H_diag()
        Hinv = lambda v: v / hd
    else:
        L, _, _ = chol_factor_shifted(qp.H, 0.0)
        Hinv = lambda v: chol_solve(L, v)

    big = jnp.asarray(2 * INFINITY, dt)

    # dual variable layout: w = [y_l (m), y_u (m), z_l (n), z_u (n)]
    # equality rows: y_l free, y_u fixed at 0.
    # nonexistent bounds: fixed at 0.
    yl_lo = jnp.where(masks.c_equality, -big, 0.0)
    yl_hi = jnp.where(masks.has_cl | masks.c_equality, big, 0.0)
    yu_hi = jnp.where(masks.has_cu & ~masks.c_equality, big, 0.0)
    zl_lo = jnp.where(masks.x_fixed, -big, 0.0)
    zl_hi = jnp.where(masks.has_xl, big, 0.0)
    zu_hi = jnp.where(masks.has_xu & ~masks.x_fixed, big, 0.0)

    w_lo = jnp.concatenate([yl_lo, jnp.zeros(m, dt), zl_lo, jnp.zeros(n, dt)])
    w_hi = jnp.concatenate([yl_hi, yu_hi, zl_hi, zu_hi])

    # bound values with "no bound" entries neutralized (their dual is
    # fixed at 0, so the coefficient is irrelevant; avoid inf*0)
    c_l = jnp.where(masks.has_cl, qp.c_l, 0.0) if m else qp.c_l
    c_u = jnp.where(masks.has_cu, qp.c_u, 0.0) if m else qp.c_u
    x_l = jnp.where(masks.has_xl, qp.x_l, 0.0)
    x_u = jnp.where(masks.has_xu, qp.x_u, 0.0)

    def split(w):
        return w[:m], w[m:2 * m], w[2 * m:2 * m + n], w[2 * m + n:]

    def neg_dual(w):
        y_l, y_u, z_l, z_u = split(w)
        y = y_l - y_u
        z = z_l - z_u
        u = z - qp.g + (qp.A.T @ y if m else 0.0)
        x = Hinv(u)
        theta = (
            -0.5 * jnp.dot(u, x)
            + jnp.dot(y_l, c_l) - jnp.dot(y_u, c_u)
            + jnp.dot(z_l, x_l) - jnp.dot(z_u, x_u)
        ) if m else (
            -0.5 * jnp.dot(u, x) + jnp.dot(z_l, x_l) - jnp.dot(z_u, x_u)
        )
        return -theta

    if y0 is None:
        y0 = jnp.zeros(m, dt)
    if z0 is None:
        z0 = jnp.zeros(n, dt)
    w0 = jnp.concatenate([
        jnp.maximum(y0, 0.0), jnp.maximum(-y0, 0.0),
        jnp.maximum(z0, 0.0), jnp.maximum(-z0, 0.0),
    ])
    w0 = jnp.clip(w0, w_lo, w_hi)

    st = trb_solve(neg_dual, w0, w_lo, w_hi,
                   TRBControl(maxit=ctl.maxit, stop_g_absolute=ctl.stop_d,
                              stop_g_relative=0.0))
    y_l, y_u, z_l, z_u = split(st.x)
    y = y_l - y_u
    z = z_l - z_u
    u = z - qp.g + (qp.A.T @ y if m else 0.0)
    x = Hinv(u)
    return DQPInfo(
        x=x, y=y, z=z, obj=qp.objective(x),
        iter=st.iter, converged=st.converged, status=st.status,
        norm_pg=st.norm_g,
    )


def ccqp_solve(qp: QP, ipm_ctl=None, dqp_ctl: DQPControl = DQPControl()):
    """CCQP: interior-point solve then dual-projection refinement
    (reference src/ccqp/ccqp.f90:690).  The IPM supplies near-optimal
    duals; DQP sharpens them to an exact face, giving the basic
    solution the pure IPM cannot."""
    from .ipm import IPMControl, ipm_solve

    x, y, z, st = ipm_solve(qp, ipm_ctl or IPMControl())
    return dqp_solve(qp, y0=y, z0=z, ctl=dqp_ctl)
