"""Optimality measures (KKT residuals).

TPU-native equivalent of GALAHAD's OPT package
(reference src/opt/opt.f90:32-34: OPT_primal_infeasibility,
OPT_dual_infeasibility, OPT_complementary_slackness) — fully jittable and
batched (all reductions are jnp ops so vmap/psum compose).
"""
from __future__ import annotations

import jax.numpy as jnp

from .problem import INFINITY, QP


def primal_infeasibility(qp: QP, x, c=None, infinity: float = INFINITY):
    """max violation of c_l <= Ax <= c_u and x_l <= x <= x_u (inf-norm)."""
    viol = jnp.array(0.0, x.dtype)
    if qp.m > 0:
        if c is None:
            c = qp.Ax(x)
        lo = jnp.where(qp.c_l > -infinity, qp.c_l - c, 0.0)
        hi = jnp.where(qp.c_u < infinity, c - qp.c_u, 0.0)
        viol = jnp.maximum(viol, jnp.max(jnp.maximum(lo, hi), initial=0.0))
    lo = jnp.where(qp.x_l > -infinity, qp.x_l - x, 0.0)
    hi = jnp.where(qp.x_u < infinity, x - qp.x_u, 0.0)
    return jnp.maximum(viol, jnp.max(jnp.maximum(lo, hi), initial=0.0))


def dual_infeasibility(qp: QP, x, y, z):
    """inf-norm of the dual residual  Hx + g - A'y - z."""
    r = qp.Hx(x) + qp.g
    if qp.m > 0:
        r = r - qp.Aty(y)
    r = r - z
    return jnp.max(jnp.abs(r))


def complementary_slackness(qp: QP, x, y, z, c=None,
                            infinity: float = INFINITY):
    """inf-norm of complementarity products for all active-side pairs.

    For two-sided bounds the reference measures
    min(x - x_l, |z|)-type products; we use the standard
    |(x - x_l) z_l|, |(x_u - x) z_u| with z split by sign
    (z_l = max(z, 0), z_u = max(-z, 0)), matching the IPM convention
    z = z_l - z_u, y = y_l - y_u (reference src/cqp/cqp.f90 solve docs).
    """
    z_l = jnp.maximum(z, 0.0)
    z_u = jnp.maximum(-z, 0.0)
    comp_l = jnp.where(qp.x_l > -infinity, (x - qp.x_l) * z_l, z_l * 0.0)
    comp_u = jnp.where(qp.x_u < infinity, (qp.x_u - x) * z_u, z_u * 0.0)
    comp = jnp.max(jnp.abs(comp_l), initial=0.0)
    comp = jnp.maximum(comp, jnp.max(jnp.abs(comp_u), initial=0.0))
    if qp.m > 0:
        if c is None:
            c = qp.Ax(x)
        y_l = jnp.maximum(y, 0.0)
        y_u = jnp.maximum(-y, 0.0)
        cl = jnp.where(qp.c_l > -infinity, (c - qp.c_l) * y_l, y_l * 0.0)
        cu = jnp.where(qp.c_u < infinity, (qp.c_u - c) * y_u, y_u * 0.0)
        comp = jnp.maximum(comp, jnp.max(jnp.abs(cl), initial=0.0))
        comp = jnp.maximum(comp, jnp.max(jnp.abs(cu), initial=0.0))
    return comp


def kkt_residuals(qp: QP, x, y, z, c=None, infinity: float = INFINITY):
    """Returns (primal, dual, complementarity) inf-norm residual triple."""
    return (
        primal_infeasibility(qp, x, c, infinity),
        dual_infeasibility(qp, x, y, z),
        complementary_slackness(qp, x, y, z, c, infinity),
    )
