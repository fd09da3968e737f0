"""Bound-constrained convex QP (BQP) and linear least squares (BLLS).

TPU-native equivalents of GALAHAD's BQP (reference src/bqp/bqp.f90:
BQP_solve :681 — gradient projection + subspace CG) and BLLS
(src/blls/blls.f90: BLLS_solve :786).

Both reduce to projected trust-region iteration on a quadratic model;
the shared engine is nlp/tru.py's trb_solve (projected Cauchy arc +
masked free-subspace TRS), which for a quadratic objective plays exactly
the reference's gradient-projection/subspace-CG role with the subspace
solved *exactly* per iteration.  These wrappers add the QP-contract
surface: explicit (H, g) / (A, b) data, dual variables z, and the
QP-style status/residual reporting.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from ..core.problem import INFINITY
from ..nlp.tru import TRBControl, trb_solve


@control_dc
class BQPControl:
    maxit: int = 100
    stop_d: float = 1.0e-8       # projected-gradient stop (dual feas)
    infinity: float = INFINITY


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "z", "obj", "iter", "converged", "status", "norm_pg"],
    meta_fields=[],
)
@dataclasses.dataclass
class BQPInfo:
    x: Any
    z: Any            # bound duals: z = Hx + g at the solution
    obj: Any
    iter: Any
    converged: Any
    status: Any
    norm_pg: Any


def bqp_solve(H, g, x_l, x_u, x0=None, f=0.0,
              ctl: BQPControl = BQPControl()) -> BQPInfo:
    """min 1/2 x'Hx + g'x + f  s.t.  x_l <= x <= x_u  (H PSD).

    Returns BQPInfo with z = Hx + g (the multiplier of whichever bound
    is active; zero residual on free variables at optimality)."""
    g = jnp.asarray(g)
    dt = g.dtype
    H = jnp.asarray(H, dt)
    x_l = jnp.asarray(x_l, dt)
    x_u = jnp.asarray(x_u, dt)
    n = g.shape[-1]
    if x0 is None:
        x0 = jnp.clip(jnp.zeros(n, dt), x_l, x_u)

    def obj(x):
        return 0.5 * jnp.dot(x, H @ x) + jnp.dot(g, x) + f

    st = trb_solve(obj, x0, x_l, x_u,
                   TRBControl(maxit=ctl.maxit, stop_g_absolute=ctl.stop_d,
                              stop_g_relative=0.0))
    z = H @ st.x + g
    return BQPInfo(
        x=st.x, z=z, obj=st.f, iter=st.iter, converged=st.converged,
        status=st.status, norm_pg=st.norm_g,
    )


@control_dc
class BLLSControl:
    maxit: int = 100
    stop_d: float = 1.0e-8
    weight: float = 0.0          # optional ridge term (reference BLLS
    # regularization weight)
    infinity: float = INFINITY


def blls_solve(A, b, x_l, x_u, x0=None,
               ctl: BLLSControl = BLLSControl()) -> BQPInfo:
    """min 1/2||Ax - b||^2 + (weight/2)||x||^2  s.t.  x_l <= x <= x_u
    (reference src/blls/blls.f90:786)."""
    A = jnp.asarray(A)
    dt = A.dtype
    b = jnp.asarray(b, dt)
    x_l = jnp.asarray(x_l, dt)
    x_u = jnp.asarray(x_u, dt)
    n = A.shape[-1]
    if x0 is None:
        x0 = jnp.clip(jnp.zeros(n, dt), x_l, x_u)

    w = ctl.weight

    def obj(x):
        r = A @ x - b
        out = 0.5 * jnp.dot(r, r)
        if w > 0:
            out = out + 0.5 * w * jnp.dot(x, x)
        return out

    st = trb_solve(obj, x0, x_l, x_u,
                   TRBControl(maxit=ctl.maxit, stop_g_absolute=ctl.stop_d,
                              stop_g_relative=0.0))
    z = A.T @ (A @ st.x - b)
    if w > 0:
        z = z + w * st.x
    return BQPInfo(
        x=st.x, z=z, obj=st.f, iter=st.iter, converged=st.converged,
        status=st.status, norm_pg=st.norm_g,
    )
