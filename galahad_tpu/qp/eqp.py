"""Equality-constrained QP (EQP) with optional trust region.

TPU-native re-design of GALAHAD's EQP (reference src/eqp/eqp.f90:
EQP_solve :693, factorize :1613, nullspace solve :2013):

    min 1/2 x'Hx + g'x + f   s.t.  A x = c   (and ||x|| <= radius)

The reference factorizes the KKT matrix with SBLS and runs projected
preconditioned CG (GLTR) in the nullspace.  Here:
  * a particular solution x0 = A'(AA')^-1 c via one SPD Cholesky of AA'
    (MXU matmul + batched potrf);
  * nullspace projection P(v) = v - A'(AA')^-1 A v as a closure;
  * the reduced problem min 1/2 s'(PHP)s + (P(g + H x0))'s, ||s||<=radius
    handed to GLTR (tr/gltr.py) — projection plays the preconditioner
    role, so iterates stay in null(A) to machine precision;
  * multipliers recovered by least squares y = (AA')^-1 A (Hx + g).
Fully jittable and batched.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from ..linalg.cholesky import chol_factor_shifted, chol_solve
from ..tr.gltr import GLTRControl, gltr_solve


@control_dc
class EQPControl:
    gltr_itmax: int = 128
    radius: float = 0.0          # 0 -> effectively unconstrained (1e20)
    delta: float = 1.0e-12       # AA' regularization


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "obj", "norm_x", "multiplier", "iter"],
    meta_fields=[],
)
@dataclasses.dataclass
class EQPInfo:
    x: Any
    y: Any
    obj: Any
    norm_x: Any
    multiplier: Any
    iter: Any


def eqp_solve(H, g, A, c, f=0.0, ctl: EQPControl = EQPControl()) -> EQPInfo:
    """Solve the (trust-region) equality-constrained QP.  H (n, n) dense
    symmetric (need not be definite when a radius is active), A (m, n)
    full row rank, c (m,)."""
    g = jnp.asarray(g)
    dt = g.dtype
    A = jnp.asarray(A, dt)
    H = jnp.asarray(H, dt)
    c = jnp.asarray(c, dt)
    m = A.shape[-2]

    AAt = A @ A.T + ctl.delta * jnp.eye(m, dtype=dt)
    L, _, _ = chol_factor_shifted(AAt, 0.0)

    def proj(v):
        return v - A.T @ chol_solve(L, A @ v)

    x0 = A.T @ chol_solve(L, c)          # min-norm particular solution
    g_red = proj(H @ x0 + g)

    radius = ctl.radius if ctl.radius > 0 else 1.0e20

    # P H P is singular along range(A'); acting as the identity there
    # removes spurious near-zero Ritz values from Lanczos drift without
    # touching the null(A) component the solve lives in.
    def reduced_op(v):
        pv = proj(v)
        return proj(H @ pv) + (v - pv)

    tr = gltr_solve(
        reduced_op, g_red, radius,
        ctl=GLTRControl(itmax=ctl.gltr_itmax),
    )
    s = proj(tr.x)
    x = x0 + s
    y = chol_solve(L, A @ (H @ x + g))
    obj = 0.5 * jnp.dot(x, H @ x) + jnp.dot(g, x) + f
    return EQPInfo(
        x=x, y=y, obj=obj, norm_x=jnp.linalg.norm(s),
        multiplier=tr.multiplier, iter=tr.iter,
    )
