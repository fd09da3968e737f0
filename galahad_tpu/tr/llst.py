"""LLST / LLS: trust-region-constrained linear least squares.

TPU-native re-design of GALAHAD's LLST (reference src/llst/llst.f90 —
min ||Ax - b||_2 s.t. ||Sx||_2 <= radius, solved exactly by a secular
iteration with SBLS factorizations of the shifted augmented system) and
LLS (src/lls/lls.f90 — the same subproblem solved iteratively by
projected preconditioned CG through SBLS + GLTR).

Re-designs:
  * LLST: the reference refactorizes [[lambda S'S, A'], [A, -I]] per
    secular step; here one batched SVD of A S^-1 diagonalizes the whole
    lambda-path, and the secular equation ||x(lambda)|| = radius is
    solved by a safeguarded scalar Newton in the singular basis — the
    same math as tr/trs.py's eigen-secular TRS but on singular values
    (no per-step factorization at all, and thousands of instances
    vmap).
  * LLS: GLTR on the normal operator A'A — the matvec is two GEMVs and
    the solver inherits GLTR's lax.while_loop Lanczos.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from .gltr import GLTRControl, gltr_solve


@control_dc
class LLSTControl:
    max_newton: int = 64
    tol: float = 1.0e-12


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "r_norm", "x_norm", "multiplier"],
    meta_fields=[],
)
@dataclasses.dataclass
class LLSTInfo:
    x: Any
    r_norm: Any
    x_norm: Any
    multiplier: Any


def llst_solve(A, b, radius, S=None,
               ctl: LLSTControl = LLSTControl()) -> LLSTInfo:
    """Exact solution of min ||Ax - b|| s.t. ||Sx|| <= radius.

    S is None (identity) or a (n,) diagonal scaling (the reference
    supports general S through its factorization; the diagonal case
    covers the scaling norms the TR methods use).  Fully jittable and
    vmappable over batches of (A, b, radius).
    """
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    dt = A.dtype
    radius = jnp.asarray(radius, dt)
    if S is not None:
        As = A / S[None, :]
    else:
        As = A
    # min ||As w - b||, ||w|| <= radius, x = w / S
    U, sv, Vt = jnp.linalg.svd(As, full_matrices=False)
    beta = U.T @ b                      # projections onto left vectors
    # w(lambda) = V diag(sv/(sv^2+lambda)) beta ; phi(lambda)=||w||-radius
    sv2 = sv * sv

    def wnorm2(lam):
        d = sv * beta / (sv2 + lam)
        return jnp.sum(d * d)

    # interior solution (lambda = 0; pseudo-inverse for rank-deficiency)
    tiny = jnp.asarray(jnp.finfo(dt).eps, dt) * jnp.maximum(sv[0], 1.0)
    w0_coeff = jnp.where(sv > tiny, beta / jnp.where(sv > tiny, sv, 1.0), 0.0)
    interior = jnp.sqrt(jnp.sum(w0_coeff ** 2)) <= radius

    # boundary: Newton on 1/||w(lambda)|| - 1/radius (convex, monotone)
    def newton_body(_, lam):
        n2 = wnorm2(lam)
        norm = jnp.sqrt(jnp.maximum(n2, 1e-300))
        # d/dlam ||w||^2 = -2 sum (sv beta)^2/(sv^2+lam)^3
        dn2 = -2.0 * jnp.sum((sv * beta) ** 2 / (sv2 + lam) ** 3)
        f = 1.0 / norm - 1.0 / radius
        df = -0.5 * dn2 / (n2 * norm)
        step = f / jnp.where(jnp.abs(df) > 0, df, 1.0)
        return jnp.maximum(lam - step, 0.0)

    lam0 = jnp.asarray(1e-8, dt)
    lam = jax.lax.fori_loop(0, ctl.max_newton, newton_body, lam0)
    lam = jnp.where(interior, 0.0, lam)

    coeff = jnp.where(interior, w0_coeff, sv * beta / (sv2 + lam))
    w = Vt.T @ coeff
    x = w / S if S is not None else w
    r = A @ x - b
    return LLSTInfo(
        x=x,
        r_norm=jnp.linalg.norm(r),
        x_norm=jnp.linalg.norm(w),
        multiplier=lam,
    )


def lls_solve(A, b, radius, prec: Callable | None = None,
              ctl: GLTRControl = GLTRControl()):
    """Iterative TR least squares (LLS equivalent): GLTR on the normal
    equations 1/2 x'(A'A)x - (A'b)'x within ||x|| <= radius.  ``prec``
    is an optional M^-1 apply (the reference routes this through SBLS).
    Returns the GLTRInfo pytree."""
    A = jnp.asarray(A)
    b = jnp.asarray(b)
    matvec = lambda v: A.T @ (A @ v)
    # model 1/2||Ax-b||^2 = 1/2 x'(A'A)x + (-A'b)'x + const
    return gltr_solve(matvec, -(A.T @ b), radius, prec=prec, ctl=ctl)
