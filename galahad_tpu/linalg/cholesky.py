"""Dense (batched) Cholesky utilities.

The workhorse of the TPU linear-algebra layer: ``lax.linalg.cholesky``
compiles to MXU-tiled blocked kernels, and everything batches with vmap.
Replaces the reference's dense POTR path of SLS
(reference src/sls/sls.f90:843-921, solver 'potr') and is the foundation
of the Schur-complement KKT solver (sbls.py).

Dynamic threshold pivoting (MA27/SSIDS style) does not map to TPU;
instead :func:`chol_factor_shifted` escalates a diagonal shift until the
factorization succeeds — the same strategy TRS itself uses for
indefiniteness (reference src/trs/trs.f90:2260-2337) and standard
practice in interior-point KKT systems (quasi-definite regularization).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax


def chol_factor(M: jnp.ndarray) -> jnp.ndarray:
    """Lower Cholesky factor; NaNs signal failure (checked by caller)."""
    return lax.linalg.cholesky(M, symmetrize_input=True)


def chol_ok(L: jnp.ndarray) -> jnp.ndarray:
    """True if the factorization succeeded (finite diagonal)."""
    d = jnp.diagonal(L, axis1=-2, axis2=-1)
    return jnp.all(jnp.isfinite(d) & (d > 0))


def chol_solve(L: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Solve M x = b given L = chol(M). Supports (..., n) and (..., n, k)."""
    vec = b.ndim == L.ndim - 1
    if vec:
        b = b[..., None]
    y = lax.linalg.triangular_solve(L, b, left_side=True, lower=True)
    x = lax.linalg.triangular_solve(
        L, y, left_side=True, lower=True, transpose_a=True
    )
    return x[..., 0] if vec else x


@partial(jax.jit, static_argnames=("max_tries",))
def chol_factor_shifted(
    M: jnp.ndarray,
    shift0: jnp.ndarray | float = 0.0,
    growth: float = 100.0,
    max_tries: int = 12,
):
    """Factorize M + shift*I, escalating shift by ``growth`` on failure.

    Returns (L, shift, ok).  ``shift0`` = 0 tries the unshifted matrix
    first; the first fallback uses ``eps * max|M|``.  Fully jittable
    (lax.while_loop over at most ``max_tries`` refactorizations).
    """
    n = M.shape[-1]
    eye = jnp.eye(n, dtype=M.dtype)
    eps = jnp.finfo(M.dtype).eps
    base = eps * jnp.maximum(jnp.max(jnp.abs(M)), 1.0)
    shift0 = jnp.asarray(shift0, M.dtype)

    def try_factor(shift):
        L = chol_factor(M + shift * eye)
        return L, chol_ok(L)

    def cond(state):
        _, _, ok, tries = state
        return (~ok) & (tries < max_tries)

    def body(state):
        _, shift, _, tries = state
        new_shift = jnp.where(shift == 0, base, shift * growth)
        L, ok = try_factor(new_shift)
        return L, new_shift, ok, tries + 1

    L, ok = try_factor(shift0)
    L, shift, ok, _ = lax.while_loop(
        cond, body, (L, shift0, ok, jnp.array(0, jnp.int32))
    )
    return L, shift, ok


def tridiag_factor(d: jnp.ndarray, e: jnp.ndarray):
    """LDL' factorization of a symmetric tridiagonal matrix (PTTRF
    equivalent, used by the GLTR boundary solves — reference
    src/gltr/gltr.f90:50).  d: (..., k) diagonal, e: (..., k-1)
    subdiagonal.  Returns (dhat, l) with M = L diag(dhat) L'.
    Implemented as an associative-free sequential scan (k is small)."""

    def step(carry, de):
        d_prev = carry
        d_i, e_i = de
        l_i = e_i / d_prev
        d_new = d_i - l_i * e_i
        return d_new, (d_new, l_i)

    d0 = d[..., 0]
    _, (drest, l) = lax.scan(
        step, d0, (jnp.moveaxis(d[..., 1:], -1, 0), jnp.moveaxis(e, -1, 0))
    )
    dhat = jnp.concatenate([d0[..., None], jnp.moveaxis(drest, 0, -1)], axis=-1)
    return dhat, jnp.moveaxis(l, 0, -1)


def tridiag_solve(dhat: jnp.ndarray, l: jnp.ndarray, b: jnp.ndarray):
    """Solve with the tridiagonal LDL' factors from :func:`tridiag_factor`."""

    def fwd(carry, bl):
        b_i, l_i = bl
        y = b_i - l_i * carry
        return y, y

    y0 = b[..., 0]
    _, yrest = lax.scan(
        fwd, y0, (jnp.moveaxis(b[..., 1:], -1, 0), jnp.moveaxis(l, -1, 0))
    )
    y = jnp.concatenate([y0[..., None], jnp.moveaxis(yrest, 0, -1)], axis=-1)
    z = y / dhat

    def bwd(carry, zl):
        z_i, l_i = zl
        x = z_i - l_i * carry
        return x, x

    xk = z[..., -1]
    _, xrest = lax.scan(
        bwd,
        xk,
        (
            jnp.moveaxis(z[..., :-1], -1, 0)[::-1],
            jnp.moveaxis(l, -1, 0)[::-1],
        ),
    )
    x = jnp.concatenate(
        [jnp.moveaxis(xrest, 0, -1)[..., ::-1], xk[..., None]], axis=-1
    )
    return x
