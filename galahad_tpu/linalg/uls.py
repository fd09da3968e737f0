"""Unsymmetric linear-solver facade.

TPU-native re-design of GALAHAD's ULS/GLS packages (reference
src/uls/uls.f90, src/gls/gls.f90 — a uniform
factorize/solve/enquire facade over MA33/MA48-style unsymmetric
factorizations).  The reference's backends do dynamic Markowitz
pivoting on the host; on TPU the factorization is XLA's batched
partial-pivoting LU (lax.linalg.lu — row pivoting only, which is the
static-shape analogue), wrapped with:

  * transpose solves (ULS_solve trans variant),
  * iterative refinement sweeps (uls control ``refine``),
  * a rank/condition enquiry from |U| diagonals (ULS_enquire),
  * basis selection ``uls_find_basis``: the ULS service SBLS depends on
    (SBLS_find_A1_and_A2, src/sbls/sbls.f90:8082) — pick m independent
    columns of a wide A via QR column pivoting on the host.

Everything jits and vmaps; batches of systems factorize in one call.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import control as control_dc


@control_dc
class ULSControl:
    refine: int = 1                  # iterative-refinement sweeps
    singular_tol: float = 1.0e-12    # |u_ii| relative threshold for rank


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["lu", "piv", "rank", "u_min", "u_max"],
    meta_fields=[],
)
@dataclasses.dataclass
class ULSFactors:
    lu: Any            # packed LU (n, n)
    piv: Any           # pivot indices
    rank: Any          # numerical rank estimate
    u_min: Any         # min |u_ii|
    u_max: Any         # max |u_ii|


def uls_factorize(A, ctl: ULSControl = ULSControl()) -> ULSFactors:
    """Factorize square unsymmetric A = P L U (ULS_factorize)."""
    A = jnp.asarray(A)
    lu, piv = jax.scipy.linalg.lu_factor(A)
    d = jnp.abs(jnp.diagonal(lu, axis1=-2, axis2=-1))
    u_max = jnp.max(d, axis=-1)
    rank = jnp.sum(d > ctl.singular_tol * jnp.maximum(u_max, 1e-300),
                   axis=-1)
    return ULSFactors(lu=lu, piv=piv, rank=rank,
                      u_min=jnp.min(d, axis=-1), u_max=u_max)


def uls_solve(f: ULSFactors, b, A=None, trans: bool = False,
              ctl: ULSControl = ULSControl()):
    """Solve A x = b (or A' x = b) with optional refinement sweeps
    against the original A (ULS_solve; refinement mirrors ir.f90:334)."""
    b = jnp.asarray(b)
    t = 1 if trans else 0
    x = jax.scipy.linalg.lu_solve((f.lu, f.piv), b, trans=t)
    if A is not None and ctl.refine > 0:
        op = (lambda v: jnp.swapaxes(A, -1, -2) @ v) if trans else (lambda v: A @ v)
        for _ in range(ctl.refine):
            r = b - op(x)
            x = x + jax.scipy.linalg.lu_solve((f.lu, f.piv), r, trans=t)
    return x


def uls_enquire(f: ULSFactors):
    """(rank, min |u_ii|, max |u_ii|) — the ULS_enquire contract."""
    return f.rank, f.u_min, f.u_max


def uls_find_basis(A, tol: float = 1.0e-10):
    """Select m linearly-independent columns of the m x n matrix A — the
    nonsingular-basis service SBLS's null-space mode needs
    (SBLS_find_A1_and_A2, sbls.f90:8082, done there by MA48 threshold
    pivoting).  Host-side QR with column pivoting: returns (basic_cols,
    nonbasic_cols, rank) as numpy index arrays (static metadata for the
    jitted consumer)."""
    A = np.asarray(A)
    m = A.shape[0]
    # Greedy pivoted QR on A (columns): scipy-free implementation.
    R = A.copy().astype(np.float64)
    n = A.shape[1]
    perm = np.arange(n)
    rank = 0
    for k in range(min(m, n)):
        norms = np.linalg.norm(R[k:, k:], axis=0)
        j = int(np.argmax(norms))
        if norms[j] <= tol:
            break
        jj = k + j
        R[:, [k, jj]] = R[:, [jj, k]]
        perm[[k, jj]] = perm[[jj, k]]
        v = R[k:, k].copy()
        v[0] += np.sign(v[0] if v[0] != 0 else 1.0) * np.linalg.norm(v)
        v /= max(np.linalg.norm(v), 1e-300)
        R[k:, k:] -= 2.0 * np.outer(v, v @ R[k:, k:])
        rank += 1
    return perm[:rank].copy(), np.sort(perm[rank:]).copy(), rank
