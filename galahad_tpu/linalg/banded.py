"""Block-tridiagonal / banded symmetric factorization.

TPU-native replacement for the banded paths of GALAHAD's SLS/PSLS
(reference src/sls/sls.f90 'pbtr' backend :843-921; band preconditioners
src/psls/psls.f90:89-130).  A symmetric banded matrix with semibandwidth
<= b is stored as block tridiagonal with (b, b) dense blocks:

    [D_0  L_0'          ]
    [L_0  D_1  L_1'     ]
    [     L_1  D_2  ... ]

Factorization is a lax.scan over the k = n/b block rows — each step is
dense (b, b) MXU work (potrf, triangular solves, one GEMM), giving
O(n b^2) total flops with O(n/b) sequential depth: the TPU-correct
trade (SURVEY §7.1: "banded Pallas kernel" slot).  Solves are forward/
backward scans with (b,) block vectors.  Everything is jittable and
vmaps over batches of systems.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["Ld", "Lo", "ok"],
    meta_fields=[],
)
@dataclasses.dataclass
class BlockTridiagFactors:
    Ld: Any     # (k, b, b) lower-triangular diagonal blocks of L
    Lo: Any     # (k-1, b, b) subdiagonal blocks of L (L[i] couples i -> i+1)
    ok: Any     # bool: factorization succeeded (all pivots positive)


def band_to_blocks(band_lower, n, b):
    """Pack a symmetric banded matrix given as LAPACK-style lower band
    storage (rows = diagonals, band_lower[d, j] = A[j+d, j], d=0..b)
    into (D, L) block-tridiagonal form with block size b.  Host-side
    helper (numpy-friendly); pads n up to a multiple of b with identity.
    """
    import numpy as np

    band = np.asarray(band_lower)
    semibw = band.shape[0] - 1
    assert semibw <= b, "semibandwidth must be <= block size"
    k = -(-n // b)
    npad = k * b
    A = np.zeros((npad, npad))
    for d in range(semibw + 1):
        for j in range(n - d):
            A[j + d, j] = band[d, j]
            A[j, j + d] = band[d, j]
    for j in range(n, npad):
        A[j, j] = 1.0
    D = np.stack([A[i * b:(i + 1) * b, i * b:(i + 1) * b] for i in range(k)])
    L = np.stack([A[(i + 1) * b:(i + 2) * b, i * b:(i + 1) * b]
                  for i in range(k - 1)]) if k > 1 else np.zeros((0, b, b))
    return jnp.asarray(D), jnp.asarray(L)


def block_tridiag_cholesky(D, L) -> BlockTridiagFactors:
    """Cholesky A = L~ L~' of the block-tridiagonal SPD matrix given by
    diagonal blocks D (k, b, b) and subdiagonal blocks L (k-1, b, b).

    Recurrence (one scan step per block row):
        S_0 = D_0;           Ld_0 = chol(S_0)
        Lo_i = L_i Ld_i^-T
        S_{i+1} = D_{i+1} - Lo_i Lo_i';   Ld_{i+1} = chol(S_{i+1})
    """
    k, b, _ = D.shape
    dt = D.dtype

    def chol_ok(S):
        C = lax.linalg.cholesky(S, symmetrize_input=True)
        good = jnp.all(jnp.isfinite(jnp.diagonal(C))) & jnp.all(
            jnp.diagonal(C) > 0
        )
        return jnp.where(good, C, jnp.eye(b, dtype=dt)), good

    Ld0, ok0 = chol_ok(D[0])

    def step(carry, inputs):
        Ld_prev, ok = carry
        Li, Di = inputs
        # Lo_i = L_i Ld_prev^-T  (solve X Ld' = L  ->  Ld X' = L')
        Xt = lax.linalg.triangular_solve(
            Ld_prev, jnp.swapaxes(Li, -1, -2),
            left_side=True, lower=True,
        )
        Lo = jnp.swapaxes(Xt, -1, -2)
        S = Di - Lo @ jnp.swapaxes(Lo, -1, -2)
        Ldi, oki = chol_ok(S)
        return (Ldi, ok & oki), (Ldi, Lo)

    if k > 1:
        (_, ok), (Lds, Los) = lax.scan(step, (Ld0, ok0), (L, D[1:]))
        Ld = jnp.concatenate([Ld0[None], Lds], axis=0)
    else:
        Ld = Ld0[None]
        Los = jnp.zeros((0, b, b), dt)
        ok = ok0
    return BlockTridiagFactors(Ld=Ld, Lo=Los, ok=ok)


def block_tridiag_solve(f: BlockTridiagFactors, rhs):
    """Solve A x = rhs given the block Cholesky factors.  rhs is (k, b)
    blocks (or (k, b, r) for multiple right-hand sides)."""
    Ld, Lo = f.Ld, f.Lo
    k, b, _ = Ld.shape
    vec = rhs.ndim == 2
    if vec:
        rhs = rhs[..., None]

    # forward: L~ y = rhs
    y0 = lax.linalg.triangular_solve(Ld[0], rhs[0], left_side=True,
                                     lower=True)

    def fwd(y_prev, inputs):
        Ldi, Loi, ri = inputs
        yi = lax.linalg.triangular_solve(
            Ldi, ri - Loi @ y_prev, left_side=True, lower=True
        )
        return yi, yi

    if k > 1:
        _, ys = lax.scan(fwd, y0, (Ld[1:], Lo, rhs[1:]))
        y = jnp.concatenate([y0[None], ys], axis=0)
    else:
        y = y0[None]

    # backward: L~' x = y
    xk = lax.linalg.triangular_solve(Ld[-1], y[-1], left_side=True,
                                     lower=True, transpose_a=True)

    def bwd(x_next, inputs):
        Ldi, Loi, yi = inputs
        xi = lax.linalg.triangular_solve(
            Ldi, yi - jnp.swapaxes(Loi, -1, -2) @ x_next,
            left_side=True, lower=True, transpose_a=True,
        )
        return xi, xi

    if k > 1:
        _, xs = lax.scan(bwd, xk, (Ld[:-1], Lo, y[:-1]), reverse=True)
        x = jnp.concatenate([xs, xk[None]], axis=0)
    else:
        x = xk[None]
    return x[..., 0] if vec else x


def block_tridiag_matvec(D, L, x):
    """A x for block-tridiagonal A ((k, b) block vector x)."""
    k = D.shape[0]
    vec = x.ndim == 2
    xb = x[..., None] if vec else x
    out = D @ xb
    if k > 1:
        out = out.at[1:].add(L @ xb[:-1])
        out = out.at[:-1].add(jnp.swapaxes(L, -1, -2) @ xb[1:])
    return out[..., 0] if vec else out
