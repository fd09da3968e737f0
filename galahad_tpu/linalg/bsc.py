"""Schur-complement / normal-matrix assembly (BSC equivalent).

TPU-native version of GALAHAD's BSC (reference src/bsc/bsc.f90:
BSC_form :372): build S = A D A' (for Schur-complement KKT reductions
and Gauss-Newton J'J).  The reference assembles sparsity patterns on
the host; dense-TPU-side this is one scaled MXU matmul, optionally
batched, with a block-tridiagonal extraction helper for banded A.
"""
from __future__ import annotations

import jax.numpy as jnp


def bsc_form(A, d=None):
    """S = A diag(d) A' (d=None -> identity).  A (..., m, n)."""
    At = jnp.swapaxes(A, -1, -2)
    if d is None:
        return A @ At
    return (A * d[..., None, :]) @ At


def bsc_form_blocks(A, d, block: int):
    """S = A diag(d) A' returned as block-tridiagonal (D, L) when A has
    row-bandwidth <= block (rows i and j of A share no column support
    when |i - j| >= block).  Feeds linalg/banded.py directly."""
    S = bsc_form(A, d)
    m = S.shape[-1]
    k = -(-m // block)
    pad = k * block - m
    if pad:
        S = jnp.pad(S, ((0, pad), (0, pad)))
        S = S.at[jnp.arange(m, k * block), jnp.arange(m, k * block)].set(1.0)
    D = jnp.stack([S[i * block:(i + 1) * block, i * block:(i + 1) * block]
                   for i in range(k)])
    L = jnp.stack([S[(i + 1) * block:(i + 2) * block,
                     i * block:(i + 1) * block]
                   for i in range(k - 1)]) if k > 1 else jnp.zeros(
        (0, block, block), S.dtype)
    return D, L
