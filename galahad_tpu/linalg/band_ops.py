"""Banded-matrix operations in diagonal (DIA) storage.

Support layer for the large-scale banded path (BASELINE config #1:
banded LP/QP at n where dense O(n^2) storage is impossible).  A banded
matrix is stored as a static tuple of diagonal offsets plus a (ndiag, m)
value array:

    val[p, i] = A[i, i + offsets[p]]      (zero where out of range)

All operations are shift/elementwise VPU work of O(ndiag * n) or
O(ndiag^2 * n) — no materialized dense matrices:
  * banded matvec / transpose matvec;
  * S = C + A diag(d) A' assembled directly in DIA storage;
  * DIA -> block-tridiagonal (D, L) conversion (jit, gather-based) to
    feed linalg/banded.py's O(n b^2) Cholesky.

This replaces the coordinate/CSR sparse kernels of the reference's MOP
(src/mop/mop.f90:40) for the structured-banded regime.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["val"],
    meta_fields=["offsets", "m", "n"],
)
@dataclasses.dataclass
class BandMatrix:
    """Banded m x n matrix, DIA storage (row-indexed diagonals)."""

    val: Any                 # (ndiag, m)
    offsets: tuple = ()      # static ints: A[i, i + off]
    m: int = 0
    n: int = 0

    def matvec(self, x):
        """A x: sum over diagonals of val[p] * x[i + off_p]."""
        out = jnp.zeros((self.m,), x.dtype)
        i = jnp.arange(self.m)
        for p, off in enumerate(self.offsets):
            idx = jnp.clip(i + off, 0, self.n - 1)
            ok = (i + off >= 0) & (i + off < self.n)
            out = out + jnp.where(ok, self.val[p] * x[idx], 0.0)
        return out

    def rmatvec(self, y):
        """A' y: scatter val[p] * y[i] into rows i + off_p."""
        out = jnp.zeros((self.n,), y.dtype)
        i = jnp.arange(self.m)
        for p, off in enumerate(self.offsets):
            idx = jnp.clip(i + off, 0, self.n - 1)
            ok = (i + off >= 0) & (i + off < self.n)
            out = out.at[idx].add(jnp.where(ok, self.val[p] * y, 0.0))
        return out

    def to_dense(self):
        A = jnp.zeros((self.m, self.n), self.val.dtype)
        i = jnp.arange(self.m)
        for p, off in enumerate(self.offsets):
            idx = jnp.clip(i + off, 0, self.n - 1)
            ok = (i + off >= 0) & (i + off < self.n)
            A = A.at[i, idx].add(jnp.where(ok, self.val[p], 0.0))
        return A


def band_from_dense(A, offsets):
    """Extract the given diagonals of dense A into DIA storage."""
    A = jnp.asarray(A)
    m, n = A.shape
    i = jnp.arange(m)
    rows = []
    for off in offsets:
        idx = jnp.clip(i + off, 0, n - 1)
        ok = (i + off >= 0) & (i + off < n)
        rows.append(jnp.where(ok, A[i, idx], 0.0))
    return BandMatrix(val=jnp.stack(rows), offsets=tuple(offsets), m=m, n=n)


def sym_band_matvec(diags, x):
    """Symmetric banded matvec: diags[(s)] holds subdiagonal s
    (diags (w+1, n) with diags[s, i] = A[i + s, i], s = 0..w)."""
    w1, n = diags.shape
    out = diags[0] * x
    i = jnp.arange(n)
    for s in range(1, w1):
        lo_ok = i + s < n
        idx = jnp.clip(i + s, 0, n - 1)
        # sub-diagonal: out[i+s] += d[s,i] x[i];  super: out[i] += d[s,i] x[i+s]
        out = out.at[idx].add(jnp.where(lo_ok, diags[s] * x, 0.0))
        out = out + jnp.where(lo_ok, diags[s] * x[idx], 0.0)
    return out


def band_ADAt(A: BandMatrix, d):
    """S = A diag(d) A' in symmetric DIA storage (w+1, m) where
    w = max offset spread.  S[i, i+s] = sum_{p,q: off_p - off_q = s}
    val[p, i] d[i + off_p] val[q, i + s]."""
    offs = A.offsets
    w = max(offs) - min(offs)
    m = A.m
    i = jnp.arange(m)
    Sd = jnp.zeros((w + 1, m), A.val.dtype)
    for p, op in enumerate(offs):
        col_p = jnp.clip(i + op, 0, A.n - 1)
        ok_p = (i + op >= 0) & (i + op < A.n)
        dp = jnp.where(ok_p, d[col_p], 0.0)
        for q, oq in enumerate(offs):
            s = op - oq                      # S[i+s, i] entry (s >= 0 kept)
            if s < 0:
                continue
            # S[i + s, i] += A[i+s, i+s+oq] d[i+s+oq] A[i, i+op]
            #   valid when i + s < m and i + s + oq == i + op (by construction)
            row = jnp.clip(i + s, 0, m - 1)
            ok = ok_p & (i + s < m)
            contrib = jnp.where(ok, A.val[p] * dp, 0.0)
            vq = jnp.where(i + s < m, A.val[q][row], 0.0)
            Sd = Sd.at[s].add(contrib * vq)
    return Sd


def sym_band_add_diag(Sd, c):
    return Sd.at[0].add(c)


def sym_band_to_blocks(Sd, block: int):
    """Symmetric DIA (w+1, n) -> block-tridiagonal (D, L) with block
    size >= w, jit-compatible (gather indexing).  Pads n to a multiple
    of block with identity."""
    w1, n = Sd.shape
    w = w1 - 1
    assert block >= w, "block size must cover the semibandwidth"
    k = -(-n // block)
    npad = k * block
    pad = npad - n
    Sd = jnp.pad(Sd, ((0, 0), (0, pad)))
    if pad:
        Sd = Sd.at[0, n:].set(1.0)
    # dense (npad, w+1) layout: entry (j, s) = A[j+s, j]
    cols = Sd.T                                          # (npad, w+1)

    a = jnp.arange(block)
    # D_i[r, c] = A[i*b + r, i*b + c]; using lower storage r >= c:
    # A[j + s, j] with j = i*b + c, s = r - c (0 <= s <= w)
    r_ix = a[:, None]
    c_ix = a[None, :]
    s_ix = r_ix - c_ix                                   # (b, b)
    base = jnp.arange(k)[:, None, None] * block + c_ix[None]
    s_full = jnp.broadcast_to(s_ix[None], (k, block, block))
    valid = (s_full >= 0) & (s_full <= w)
    j_idx = jnp.clip(base, 0, npad - 1)
    s_idx = jnp.clip(s_full, 0, w)
    lower = jnp.where(valid, cols[j_idx, s_idx], 0.0)
    # symmetrize: the diagonal appears in both lower and its transpose
    diag_vals = cols[jnp.arange(k)[:, None] * block + a[None, :], 0]
    D = lower + jnp.swapaxes(lower, -1, -2) - jax.vmap(jnp.diag)(diag_vals)
    # L_i[r, c] = A[(i+1)*b + r, i*b + c] = A[j + s, j],
    #   j = i*b + c, s = b + r - c in [1, w] when nonzero
    if k > 1:
        s_L = block + r_ix - c_ix                        # (b, b)
        baseL = jnp.arange(k - 1)[:, None, None] * block + c_ix[None]
        s_fL = jnp.broadcast_to(s_L[None], (k - 1, block, block))
        validL = (s_fL >= 1) & (s_fL <= w)
        L = jnp.where(validL,
                      cols[jnp.clip(baseL, 0, npad - 1),
                           jnp.clip(s_fL, 0, w)], 0.0)
    else:
        L = jnp.zeros((0, block, block), Sd.dtype)
    return D, L
