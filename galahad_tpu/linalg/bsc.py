"""Schur-complement / normal-matrix assembly (BSC equivalent).

TPU-native version of GALAHAD's BSC (reference src/bsc/bsc.f90:
BSC_form :372): build S = A D A' (for Schur-complement KKT reductions
and Gauss-Newton J'J).  Three modes:

  * dense (``bsc_form``): one scaled MXU matmul;
  * block-tridiagonal extraction for banded A (``bsc_form_blocks``);
  * SPARSE (``bsc_analyse`` + ``bsc_form_sparse``): host-side symbolic
    pattern of S = A D A' on COO input (the reference's
    BSC_form pattern pass, bsc.f90:372) + an O(#products) device
    numeric phase — sorted segment products, no densification.  The
    lower-COO output feeds the flat supernodal LDL^T directly
    (sparse Gauss-Newton in nlp/nls.py, sparse Schur modes in SBLS).
"""
from __future__ import annotations

import numpy as np

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


class BSCPlan:
    """Host-analysed sparse S = A D A' assembly (identity-hashed; the
    analyse-once / form-many contract of BSC_form, bsc.f90:372)."""

    __slots__ = ("m", "n", "s_pat", "p1", "p2", "dcol", "sout", "_dev")

    def __init__(self, m, n, s_pat, p1, p2, dcol, sout):
        self.m, self.n = m, n
        self.s_pat = s_pat          # COOPattern, lower triangle of S
        self.p1, self.p2 = p1, p2   # product operand entry ids into a_vals
        self.dcol = dcol            # column (diagonal D index) per product
        self.sout = sout            # S-entry id per product (SORTED)
        self._dev = None

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def device(self):
        if self._dev is None:
            import jax

            # concrete buffers even when first touched inside a trace
            with jax.ensure_compile_time_eval():
                self._dev = tuple(jnp.asarray(a, jnp.int32) for a in
                                  (self.p1, self.p2, self.dcol, self.sout))
        return self._dev


def bsc_analyse(a_pat) -> BSCPlan:
    """Symbolic pattern of S = A D A' from a COOPattern of A: for every
    column c, all row pairs (i >= j) with entries in c contribute
    A[i,c] D[c] A[j,c] to S[i,j].  Host-side numpy, O(sum_c nnz_c^2)."""
    import scipy.sparse as sp

    rows = np.asarray(a_pat.rows, np.int64)
    cols = np.asarray(a_pat.cols, np.int64)
    m, n = a_pat.m, a_pat.n
    nnz = len(rows)
    Ac = sp.csc_matrix((np.arange(1, nnz + 1), (rows, cols)),
                       shape=(m, n))
    P1, P2, DC = [], [], []
    indptr, indices, data = Ac.indptr, Ac.indices, Ac.data
    for c in range(n):
        lo, hi = indptr[c], indptr[c + 1]
        k = hi - lo
        if k == 0:
            continue
        r = indices[lo:hi]
        e = data[lo:hi] - 1
        ii, jj = np.meshgrid(np.arange(k), np.arange(k), indexing="ij")
        sel = r[ii] >= r[jj]
        P1.append(e[ii[sel]])
        P2.append(e[jj[sel]])
        DC.append(np.full(int(sel.sum()), c, np.int64))
    if P1:
        p1 = np.concatenate(P1)
        p2 = np.concatenate(P2)
        dc = np.concatenate(DC)
    else:
        p1 = p2 = dc = np.zeros(0, np.int64)
    key = rows[p1] * m + rows[p2]
    uniq, inv = np.unique(key, return_inverse=True)
    order = np.argsort(inv, kind="stable")     # sorted segments
    from ..core.sparse import COOPattern

    s_pat = COOPattern(uniq // m, uniq % m, m, m)
    return BSCPlan(m, n, s_pat, p1[order], p2[order], dc[order],
                   inv[order])


def bsc_form_sparse(plan: BSCPlan, a_vals, d=None):
    """Numeric S = A diag(d) A' on the analysed pattern: returns the
    (nnz_S,) values aligned with ``plan.s_pat`` (lower COO).  One
    gather + product + sorted segment-sum on device."""
    p1, p2, dc, sout = plan.device()
    a_vals = jnp.asarray(a_vals)
    prod = a_vals[p1] * a_vals[p2]
    if d is not None:
        prod = prod * jnp.asarray(d)[dc]
    out = jnp.zeros(plan.s_pat.nnz, a_vals.dtype)
    return out.at[sout].add(prod, indices_are_sorted=True)
