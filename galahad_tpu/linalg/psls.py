"""Definite preconditioners for trust-region methods (PSLS equivalent).

TPU-native version of GALAHAD's PSLS (reference src/psls/psls.f90:
preconditioner menu :89-130; PSLS_form_and_factorize :711,
PSLS_apply :4090, SCU update on row/col removal via PSLS_update).

Menu (reference codes in parentheses):
  * "none" (<0)            P = I
  * "diagonal" (1)         P = diag(max(diag A, min_diagonal))
  * "band" (2)             P = band(A), block-tridiagonal Cholesky
  * "reordered_band" (3)   P = band(RCM(A)) — native RCM ordering
  * "full_se" (4)          P = A + E, Schnabel-Eskow-style modified
                           Cholesky: jittable column loop with
                           per-pivot floors (SIAM J. Opt. 9(4), 1999)
  * "full_gmps" (5)        P = Q max(|L|, delta) Q' — the
                           Gill-Murray-Ponceleon-Saunders modification
                           done spectrally (flip/floor the D blocks of
                           the LDL' == flip/floor eigenvalues)
  * "lin_more" (6)         memory-limited incomplete Cholesky: keep the
                           `icfs_fill` largest sub-diagonal entries per
                           column, shift-escalation loop on breakdown
                           (Lin & More, SISC 21(1), icfs)
  * "mi28" (7) /
    "munksgaard" (8)       drop-tolerance incomplete Cholesky on the
                           pattern of A (same engine, drop rule
                           |l_ij| <= tol * ||col||)

Each build returns an apply closure v -> P^-1 v for GLTR/TRU.  The
incomplete/modified factors are built with dense-masked jittable column
loops — the n here is a preconditioner subspace (TR free variables),
small enough that the O(n^2)-per-column loop is the right TPU shape.

psls_remove(state, keep_mask) implements the reference's SCU update on
row/col removal (psls.f90 SCU usage): solves with the kept submatrix
P[keep,keep] reuse the full factorization plus a dense bordered
correction  x_I = y_I - (P^-1)_{IR} ((P^-1)_{RR})^-1 y_R  — no
refactorization, the SCU identity with the removed set as border.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from .banded import block_tridiag_cholesky, block_tridiag_solve
from .cholesky import chol_factor_shifted, chol_solve


@control_dc
class PSLSControl:
    preconditioner: str = "diagonal"
    # "none" | "diagonal" | "band" | "reordered_band" | "full" |
    # "full_se" | "full_gmps" | "lin_more" | "mi28" | "munksgaard"
    semi_bandwidth: int = 5            # reference default
    min_diagonal: float = 1.0e-5       # diagonal floor (psls control)
    icfs_fill: int = 10                # Lin-More memory per column
    drop_tolerance: float = 1.0e-3     # mi28/munksgaard drop rule


# ---------------------------------------------------------------------------
# modified full factorizations


def _modified_cholesky_se(H, min_diag):
    """Schnabel-Eskow-flavoured modified Cholesky: a jittable
    right-looking column loop; each pivot is floored at
    max(min_diag, tau * max|col|) so the factor always exists.
    Returns L with P = L L' ~= H + E, E >= 0 diagonal."""
    n = H.shape[-1]
    dt = H.dtype
    tau = jnp.asarray(jnp.finfo(dt).eps ** (1.0 / 3.0), dt)
    idx = jnp.arange(n)

    def col(j, A):
        colj = A[:, j]
        piv = jnp.maximum(colj[j],
                          jnp.maximum(min_diag,
                                      tau * jnp.max(jnp.abs(colj))))
        sq = jnp.sqrt(piv)
        l = jnp.where(idx > j, colj / sq, 0.0)
        l = l.at[j].set(sq)
        # trailing rank-1 update, masked to the strictly-lower block
        upd = jnp.outer(l, l)
        mask = (idx[:, None] > j) & (idx[None, :] > j)
        A = A - jnp.where(mask, upd, 0.0)
        A = A.at[:, j].set(l)
        return A

    return jnp.tril(lax.fori_loop(0, n, col, H))


def _gmps_spectral(H, min_diag):
    """GMPS modification, spectrally: P = Q max(|lam|, delta) Q'."""
    lam, Q = jnp.linalg.eigh(H)
    d = jnp.maximum(jnp.abs(lam), min_diag)
    return Q, d


# ---------------------------------------------------------------------------
# incomplete Cholesky engines (dense-masked, jittable)


def _ic_masked(H, pattern, shift):
    """Incomplete Cholesky restricted to `pattern` (bool, lower) of
    H + shift*I.  Column loop; returns (L, ok)."""
    n = H.shape[-1]
    idx = jnp.arange(n)
    A = H + shift * jnp.eye(n, dtype=H.dtype)

    def col(j, carry):
        A, ok = carry
        colj = A[:, j]
        piv = colj[j]
        ok = ok & (piv > 0.0)
        piv = jnp.where(piv > 0.0, piv, 1.0)
        sq = jnp.sqrt(piv)
        l = jnp.where(idx > j, colj / sq, 0.0)
        l = jnp.where(pattern[:, j], l, 0.0)      # drop outside pattern
        l = l.at[j].set(sq)
        upd = jnp.outer(l, l)
        mask = (idx[:, None] > j) & (idx[None, :] > j)
        A = A - jnp.where(mask, upd, 0.0)
        A = A.at[:, j].set(l)
        return A, ok

    A, ok = lax.fori_loop(0, n, col, (A, jnp.asarray(True)))
    return jnp.tril(A), ok


def _ic_shifted(H, pattern, tries: int = 12):
    """Lin-More shift-escalation: try shift 0, then grow alpha by 4x
    until the masked IC succeeds (icfs' alpha loop)."""
    scale = jnp.max(jnp.abs(jnp.diagonal(H))) + 1.0

    def body(carry):
        _, _, alpha, k = carry
        L, ok = _ic_masked(H, pattern, alpha * scale)
        alpha_next = jnp.where(ok, alpha, jnp.maximum(alpha * 4.0, 1e-8))
        return L, ok, alpha_next, k + 1

    def cond(carry):
        _, ok, _, k = carry
        return (~ok) & (k < tries)

    L0, ok0 = _ic_masked(H, pattern, 0.0)
    L, ok, _, _ = lax.while_loop(
        cond, body, (L0, ok0, jnp.asarray(1e-3, H.dtype),
                     jnp.asarray(0, jnp.int32)))
    return L, ok


def _pattern_lin_more(H, fill: int):
    """Keep the `fill` largest-|.| strictly-lower entries per column
    (plus the diagonal): the icfs memory limit as a static mask."""
    n = H.shape[-1]
    idx = jnp.arange(n)
    strict = idx[:, None] > idx[None, :]
    mag = jnp.where(strict, jnp.abs(H), -1.0)
    k = min(max(fill, 0) + 1, n)
    thresh = -jnp.sort(-mag, axis=0)[k - 1, :]      # k-th largest per col
    keep = strict & (mag >= jnp.maximum(thresh, 0.0)[None, :]) & (mag > 0.0)
    return keep | (idx[:, None] == idx[None, :])


def _pattern_drop_tol(H, tol):
    """Pattern of A with small entries dropped (mi28/munksgaard rule)."""
    n = H.shape[-1]
    idx = jnp.arange(n)
    lower = idx[:, None] >= idx[None, :]
    colnorm = jnp.sqrt(jnp.sum(H * H, axis=0))
    keep = jnp.abs(H) > tol * jnp.maximum(colnorm, 1.0)[None, :]
    return (keep & lower) | (idx[:, None] == idx[None, :])


# ---------------------------------------------------------------------------


def _band_apply(H, b: int, min_diag):
    """Block-tridiagonal Cholesky apply for band(H)."""
    n = H.shape[-1]
    b = max(b, 1)
    k = -(-n // b)
    npad = k * b
    i = jnp.arange(npad)
    Hp = jnp.zeros((npad, npad), H.dtype).at[:n, :n].set(H)
    Hp = jnp.where(jnp.abs(i[:, None] - i[None, :]) > b, 0.0, Hp)
    Hp = Hp.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
    D = jnp.stack([Hp[j * b:(j + 1) * b, j * b:(j + 1) * b]
                   for j in range(k)])
    L = jnp.stack([Hp[(j + 1) * b:(j + 2) * b, j * b:(j + 1) * b]
                   for j in range(k - 1)]) if k > 1 else jnp.zeros(
        (0, b, b), H.dtype)
    f = block_tridiag_cholesky(D, L)
    shift = jnp.sum(jnp.abs(Hp), axis=1).max() * 1e-8 + 1e-8
    D2 = D + shift * jnp.eye(b, dtype=H.dtype)
    f2 = block_tridiag_cholesky(D2, L)

    def apply(v):
        vp = jnp.zeros((npad,), v.dtype).at[:n].set(v)
        blocks = vp.reshape(k, b)
        x1 = block_tridiag_solve(f, blocks).reshape(npad)
        x2 = block_tridiag_solve(f2, blocks).reshape(npad)
        x = jnp.where(f.ok, x1, x2)
        return x[:n]

    return apply


def _rcm_perm(H) -> np.ndarray:
    """Host-side RCM ordering of the pattern of H (native C++ when the
    shared library is built, scipy fallback)."""
    Hh = np.asarray(jax.device_get(H))
    n = Hh.shape[-1]
    pat = (np.abs(Hh) > 0)
    np.fill_diagonal(pat, True)
    try:
        from ..native.wrappers import rcm_order
        rowptr = np.zeros(n + 1, np.int32)
        cols = []
        for r in range(n):
            c = np.nonzero(pat[r])[0].astype(np.int32)
            cols.append(c)
            rowptr[r + 1] = rowptr[r] + len(c)
        return np.asarray(rcm_order(rowptr, np.concatenate(cols)),
                          dtype=np.int64)
    except Exception:
        import scipy.sparse as sp
        import scipy.sparse.csgraph as csg
        return np.asarray(
            csg.reverse_cuthill_mckee(sp.csr_matrix(pat), symmetric_mode=True),
            dtype=np.int64)


def psls_build(H, ctl: PSLSControl = PSLSControl()) -> Callable:
    """Return apply(v) ~ P^-1 v for the selected preconditioner of the
    dense symmetric H."""
    kind = ctl.preconditioner
    if kind == "none":
        return lambda v: v

    H = jnp.asarray(H)
    md = jnp.asarray(ctl.min_diagonal, H.dtype)

    if kind == "diagonal":
        d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1), md)
        return lambda v: v / d

    if kind == "band":
        return _band_apply(H, ctl.semi_bandwidth, md)

    if kind == "reordered_band":
        perm = _rcm_perm(H)
        inv = np.empty_like(perm)
        inv[perm] = np.arange(len(perm))
        p = jnp.asarray(perm)
        ip = jnp.asarray(inv)
        inner = _band_apply(H[p][:, p], ctl.semi_bandwidth, md)
        return lambda v: inner(v[p])[ip]

    if kind == "full":
        L, _, ok = chol_factor_shifted(H, 0.0)
        return lambda v: chol_solve(L, v)

    if kind == "full_se":
        L = _modified_cholesky_se(H, md)
        return lambda v: chol_solve(L, v)

    if kind == "full_gmps":
        Q, d = _gmps_spectral(H, md)
        return lambda v: Q @ ((Q.T @ v) / d)

    if kind in ("lin_more", "mi28", "munksgaard"):
        if kind == "lin_more":
            pattern = _pattern_lin_more(H, ctl.icfs_fill)
        else:
            pattern = _pattern_drop_tol(H, ctl.drop_tolerance)
        L, _ = _ic_shifted(H, pattern)

        def apply(v, L=L):
            y = jax.scipy.linalg.solve_triangular(L, v, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, y, lower=False)

        return apply

    raise ValueError(f"unknown preconditioner {kind!r}")


# ---------------------------------------------------------------------------
# SCU update on row/col removal (reference psls.f90 SCU usage)


class PSLSRemoved(NamedTuple):
    apply_full: Callable
    removed: jnp.ndarray       # int indices of removed rows/cols
    S: jnp.ndarray             # (P^-1)_{RR}, the small border Schur


def psls_remove(apply_full: Callable, n: int, removed) -> Callable:
    """Solve with P[keep, keep] using the FULL preconditioner apply plus
    a dense bordered correction — the reference's SCU-update-on-removal
    without refactorization.

    For y = P^-1 v_pad (v on kept rows, 0 on removed):
        x_keep = y_I - (P^-1)_{IR} ((P^-1)_{RR})^-1 y_R
    Removed components of the returned vector are zero.
    """
    removed = jnp.asarray(removed, jnp.int32)
    r = removed.shape[0]
    if r == 0:
        return apply_full
    # columns of P^-1 on the removed set: r solves against unit vectors
    E = jnp.zeros((n, r)).at[removed, jnp.arange(r)].set(1.0)
    Pinv_R = jax.vmap(apply_full, in_axes=1, out_axes=1)(E)   # (n, r)
    S = Pinv_R[removed, :]                                    # (r, r)

    def apply(v):
        v = v.at[removed].set(0.0)
        y = apply_full(v)
        corr = Pinv_R @ jnp.linalg.solve(S, y[removed])
        x = y - corr
        return x.at[removed].set(0.0)

    return apply
