"""Symmetric block (KKT) system solver.

TPU-native re-design of GALAHAD's SBLS
(reference src/sbls/sbls.f90: SBLS_form_and_factorize :1695,
SBLS_solve :4937).  Solves

    K [x; y] = [b1; b2],     K = [[G, A'], [A, -C]]

with G (n, n) symmetric positive (semi)definite and C diagonal PSD —
exactly the shape of every interior-point KKT system (the barrier makes
the (2,2) block diagonal; reference src/cqp/cqp.f90:4726-4740).

Where the reference factorizes the augmented matrix with a dynamically
pivoted indefinite solver (MA27/MA57/SSIDS via SLS), we exploit
quasi-definiteness: with primal/dual regularization (rho, delta) the
Schur complement S = C + delta*I + A (G + rho*I)^-1 A' is SPD, so the
whole solve is two batched Cholesky factorizations plus matmuls — MXU
work, no pivoting, vmap-able.  Regularization error is removed by
iterative refinement against the *unregularized* K (reference ir.f90:334
plays the same role).  This corresponds to SBLS's Schur-complement mode
(sbls.f90:176-184) generalized from diagonal-G to any factorizable G.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from .cholesky import chol_factor_shifted, chol_solve


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["L_G", "g_diag", "L_S", "A", "C_diag", "rho", "delta", "ok"],
    meta_fields=["g_is_diag"],
)
@dataclasses.dataclass
class SBLSFactors:
    L_G: Any          # Cholesky factor of G + rho I (None if diagonal G)
    g_diag: Any       # diagonal of G + rho I (None unless diagonal G)
    L_S: Any          # Cholesky factor of S = C + delta I + A Ginv A'
    A: Any
    C_diag: Any
    rho: Any
    delta: Any
    ok: Any
    g_is_diag: bool = False


def _g_solve(f: SBLSFactors, b):
    if f.g_is_diag:
        return b / f.g_diag
    return chol_solve(f.L_G, b)


def sbls_factorize(
    G,
    A,
    C_diag,
    *,
    g_is_diag: bool = False,
    rho: float | jnp.ndarray = 0.0,
    delta: float | jnp.ndarray = 0.0,
    max_tries: int = 12,
) -> SBLSFactors:
    """Factorize K = [[G, A'], [A, -C]] via the SPD Schur complement.

    G is (n, n) dense, or (n,) diagonal when ``g_is_diag`` (the LP /
    separable fast path, mirroring SBLS's diagonal-G restriction
    sbls.f90:2243-2252 — but here merely an optimization).
    C_diag is (m,); zero entries correspond to equality rows.
    """
    m = A.shape[-2]
    dt = A.dtype
    rho = jnp.asarray(rho, dt)
    delta = jnp.asarray(delta, dt)

    if g_is_diag:
        g_diag = G + rho
        L_G = None
        AGiAt = (A / g_diag[..., None, :]) @ jnp.swapaxes(A, -1, -2)
        ok_g = jnp.all(g_diag > 0)
    else:
        L_G, rho_used, ok_g = chol_factor_shifted(G, rho, max_tries=max_tries)
        rho = rho_used
        g_diag = None
        W = chol_solve(L_G, jnp.swapaxes(A, -1, -2))   # G^-1 A'
        AGiAt = A @ W

    S = AGiAt + jnp.eye(m, dtype=dt) * delta
    S = S.at[..., jnp.arange(m), jnp.arange(m)].add(C_diag)
    L_S, delta_extra, ok_s = chol_factor_shifted(S, 0.0, max_tries=max_tries)
    return SBLSFactors(
        L_G=L_G,
        g_diag=g_diag,
        L_S=L_S,
        A=A,
        C_diag=C_diag,
        rho=rho,
        delta=delta + delta_extra,
        ok=ok_g & ok_s,
        g_is_diag=g_is_diag,
    )


def _solve_once(f: SBLSFactors, b1, b2):
    At = jnp.swapaxes(f.A, -1, -2)
    w = _g_solve(f, b1)
    y = chol_solve(f.L_S, f.A @ w - b2)
    x = _g_solve(f, b1 - At @ y)
    return x, y


def sbls_solve(
    f: SBLSFactors,
    b1,
    b2,
    *,
    apply_G=None,
    refine: int = 2,
):
    """Solve K [x; y] = [b1; b2].

    ``apply_G(v)`` is the action of the *true* (unregularized) G; when
    given, ``refine`` sweeps of iterative refinement remove the
    (rho, delta) perturbation (IR equivalent, reference src/ir/ir.f90:334).
    """
    x, y = _solve_once(f, b1, b2)
    if apply_G is None or refine <= 0:
        return x, y
    At = jnp.swapaxes(f.A, -1, -2)
    for _ in range(refine):
        r1 = b1 - (apply_G(x) + At @ y)
        r2 = b2 - (f.A @ x - f.C_diag * y)
        dx, dy = _solve_once(f, r1, r2)
        x = x + dx
        y = y + dy
    return x, y


def sbls_residual(f: SBLSFactors, apply_G, x, y, b1, b2):
    At = jnp.swapaxes(f.A, -1, -2)
    r1 = b1 - (apply_G(x) + At @ y)
    r2 = b2 - (f.A @ x - f.C_diag * y)
    return jnp.maximum(jnp.max(jnp.abs(r1)), jnp.max(jnp.abs(r2)))


# ---------------------------------------------------------------------------
# Sparse augmented-system mode (supernodal LDL^T)
# ---------------------------------------------------------------------------
#
# SBLS's augmented-system factorization (reference src/sbls/sbls.f90:
# 176-184 "factorize the whole K with an indefinite solver"): the KKT
# matrix K = [[G, A'], [A, -C]] is assembled in COO, its pattern is
# analysed ONCE (reused across every IPM iteration — the flagship
# sparse path src/cqp/cqp.f90:4781 -> sbls.f90:1695 -> sls.f90:3521 ->
# SSIDS), and each iteration only re-runs the numeric LDL^T.  Quasi-
# definite regularization (+rho / -delta signed diagonal) replaces
# dynamic pivoting; the expected inertia is (n, m, 0).

import numpy as np  # noqa: E402  (host-side plan assembly)


class SparseKKTPlan:
    """Static analysed KKT structure (identity-hashed; reused across
    factorizations of the same pattern)."""

    __slots__ = ("sym", "n", "m")

    def __init__(self, sym, n: int, m: int):
        self.sym = sym
        self.n = n
        self.m = m

    def solve(self, fac, b):
        from .supernodal import supernodal_solve

        return supernodal_solve(self.sym, fac, b)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_sparse_plan_cache: dict = {}


def sparse_kkt_plan(h_pat, a_pat, n: int) -> SparseKKTPlan:
    """Analyse the augmented KKT pattern [[H, A'], [A, -C]] (H lower
    pattern + A + both diagonals).  Cached per (h_pat, a_pat) pair —
    the SLS_analyse-once contract (reference src/sls/sls.f90:2178)."""
    key = (h_pat, a_pat)
    plan = _sparse_plan_cache.get(key)
    if plan is not None:
        return plan
    from .supernodal import supernodal_analyse

    m = a_pat.m
    rows = np.concatenate([
        np.asarray(h_pat.rows, np.int64),
        np.asarray(a_pat.rows, np.int64) + n,
        np.arange(n, dtype=np.int64),
        n + np.arange(m, dtype=np.int64),
    ])
    cols = np.concatenate([
        np.asarray(h_pat.cols, np.int64),
        np.asarray(a_pat.cols, np.int64),
        np.arange(n, dtype=np.int64),
        n + np.arange(m, dtype=np.int64),
    ])
    sym = supernodal_analyse(rows, cols, n + m, order="amd")
    plan = SparseKKTPlan(sym, n, m)
    _sparse_plan_cache[key] = plan
    return plan


def sparse_kkt_factorize(plan: SparseKKTPlan, h_vals, a_vals, D_x, C_diag,
                         rho=0.0, delta=0.0):
    """Numeric LDL^T of K = [[H + D_x + rho I, A'], [A, -(C + delta I)]]
    on the pre-analysed pattern.  D_x is the (n,) barrier diagonal,
    C_diag the (m,) dual barrier diagonal (>= 0; 0 on equality rows)."""
    from .supernodal import supernodal_factorize

    D_x = jnp.asarray(D_x)
    dt = D_x.dtype
    vals = jnp.concatenate([
        jnp.asarray(h_vals, dt), jnp.asarray(a_vals, dt),
        D_x + jnp.asarray(rho, dt),
        -(jnp.asarray(C_diag, dt) + jnp.asarray(delta, dt)),
    ])
    return supernodal_factorize(plan.sym, vals)
