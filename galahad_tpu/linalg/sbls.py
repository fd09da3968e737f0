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

    __slots__ = ("sym", "n", "m", "rows", "cols", "dsel", "dpos", "_dev")

    def __init__(self, sym, n: int, m: int, rows, cols):
        self.sym = sym
        self.n = n
        self.m = m
        self.rows = rows            # combined K pattern (np), for scaling
        self.cols = cols
        dsel = np.flatnonzero(rows == cols)
        self.dsel = dsel            # positions of diagonal entries
        self.dpos = rows[dsel]
        self._dev = None            # device copies of the index arrays

    def device_indices(self):
        if self._dev is None:
            # concrete buffers even when first touched inside a jit
            # trace (the fused step): a cached tracer would leak
            import jax

            with jax.ensure_compile_time_eval():
                self._dev = tuple(
                    jnp.asarray(a, jnp.int32) for a in
                    (self.rows, self.cols, self.dsel, self.dpos))
        return self._dev

    def solve(self, fac, b):
        from .supernodal_flat import FlatPlan, flat_solve

        if isinstance(self.sym, FlatPlan):
            _solve = lambda f, v: flat_solve(self.sym, f, v)
        else:
            from .supernodal import supernodal_solve

            _solve = lambda f, v: supernodal_solve(self.sym, f, v)
        if isinstance(fac, tuple):          # (factors, jacobi scale S)
            fac, S = fac
            return S * _solve(fac, S * jnp.asarray(b))
        return _solve(fac, b)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


_sparse_plan_cache: dict = {}


def sparse_kkt_plan(h_pat, a_pat, n: int,
                    backend: str = "flat") -> SparseKKTPlan:
    """Analyse the augmented KKT pattern [[H, A'], [A, -C]] (H lower
    pattern + A + both diagonals).  Cached per (h_pat, a_pat) pair —
    the SLS_analyse-once contract (reference src/sls/sls.f90:2178).

    backend="flat" (default) uses the compile-bounded flat-slab kernels
    (linalg/supernodal_flat.py); "inline" traces the whole factorization
    into the caller's jit (only sensible for small fixed patterns)."""
    key = (h_pat, a_pat, backend)
    plan = _sparse_plan_cache.get(key)
    if plan is not None:
        return plan
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
    if backend == "flat":
        from .supernodal_flat import flat_analyse

        # aggressive supernode amalgamation: fewer/larger fronts cut
        # the group/chunk count (host dispatches through the TPU
        # tunnel cost ~ms each) and feed the MXU bigger matmuls, at
        # ~20-40% extra fill (the SSIDS amalgamation tradeoff,
        # src/ssids/anal.f90)
        sym = flat_analyse(rows, cols, n + m, order="amd",
                           relax_cols=16)
    else:
        from .supernodal import supernodal_analyse

        sym = supernodal_analyse(rows, cols, n + m, order="amd")
    plan = SparseKKTPlan(sym, n, m, rows, cols)
    _sparse_plan_cache[key] = plan
    return plan


def sparse_kkt_factorize(plan: SparseKKTPlan, h_vals, a_vals, D_x, C_diag,
                         rho=0.0, delta=0.0):
    """Numeric LDL^T of K = [[H + D_x + rho I, A'], [A, -(C + delta I)]]
    on the pre-analysed pattern.  D_x is the (n,) barrier diagonal,
    C_diag the (m,) dual barrier diagonal (>= 0; 0 on equality rows).

    The matrix is SYMMETRICALLY JACOBI-SCALED before factorization
    (S K S with S = |diag K|^{-1/2}) — the SLS pre-factorization
    scaling role (reference src/sls/sls.f90 mc64/mc77 controls).  The
    barrier diagonal spreads over ~16 decades near convergence; scaling
    collapses that spread so an f32 factorization still preconditions
    iterative refinement (without it cond * eps_f32 >> 1 and the IPM
    dual endgame is noise).  Returns (factors, S); plan.solve applies
    both."""
    from .supernodal_flat import FlatPlan, flat_factorize

    D_x = jnp.asarray(D_x)
    dt = D_x.dtype
    vals = jnp.concatenate([
        jnp.asarray(h_vals, dt), jnp.asarray(a_vals, dt),
        D_x + jnp.asarray(rho, dt),
        -(jnp.asarray(C_diag, dt) + jnp.asarray(delta, dt)),
    ])
    nm = plan.n + plan.m
    rows_d, cols_d, dsel_d, dpos_d = plan.device_indices()
    diag = jnp.zeros(nm, dt).at[dpos_d].add(vals[dsel_d])
    S = 1.0 / jnp.sqrt(jnp.maximum(jnp.abs(diag), 1e-30))
    vals_s = vals * S[rows_d] * S[cols_d]
    if isinstance(plan.sym, FlatPlan):
        return flat_factorize(plan.sym, vals_s), S
    from .supernodal import supernodal_factorize

    return supernodal_factorize(plan.sym, vals_s), S


# ---------------------------------------------------------------------------
# Preconditioner menu, null-space mode, projected PCG, Fredholm alternative
# ---------------------------------------------------------------------------


def sbls_preconditioner(H, kind: str = "full", *, semi_bandwidth: int = 5,
                        min_diagonal: float = 1.0e-8, D=None):
    """The G-block menu of SBLS_form_and_factorize (reference
    src/sbls/sbls.f90:1918-1926): the KKT preconditioner factorizes
    [[G, A'], [A, -C]] with G an approximation of H.

    Returns (G, g_is_diag) ready for sbls_factorize:
      "identity"  G = I              (sbls preconditioner = 1)
      "full"      G = H              (= 2, exact)
      "diag_h"    G = diag(H) floored (= 3)
      "band_h"    G = band(H)        (= 4)
      "user_d"    G = D (given diagonal) (optional-D menu entry)
    """
    H = jnp.asarray(H)
    n = H.shape[-1]
    dt = H.dtype
    if kind == "identity":
        return jnp.ones(n, dt), True
    if kind == "full":
        return H, False
    if kind == "diag_h":
        d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1),
                        jnp.asarray(min_diagonal, dt))
        return d, True
    if kind == "band_h":
        i = jnp.arange(n)
        band = jnp.abs(i[:, None] - i[None, :]) <= semi_bandwidth
        return jnp.where(band, H, 0.0), False
    if kind == "user_d":
        return jnp.asarray(D, dt), True
    raise ValueError(f"unknown SBLS preconditioner {kind!r}")


class NullspaceFactors:
    """Null-space factorization of K (reference SBLS null-space mode,
    sbls.f90:6861): with A = [A1 A2], A1 nonsingular (basis columns
    found by ULS, SBLS_find_A1_and_A2 :8082) and C = 0,

        Z = [-A1^-1 A2; I]   spans null(A),
        x = x_p + Z x_n,  A x_p = b2,   (Z' G Z) x_n = Z'(b1 - G x_p),
        A1' y = (b1 - G x)_basic.

    Static basis selection happens on the host once per structure; the
    reduced (n-m, n-m) operator is dense MXU work.
    """

    __slots__ = ("basic", "nonbasic", "A1_lu", "Zmat", "L_red", "G", "A",
                 "ok")

    def __init__(self, basic, nonbasic, A1_lu, Zmat, L_red, G, A, ok):
        self.basic = basic
        self.nonbasic = nonbasic
        self.A1_lu = A1_lu
        self.Zmat = Zmat
        self.L_red = L_red
        self.G = G
        self.A = A
        self.ok = ok


def sbls_factorize_nullspace(G, A, *, tol: float = 1.0e-10,
                             max_tries: int = 12) -> NullspaceFactors:
    """Null-space factorization of [[G, A'], [A, 0]] (C must be zero —
    the equality-constrained case the reference restricts this mode to)."""
    from .uls import uls_find_basis

    G = jnp.asarray(G)
    A = jnp.asarray(A)
    m, n = A.shape
    basic, nonbasic, rank = uls_find_basis(np.asarray(jax.device_get(A)),
                                           tol=tol)
    if rank < m:
        raise ValueError(
            f"A is rank deficient ({rank} < {m}); run FDC first")
    A1 = A[:, basic]
    A2 = A[:, nonbasic]
    lu, piv = jax.scipy.linalg.lu_factor(A1)
    Y = jax.scipy.linalg.lu_solve((lu, piv), A2)       # A1^-1 A2 (m, n-m)
    Zmat = jnp.zeros((n, n - m), G.dtype)
    Zmat = Zmat.at[jnp.asarray(basic), :].set(-Y)
    Zmat = Zmat.at[jnp.asarray(nonbasic), :].set(
        jnp.eye(n - m, dtype=G.dtype))
    R = Zmat.T @ (G @ Zmat)                            # reduced Hessian
    L_red, _, ok = chol_factor_shifted(R, 0.0, max_tries=max_tries)
    return NullspaceFactors(basic, nonbasic, (lu, piv), Zmat, L_red, G, A,
                            ok)


def sbls_solve_nullspace(f: NullspaceFactors, b1, b2):
    """Solve [[G, A'], [A, 0]] [x; y] = [b1; b2] via the null-space
    factors."""
    basic = jnp.asarray(f.basic)
    # particular solution: x_p basic components solve A1 x_p = b2
    xp = jnp.zeros(f.A.shape[1], b1.dtype)
    xp = xp.at[basic].set(jax.scipy.linalg.lu_solve(f.A1_lu, b2))
    rhs = f.Zmat.T @ (b1 - f.G @ xp)
    xn = chol_solve(f.L_red, rhs)
    x = xp + f.Zmat @ xn
    res = (b1 - f.G @ x)[basic]
    y = jax.scipy.linalg.lu_solve(f.A1_lu, res, trans=1)
    return x, y


def sbls_solve_iterative(f: SBLSFactors, apply_G, b1, b2, *,
                         maxit: int = 100, stop_rel: float = 1.0e-10):
    """Projected preconditioned CG on the G-system over null(A)
    (reference SBLS_solve_iterative, sbls.f90:8762).

    The factorized K (with its menu G) is the constraint preconditioner:
    each projection step solves K [w; u] = [r; 0], which both
    preconditions with the menu-G and projects onto null(A).  apply_G is
    the action of the TRUE H.  Solves K_true [x; y] = [b1; b2] for C=0
    up to the projected-CG tolerance; returns (x, y, iters).
    """
    At = jnp.swapaxes(f.A, -1, -2)
    m = f.A.shape[-2]
    # feasible start: x0 from one preconditioner solve, then CG on the
    # deviation inside null(A)
    x0, _ = _solve_once(f, jnp.zeros_like(b1), b2)

    r0 = apply_G(x0) - b1
    w0, _ = _solve_once(f, r0, jnp.zeros(m, b1.dtype))
    p0 = -w0
    rw0 = r0 @ w0

    # rw = r'w is the projected-preconditioned residual energy; it
    # decreases monotonically in exact arithmetic.  Stop RELATIVE to
    # rw0 and bail out on stagnation/growth — the regularized
    # projection re-injects range(A') noise near convergence, which
    # would otherwise make the recurrence diverge after the minimum.
    tol2 = stop_rel * stop_rel * jnp.abs(rw0) + jnp.finfo(b1.dtype).tiny

    def cond(st):
        x, r, w, p, rw, k, done = st
        return (~done) & (k < maxit)

    def body(st):
        x, r, w, p, rw, k, _ = st
        Gp = apply_G(p)
        alpha = rw / jnp.maximum(p @ Gp, jnp.finfo(b1.dtype).tiny)
        x_new = x + alpha * p
        r_new = r + alpha * Gp
        w_new, _ = _solve_once(f, r_new, jnp.zeros(m, b1.dtype))
        rw_new = r_new @ w_new
        diverged = rw_new >= rw          # stagnation / roundoff growth
        x = jnp.where(diverged, x, x_new)
        r = jnp.where(diverged, r, r_new)
        beta = rw_new / jnp.maximum(rw, jnp.finfo(b1.dtype).tiny)
        p = -w_new + beta * p
        done = (rw_new <= tol2) | diverged
        return x, r, w_new, p, jnp.minimum(rw_new, rw), k + 1, done

    st = (x0, r0, w0, p0, rw0, jnp.asarray(0, jnp.int32),
          jnp.abs(rw0) <= tol2)
    x, r, w, p, rw, k, done = jax.lax.while_loop(cond, body, st)
    # one restart with the exactly recomputed residual: clears the
    # rounding the truncated recurrence accumulated (GNH-style
    # re-projection refinement)
    r1 = apply_G(x) - b1
    w1, _ = _solve_once(f, r1, jnp.zeros(m, b1.dtype))
    rw1 = r1 @ w1
    st = (x, r1, w1, -w1, rw1, k, jnp.abs(rw1) <= tol2)
    x, r, w, p, rw, k, done = jax.lax.while_loop(cond, body, st)
    # multipliers from one last preconditioner solve against the residual
    _, y = _solve_once(f, b1 - apply_G(x), jnp.zeros(m, b1.dtype))
    return x, y, k


def sbls_fredholm_alternative(G, A, C_diag, b1, b2, *, tol: float = 1e-9):
    """Fredholm alternative for (possibly singular) K (reference
    SBLS_fredholm_alternative, sbls.f90:9254): either returns
    (True, (x, y)) with K [x; y] = b, or (False, (v1, v2)) with
    K v = 0 and b' v != 0 — the certificate that no solution exists.

    Dense spectral implementation (the singular K path is a small-n
    diagnostic in the reference too)."""
    G = jnp.asarray(G)
    A = jnp.asarray(A)
    n = G.shape[-1]
    m = A.shape[-2]
    K = jnp.zeros((n + m, n + m), G.dtype)
    K = K.at[:n, :n].set(G)
    K = K.at[n:, :n].set(A)
    K = K.at[:n, n:].set(A.T)
    K = K.at[jnp.arange(n, n + m), jnp.arange(n, n + m)].set(-C_diag)
    b = jnp.concatenate([b1, b2])
    lam, Q = jnp.linalg.eigh(K)
    scale = jnp.max(jnp.abs(lam))
    nz = jnp.abs(lam) > tol * scale
    bt = Q.T @ b
    # least-squares/minimum-norm solution on the range
    u = jnp.where(nz, bt / jnp.where(nz, lam, 1.0), 0.0)
    sol = Q @ u
    # residual lies in the null space; nonzero => certificate
    r = b - K @ sol
    solvable = jnp.linalg.norm(r) <= tol * (1.0 + jnp.linalg.norm(b))
    nr = jnp.linalg.norm(r)
    v = r / jnp.where(nr > 0, nr, 1.0)
    x = jnp.where(solvable, sol[:n], v[:n])
    y = jnp.where(solvable, sol[n:], v[n:])
    return solvable, (x, y)
