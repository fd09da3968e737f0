"""Exact trust-region subproblem solver (batched).

TPU-native re-design of GALAHAD's TRS (reference src/trs/trs.f90:
TRS_solve :802, TRS_solve_main :1218, hard case :2398-2430) and DPS
(src/dps/dps.f90:578).

    min  1/2 x'Hx + c'x   s.t.  ||x||_M <= radius

The reference runs a secular Newton iteration, refactorizing H + lambda*M
at every trial lambda with a sparse LDL' (SLS) and reading inertia —
a host-sequential, dynamically-pivoted process.  On TPU the target
regime is *thousands of moderate-size dense subproblems at once*
(SURVEY §5.7), so the design pivots: one batched ``eigh`` diagonalizes
H in the M-inner-product (MXU work), after which the secular equation is
a scalar Newton iteration on vectorized eigenvalue data — the same
mathematics as DPS's "diagonalising norm" single-factorization trick
(dps.f90: one factorization, then O(n) secular solves), made exact and
batched.  The hard case reduces to an explicit branch on the leftmost
eigenvector, with no inverse iteration needed.

Everything is pure jax: vmap over problem batches, jit-compatible,
fixed iteration counts with convergence masking.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc


@control_dc
class TRSControl:
    """Subset of TRS_control_type (reference src/trs/trs.f90:150+)."""

    stop_normal: float = 1.0e-12    # relative secular-equation accuracy
    max_newton_its: int = 64
    equality_problem: bool = False  # require ||x|| = radius exactly


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "obj", "multiplier", "norm_x", "hard_case", "interior"],
    meta_fields=[],
)
@dataclasses.dataclass
class TRSInfo:
    """inform equivalent (reference trs.f90 TRS_inform_type)."""

    x: Any
    obj: Any
    multiplier: Any      # lambda >= 0 with (H + lambda M) x = -c
    norm_x: Any
    hard_case: Any
    interior: Any


def _eigh_M(H, c, M=None):
    """Generalized eigendecomposition H q = lam M q via Cholesky of M.

    Returns (lam, ct, back) with back(w) mapping eigen-coords to x and
    ct the transformed linear term.  M=None means the 2-norm.
    """
    if M is None:
        lam, Q = jnp.linalg.eigh(H)
        ct = jnp.swapaxes(Q, -1, -2) @ c[..., None]
        back = lambda w: (Q @ w[..., None])[..., 0]
        return lam, ct[..., 0], back
    L = lax.linalg.cholesky(M, symmetrize_input=True)
    # Ht = L^-1 H L^-T
    Hs = lax.linalg.triangular_solve(L, H, left_side=True, lower=True)
    Ht = lax.linalg.triangular_solve(
        L, jnp.swapaxes(Hs, -1, -2), left_side=True, lower=True
    )
    ctv = lax.linalg.triangular_solve(L, c[..., None], left_side=True, lower=True)
    lam, Q = jnp.linalg.eigh(Ht)
    ct = jnp.swapaxes(Q, -1, -2) @ ctv

    def back(w):
        v = Q @ w[..., None]
        return lax.linalg.triangular_solve(
            L, v, left_side=True, lower=True, transpose_a=True
        )[..., 0]

    return lam, ct[..., 0], back


def _secular_newton(lam, ct2, radius, lam_lo, max_its, tol):
    """Safeguarded Newton on  psi(s) = 1/||x(s)|| - 1/radius  where
    ||x(s)||^2 = sum ct2 / (lam + s)^2, for s in (lam_lo, inf).

    psi is monotone increasing and nearly linear in s (the classical
    Hebden/More-Sorensen formulation the reference's high-order Taylor
    iteration refines, trs.f90:4719); safeguarding keeps s > lam_lo.
    """
    dt = lam.dtype
    eps = jnp.finfo(dt).eps

    def norm2(s):
        d = lam + s[..., None]
        return jnp.sum(ct2 / d**2, axis=-1)

    def dnorm2(s):
        d = lam + s[..., None]
        return -2.0 * jnp.sum(ct2 / d**3, axis=-1)

    # initial s: just above lam_lo, scaled by a Gershgorin-ish upper bound
    s_hi0 = lam_lo + jnp.sqrt(jnp.sum(ct2, axis=-1)) / radius + 1.0
    s = 0.5 * (lam_lo + s_hi0)
    lo = lam_lo
    hi = s_hi0

    def body(i, carry):
        s, lo, hi = carry
        n2 = norm2(s)
        nrm = jnp.sqrt(n2)
        psi = 1.0 / nrm - 1.0 / radius
        # interval update: psi < 0 -> ||x|| > radius -> s too small
        lo = jnp.where(psi < 0, jnp.maximum(lo, s), lo)
        hi = jnp.where(psi > 0, jnp.minimum(hi, s), hi)
        # grow hi if still too small (psi(hi) must be > 0)
        hi = jnp.where(hi <= lo, lo + (s_hi0 - lam_lo) * (2.0 ** i), hi)
        dpsi = -0.5 * dnorm2(s) / (n2 * nrm)
        step = -psi / jnp.where(jnp.abs(dpsi) > eps, dpsi, 1.0)
        s_new = s + step
        bad = (s_new <= lo) | (s_new >= hi) | ~jnp.isfinite(s_new)
        s_new = jnp.where(bad, 0.5 * (lo + hi), s_new)
        return s_new, lo, hi

    s, lo, hi = lax.fori_loop(0, max_its, body, (s, lo, hi))
    return s


def trs_solve_diagonal(h_diag, c, radius, ctl: TRSControl = TRSControl()):
    """Diagonal-Hessian fast path (reference trs.f90:3335): H = diag(h).
    Batched over leading dims."""
    return _trs_from_eigen(h_diag, c, radius, lambda w: w, ctl)


def trs_solve(H, c, radius, M=None, ctl: TRSControl = TRSControl()):
    """Solve the trust-region subproblem exactly.  Batched: H (..., n, n),
    c (..., n), radius (...) broadcastable.  Returns TRSInfo."""
    lam, ct, back = _eigh_M(H, c, M)
    return _trs_from_eigen(lam, ct, radius, back, ctl)


def _trs_from_eigen(lam, ct, radius, back, ctl: TRSControl):
    dt = lam.dtype
    radius = jnp.asarray(radius, dt)
    eps = jnp.finfo(dt).eps
    n = lam.shape[-1]

    lam_min = lam[..., 0] if False else jnp.min(lam, axis=-1)
    ct2 = ct * ct

    # --- interior candidate: x(0) = -H^-1 c, valid if H >= 0 (lam_min > 0)
    pd = lam_min > 0
    d0 = jnp.where(pd[..., None], lam, 1.0)
    x0_w = -ct / d0
    norm0 = jnp.sqrt(jnp.sum(x0_w**2, axis=-1))
    interior = pd & (norm0 <= radius) & (not ctl.equality_problem)

    # --- boundary: find s > max(0, -lam_min) with ||x(s)|| = radius.
    # For equality problems the multiplier may be negative: the root
    # lives in (-lam_min, inf) (reference trs.f90 equality_problem).
    if ctl.equality_problem:
        lam_lo = -lam_min
    else:
        lam_lo = jnp.maximum(-lam_min, 0.0)
    # hard-case detection: components of c along eigenspace of lam_min
    scale = jnp.maximum(jnp.max(jnp.abs(ct), axis=-1), 1.0)
    at_min = jnp.abs(lam - lam_min[..., None]) <= (
        jnp.abs(lam_min[..., None]) + 1.0
    ) * (eps ** 0.5)
    c_in_min = jnp.sqrt(
        jnp.sum(jnp.where(at_min, ct2, 0.0), axis=-1)
    ) > scale * eps ** 0.75

    # norm of the pseudo-inverse solution at s = lam_lo (excluding the
    # lam_min eigenspace when c has no component there)
    d_at = lam + lam_lo[..., None]
    safe = jnp.where(at_min & ~c_in_min[..., None], jnp.inf, d_at)
    safe = jnp.where(jnp.abs(safe) < eps, eps, safe)
    norm_pinv = jnp.sqrt(jnp.sum(ct2 / safe**2, axis=-1))
    boundary_active = (
        jnp.ones_like(lam_min, bool) if ctl.equality_problem else lam_min < 0
    )
    hard = (~c_in_min) & (norm_pinv < radius) & boundary_active

    # secular Newton for the easy boundary case
    s_b = _secular_newton(
        jnp.where(hard[..., None], lam + 1.0, lam),   # dummy data in hard case
        jnp.where(hard[..., None], 0.0 * ct2 + 1.0, ct2),
        radius,
        jnp.where(hard, 1.0, lam_lo),
        ctl.max_newton_its,
        ctl.stop_normal,
    )

    # assemble boundary solution in eigen-coords
    s_sol = jnp.where(hard, lam_lo, s_b)
    d = lam + s_sol[..., None]
    d_safe = jnp.where(at_min & ~c_in_min[..., None] & hard[..., None],
                       jnp.inf, d)
    d_safe = jnp.where(jnp.abs(d_safe) < eps, eps, d_safe)
    xw = -ct / d_safe
    # hard case: add tau * (leftmost eigenvector) to reach the boundary
    nx2 = jnp.sum(xw**2, axis=-1)
    tau = jnp.sqrt(jnp.maximum(radius**2 - nx2, 0.0))
    first_min = jnp.cumsum(at_min.astype(jnp.int32), axis=-1) == 1
    e_min = jnp.where(first_min & at_min, 1.0, 0.0)
    xw = jnp.where(hard[..., None], xw + tau[..., None] * e_min, xw)

    # choose interior vs boundary
    w = jnp.where(interior[..., None], x0_w, xw)
    mult = jnp.where(interior, 0.0, s_sol)
    x = back(w)
    obj = 0.5 * jnp.sum(lam * w**2, axis=-1) + jnp.sum(ct * w, axis=-1)
    norm_x = jnp.sqrt(jnp.sum(w**2, axis=-1))
    return TRSInfo(
        x=x, obj=obj, multiplier=mult, norm_x=norm_x,
        hard_case=hard & ~interior, interior=interior,
    )


# ---------------------------------------------------------------------------
# RQS: regularized quadratic subproblem (reference src/rqs/rqs.f90:774)
# ---------------------------------------------------------------------------


@control_dc
class RQSControl:
    stop_normal: float = 1.0e-12
    max_newton_its: int = 96


def rqs_solve(H, c, sigma, p=3.0, M=None, ctl: RQSControl = RQSControl()):
    """min 1/2 x'Hx + c'x + (sigma/p) ||x||_M^p  (p > 2, typically 3).

    Optimality: (H + s M) x = -c with s = sigma * ||x||^(p-2) >= 0 and
    H + s M >= 0.  Same eigen-machinery as TRS; the secular equation
    becomes  theta(s) = (s/sigma)^(1/(p-2)) - ||x(s)|| = 0, monotone
    increasing in s, solved by safeguarded Newton.
    """
    lam, ct, back = _eigh_M(H, c, M)
    dt = lam.dtype
    eps = jnp.finfo(dt).eps
    sigma = jnp.asarray(sigma, dt)
    ct2 = ct * ct
    lam_min = jnp.min(lam, axis=-1)
    lam_lo = jnp.maximum(-lam_min, 0.0)
    pm2 = p - 2.0

    scale = jnp.maximum(jnp.max(jnp.abs(ct), axis=-1), 1.0)
    at_min = jnp.abs(lam - lam_min[..., None]) <= (
        jnp.abs(lam_min[..., None]) + 1.0
    ) * (eps ** 0.5)
    c_in_min = jnp.sqrt(jnp.sum(jnp.where(at_min, ct2, 0.0), axis=-1)) \
        > scale * eps ** 0.75

    def norm_at(s):
        d = lam + s[..., None]
        d = jnp.where(at_min & ~c_in_min[..., None], jnp.inf, d)
        d = jnp.where(jnp.abs(d) < eps, eps, d)
        return jnp.sqrt(jnp.sum(ct2 / d**2, axis=-1)), d

    # hard case: at s = lam_lo (>0), target radius (s/sigma)^(1/(p-2))
    # exceeds ||pinv solution||
    norm_lo, _ = norm_at(lam_lo)
    target_lo = (lam_lo / sigma) ** (1.0 / pm2)
    hard = (~c_in_min) & (lam_min < 0) & (norm_lo < target_lo)

    # Newton on theta(s) = (s/sigma)^(1/(p-2)) - ||x(s)||
    s0 = lam_lo + jnp.maximum(
        sigma * jnp.maximum(jnp.sqrt(jnp.sum(ct2, axis=-1)), 1.0), 1.0
    ) * 0 + lam_lo + 1.0
    # robust bracketed Newton
    lo = lam_lo
    hi = lam_lo + sigma ** (1 / (p - 1)) * jnp.sum(ct2, axis=-1) ** (
        pm2 / (2 * (p - 1))
    ) + jnp.maximum(lam_lo, 1.0)

    def theta(s):
        nrm, d = norm_at(s)
        return (jnp.maximum(s, 0.0) / sigma) ** (1.0 / pm2) - nrm, nrm, d

    # ensure hi brackets: grow geometrically
    def grow(carry):
        hi, k = carry
        return jnp.where(theta(hi)[0] < 0, hi * 2.0 + 1.0, hi), k + 1

    def grow_cond(carry):
        hi, k = carry
        return jnp.any(theta(hi)[0] < 0) & (k < 60)

    hi, _ = lax.while_loop(grow_cond, grow, (hi, 0))

    def body(i, carry):
        s, lo, hi = carry
        th, nrm, d = theta(s)
        lo = jnp.where(th < 0, jnp.maximum(lo, s), lo)
        hi = jnp.where(th > 0, jnp.minimum(hi, s), hi)
        dn = -jnp.sum(ct2 / d**3, axis=-1) / jnp.where(nrm > eps, nrm, 1.0)
        dth = (1.0 / (pm2 * sigma)) * (
            jnp.maximum(s, eps) / sigma
        ) ** (1.0 / pm2 - 1.0) - dn
        step = -th / jnp.where(jnp.abs(dth) > eps, dth, 1.0)
        s_new = s + step
        bad = (s_new <= lo) | (s_new >= hi) | ~jnp.isfinite(s_new)
        s_new = jnp.where(bad, 0.5 * (lo + hi), s_new)
        return s_new, lo, hi

    s0 = 0.5 * (lo + hi)
    s, lo, hi = lax.fori_loop(0, ctl.max_newton_its, body, (s0, lo, hi))

    s_sol = jnp.where(hard, lam_lo, s)
    nrm, d = norm_at(s_sol)
    xw = -ct / d
    # hard case: extend along leftmost eigenvector to radius (s/sigma)^(1/pm2)
    target = (s_sol / sigma) ** (1.0 / pm2)
    tau = jnp.sqrt(jnp.maximum(target**2 - jnp.sum(xw**2, axis=-1), 0.0))
    first_min = jnp.cumsum(at_min.astype(jnp.int32), axis=-1) == 1
    e_min = jnp.where(first_min & at_min, 1.0, 0.0)
    xw = jnp.where(hard[..., None], xw + tau[..., None] * e_min, xw)

    # interior (s = 0) candidate when H PD and sigma small has s>0 always
    # unless c = 0; s -> 0 handled by the bracket (lo = 0 when lam_min > 0).
    x = back(xw)
    norm_x = jnp.sqrt(jnp.sum(xw**2, axis=-1))
    obj = 0.5 * jnp.sum(lam * xw**2, axis=-1) + jnp.sum(ct * xw, axis=-1) \
        + (sigma / p) * norm_x**p
    return TRSInfo(
        x=x, obj=obj, multiplier=s_sol, norm_x=norm_x,
        hard_case=hard, interior=jnp.zeros_like(hard),
    )


def dps_solve(H, c, radius=None, sigma=None, p=3.0, M=None,
              goldfarb: bool = False, ctl: TRSControl = TRSControl()):
    """DPS (reference src/dps/dps.f90:578): solve TRS or RQS in a
    DIAGONALIZING norm built from H itself — by default the modified
    absolute-value norm M = Q |Lambda|_mod Q' (small eigenvalues floored;
    dps.f90 'modified absolute-value version'), or the Goldfarb variant
    (|Lambda| floored at a fraction of lambda_max) when ``goldfarb``.

    In the transformed coordinates u = |Lambda|^{1/2} Q' x the problem is
    a unit-norm TRS/RQS with spectrum sign(lambda) — solved by the same
    secular machinery, and re-solves for new (c, radius/sigma) reuse the
    eigendecomposition (DPS_resolve semantics, dps.f90).

    ``M`` (a caller-supplied norm) overrides the built norm and falls
    back to plain TRS/RQS in that norm."""
    if M is not None:
        if radius is not None:
            return trs_solve(H, c, radius, M=M, ctl=ctl)
        return rqs_solve(H, c, sigma, p=p, M=M)

    H = jnp.asarray(H)
    c = jnp.asarray(c, H.dtype)
    lam, Q = jnp.linalg.eigh(H)
    eps = jnp.finfo(lam.dtype).eps
    if goldfarb:
        floor = jnp.maximum(
            eps ** 0.5 * jnp.max(jnp.abs(lam), axis=-1, keepdims=True),
            eps)
    else:
        floor = jnp.asarray(eps ** 0.5, lam.dtype)
    a = jnp.maximum(jnp.abs(lam), floor)          # |Lambda|_mod
    rs = jnp.sqrt(a)
    lam_u = lam / a                                # sign spectrum
    ct_u = jnp.einsum("...ij,...i->...j", Q, c) / rs

    def back(w):
        return jnp.einsum("...ij,...j->...i", Q, w / rs)

    if radius is not None:
        return _trs_from_eigen(lam_u, ct_u, radius, back, ctl)
    info = rqs_solve(jnp.diag(lam_u) if lam_u.ndim == 1 else
                     jax.vmap(jnp.diag)(lam_u), ct_u, sigma, p=p)
    return dataclasses.replace(info, x=back(info.x))


def trs_solve_chol(H, c, radius, ctl: TRSControl = TRSControl(),
                   iters: int = 26):
    """Factorization-based Moré-Sorensen TRS — the reference TRS's own
    algorithm (factorize H + lambda I per candidate lambda, safeguarded
    Newton on 1/||x|| - 1/radius; reference src/trs/trs.f90:802), here
    with BATCHED Cholesky factorizations on the MXU: ~30x cheaper per
    iteration than the eigendecomposition path on TPU, so this is the
    high-throughput batched backend (bench.py headline).  vmap over
    leading batch dims.

    Near-hard-case inputs get a LINPACK-style correction (two inverse
    iterations with the final factor + a boundary step along the
    approximate eigenvector); exactly-hard cases should use the
    eigen-secular ``trs_solve``, which resolves them exactly."""
    H = jnp.asarray(H)
    dt = H.dtype
    single = H.ndim == 2

    def one(H, c, radius):
        n = H.shape[-1]
        I = jnp.eye(n, dtype=dt)
        c = jnp.asarray(c, dt)
        radius = jnp.asarray(radius, dt)
        normc = jnp.linalg.norm(c)
        diag = jnp.diagonal(H)
        offr = jnp.sum(jnp.abs(H), axis=-1) - jnp.abs(diag)
        gersh_min = jnp.min(diag - offr)          # lambda_min >= this
        lam_hi0 = jnp.maximum(0.0, -gersh_min) + normc / radius + 1.0
        tol = 10 * jnp.finfo(dt).eps

        def fac_solve(lam):
            L = jnp.linalg.cholesky(H + lam * I)
            ok = jnp.all(jnp.isfinite(jnp.diagonal(L)))
            Ls = jnp.where(ok, L, I)
            x = jax.scipy.linalg.cho_solve((Ls, True), -c)
            w = jax.scipy.linalg.solve_triangular(Ls, x, lower=True)
            return ok, Ls, x, w

        def body(i, st):
            lam, lo, hi, xb, lamb, done = st
            ok, L, x, w = fac_solve(lam)
            nx = jnp.linalg.norm(x)
            # interior optimum: lam == 0 feasible and ||x|| <= radius
            interior = ok & (lam <= tol) & (nx <= radius * (1 + tol))
            at_boundary = ok & (jnp.abs(nx - radius)
                                <= 1e-6 * radius)
            newly = (~done) & (interior | at_boundary)
            xb = jnp.where(newly[..., None], x, xb)
            lamb = jnp.where(newly, lam, lamb)
            done = done | newly
            # bracket update
            lo = jnp.where(~ok | (ok & (nx > radius)), lam, lo)
            hi = jnp.where(ok & (nx < radius), jnp.minimum(hi, lam), hi)
            nw2 = jnp.sum(w * w)
            dlam = (nx * nx / jnp.maximum(nw2, 1e-30)) \
                * (nx - radius) / radius
            lam_n = lam + dlam
            inside = ok & (lam_n > lo) & (lam_n < hi)
            lam_next = jnp.where(
                inside, lam_n,
                jnp.maximum(jnp.sqrt(jnp.maximum(lo, 1e-30) * hi),
                            lo + 0.01 * (hi - lo)))
            lam_next = jnp.where(done, lam, lam_next)
            return lam_next, lo, hi, xb, lamb, done

        lam0 = jnp.zeros((), dt)
        st = (lam0, jnp.zeros((), dt), lam_hi0,
              jnp.zeros(n, dt), jnp.zeros((), dt),
              jnp.zeros((), bool))
        lam, lo, hi, xb, lamb, done = lax.fori_loop(0, iters, body, st)
        # not converged -> near-hard case: accept the last feasible
        # iterate and push to the boundary along an approximate
        # null eigenvector (LINPACK correction)
        okf, L, xf, _ = fac_solve(jnp.where(done, lamb, hi))
        x = jnp.where(done, xb, xf)
        lam_out = jnp.where(done, lamb, hi)
        u = jax.scipy.linalg.cho_solve((L, True),
                                       jnp.ones(n, dt) / jnp.sqrt(n))
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-30)
        u = jax.scipy.linalg.cho_solve((L, True), u)
        u = u / jnp.maximum(jnp.linalg.norm(u), 1e-30)
        xu = jnp.vdot(x, u)
        rr = radius * radius - jnp.sum(x * x)
        tau_a = -xu + jnp.sqrt(jnp.maximum(xu * xu + rr, 0.0))
        tau_b = -xu - jnp.sqrt(jnp.maximum(xu * xu + rr, 0.0))
        mval = lambda t: 0.5 * jnp.vdot(x + t * u, H @ (x + t * u)) \
            + jnp.vdot(c, x + t * u)
        tau = jnp.where(mval(tau_a) <= mval(tau_b), tau_a, tau_b)
        hard = (~done) & (rr > tol * radius * radius)
        x = jnp.where(hard, x + tau * u, x)
        nx = jnp.linalg.norm(x)
        obj = 0.5 * jnp.vdot(x, H @ x) + jnp.vdot(c, x)
        interior = done & (lam_out <= tol)
        return TRSInfo(x=x, obj=obj, multiplier=lam_out, norm_x=nx,
                       hard_case=hard, interior=interior)

    if single:
        return one(H, c, radius)
    # vmap over one leading batch dim (flatten any extra dims first)
    bshape = H.shape[:-2]
    Hf = H.reshape((-1,) + H.shape[-2:])
    cf = jnp.broadcast_to(jnp.asarray(c, dt),
                          bshape + H.shape[-1:]).reshape(
        -1, H.shape[-1])
    rf = jnp.broadcast_to(jnp.asarray(radius, dt), bshape).reshape(-1)
    out = jax.vmap(one)(Hf, cf, rf)
    return jax.tree_util.tree_map(
        lambda a: a.reshape(bshape + a.shape[1:]), out)
