"""Closed-form + Newton-polished real roots of low-degree polynomials.

TPU-native re-design of GALAHAD's ROOTS package (reference
src/roots/roots.f90: ROOTS_quadratic :396, ROOTS_cubic :519,
ROOTS_quartic :613, ROOTS_polynomial :913).  The reference computes
real roots of quadratics/cubics/quartics in closed form with a Newton
clean-up pass; step-length and secular logic throughout the library is
built on it (e.g. CQP_compute_lmaxstep, src/cqp/cqp.f90:8996).

Here every routine is a pure jittable function operating on (batches
of) coefficient arrays: roots are returned in a fixed-shape array
together with a count, so thousands of per-component step-length
polynomials vmap into one kernel launch — the reference solves them
one scalar at a time on the host.

Conventions: coefficients are ordered low→high (a0 + a1 x + ...).
Non-real roots are reported as +inf with ``nroots`` giving the count of
real ones; roots are sorted ascending with the +inf padding last.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1.0e-13


def _newton_polish(coeffs, x, iters: int = 2):
    """A couple of Newton steps on p(x) = sum coeffs[k] x^k (the
    reference polishes every closed-form root the same way,
    roots.f90:496-516)."""
    def horner(x):
        p = jnp.zeros_like(x)
        dp = jnp.zeros_like(x)
        for c in coeffs[::-1]:
            dp = dp * x + p
            p = p * x + c
        return p, dp

    for _ in range(iters):
        p, dp = horner(x)
        step = jnp.where(jnp.abs(dp) > 0, p / jnp.where(dp == 0, 1.0, dp), 0.0)
        x = jnp.where(jnp.isfinite(x), x - step, x)
    return x


def roots_quadratic(a0, a1, a2, tol: float = _EPS):
    """Real roots of a0 + a1 x + a2 x^2 (reference roots.f90:396).

    Returns (nroots, roots[2]) — stable formulation q = -(a1 +
    sign(a1) sqrt(disc))/2 avoids cancellation. Degenerate (linear /
    constant) cases handled by masking.
    """
    a0, a1, a2 = jnp.broadcast_arrays(
        jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(a2))
    dt = a0.dtype
    inf = jnp.asarray(jnp.inf, dt)

    disc = a1 * a1 - 4.0 * a2 * a0
    # degree classification is *relative* to the coefficient scale so
    # badly scaled polynomials are not demoted (ROOTS_quadratic treats
    # the leading coefficient relative to the data, roots.f90:396)
    scale = jnp.maximum(jnp.maximum(jnp.abs(a0), jnp.abs(a1)), jnp.abs(a2))
    is_quad = jnp.abs(a2) > tol * scale
    is_lin = ~is_quad & (jnp.abs(a1) > tol * scale)
    # a discriminant that rounds slightly negative is a (near-)double
    # root, not "no real roots" (ROOTS_quadratic |disc|~0 handling)
    disc_scale = a1 * a1 + 4.0 * jnp.abs(a2 * a0)
    disc = jnp.where(
        (disc < 0) & (disc >= -tol * jnp.maximum(disc_scale, 1.0)),
        0.0, disc)

    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    q = -0.5 * (a1 + jnp.where(a1 >= 0, sq, -sq))
    # guard the q==0 (a0==0, a1==0) corner
    r1q = jnp.where(jnp.abs(q) > 0, a0 / jnp.where(q == 0, 1.0, q), 0.0)
    r2q = q / jnp.where(is_quad, a2, 1.0)
    lo = jnp.minimum(r1q, r2q)
    hi = jnp.maximum(r1q, r2q)

    lin_root = -a0 / jnp.where(is_lin, a1, 1.0)

    two = is_quad & (disc >= 0)
    r1 = jnp.where(two, lo, jnp.where(is_lin, lin_root, inf))
    r2 = jnp.where(two, hi, inf)
    nroots = jnp.where(two, 2, jnp.where(is_lin, 1, 0)).astype(jnp.int32)
    return nroots, jnp.stack([r1, r2], axis=-1)


def roots_cubic(a0, a1, a2, a3, tol: float = _EPS):
    """Real roots of a0 + a1 x + a2 x^2 + a3 x^3 (reference
    roots.f90:519, Nonweiler's trigonometric/Cardano scheme + Newton).

    Returns (nroots, roots[3]) ascending, +inf padded.
    """
    a0, a1, a2, a3 = jnp.broadcast_arrays(
        jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(a2), jnp.asarray(a3))
    dt = a0.dtype
    inf = jnp.asarray(jnp.inf, dt)

    is_cubic = jnp.abs(a3) > tol
    a3s = jnp.where(is_cubic, a3, 1.0)
    # depressed cubic t^3 + p t + q via x = t - b/3
    b = a2 / a3s
    c = a1 / a3s
    d = a0 / a3s
    p = c - b * b / 3.0
    q = d - b * c / 3.0 + 2.0 * b ** 3 / 27.0
    disc = (q / 2.0) ** 2 + (p / 3.0) ** 3

    # one-real-root branch (disc > 0): Cardano
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    u = jnp.cbrt(-q / 2.0 + sq)
    v = jnp.cbrt(-q / 2.0 - sq)
    t_single = u + v

    # three-real-roots branch (disc <= 0): trigonometric.  Guard the
    # p -> 0 (triple-root) corner where 2*p*r underflows to -0.
    pm = jnp.minimum(p, -1e-300)  # p <= 0 here
    r = jnp.sqrt(-pm / 3.0)
    denom = jnp.minimum(2.0 * pm * r, -1e-300)
    arg = jnp.clip(3.0 * q / denom, -1.0, 1.0)
    phi = jnp.arccos(arg)
    t0 = 2.0 * r * jnp.cos(phi / 3.0)
    t1 = 2.0 * r * jnp.cos((phi - 2.0 * jnp.pi) / 3.0)
    t2 = 2.0 * r * jnp.cos((phi - 4.0 * jnp.pi) / 3.0)

    three = disc <= 0
    shift = b / 3.0
    x0 = jnp.where(three, t0, t_single) - shift
    x1 = jnp.where(three, t1, jnp.inf) - jnp.where(three, shift, 0.0)
    x2 = jnp.where(three, t2, jnp.inf) - jnp.where(three, shift, 0.0)

    coeffs = (a0, a1, a2, a3)
    x0 = _newton_polish(coeffs, x0)
    x1 = jnp.where(jnp.isfinite(x1), _newton_polish(coeffs, x1), x1)
    x2 = jnp.where(jnp.isfinite(x2), _newton_polish(coeffs, x2), x2)

    roots3 = jnp.sort(jnp.stack([x0, x1, x2], axis=-1), axis=-1)
    n3 = jnp.where(three, 3, 1).astype(jnp.int32)

    # quadratic fallback when a3 ~ 0
    nq, rq = roots_quadratic(a0, a1, a2, tol)
    rq3 = jnp.concatenate([rq, jnp.full(rq.shape[:-1] + (1,), inf, dt)], -1)
    nroots = jnp.where(is_cubic, n3, nq)
    roots = jnp.where(is_cubic[..., None], roots3, rq3)
    return nroots, roots


def roots_quartic(a0, a1, a2, a3, a4, tol: float = _EPS):
    """Real roots of the quartic (reference roots.f90:613, Ferrari via
    the resolvent cubic, + Newton polish). Returns (nroots, roots[4])."""
    a0, a1, a2, a3, a4 = jnp.broadcast_arrays(
        jnp.asarray(a0), jnp.asarray(a1), jnp.asarray(a2),
        jnp.asarray(a3), jnp.asarray(a4))
    dt = a0.dtype
    inf = jnp.asarray(jnp.inf, dt)

    is_quartic = jnp.abs(a4) > tol
    a4s = jnp.where(is_quartic, a4, 1.0)
    b, c, d, e = a3 / a4s, a2 / a4s, a1 / a4s, a0 / a4s
    # depressed quartic y^4 + p y^2 + q y + r, x = y - b/4
    p = c - 3.0 * b * b / 8.0
    q = d - b * c / 2.0 + b ** 3 / 8.0
    r = e - b * d / 4.0 + b * b * c / 16.0 - 3.0 * b ** 4 / 256.0

    # resolvent cubic: z^3 - p z^2 - 4 r z + (4 p r - q^2) = 0; take a
    # real root z >= p so the two quadratics below have real coeffs.
    _, zc = roots_cubic(4.0 * p * r - q * q, -4.0 * r, -p, jnp.ones_like(p))
    zmax = jnp.where(jnp.isfinite(zc), zc, -jnp.inf).max(axis=-1)
    z = zmax

    s2 = jnp.maximum(z - p, 0.0)
    s = jnp.sqrt(s2)
    # (y^2 - sy + z/2 - t)(y^2 + sy + z/2 + t) expands with q = -2 t s,
    # r = z^2/4 - t^2; for s -> 0 (biquadratic) recover t from r.
    safe = s > tol
    t = jnp.where(safe, -q / jnp.where(safe, 2.0 * s, 1.0),
                  jnp.sqrt(jnp.maximum(z * z / 4.0 - r, 0.0)))
    # y^2 -+ s y + (z/2 -+ t) factorization
    n1, r1 = roots_quadratic(z / 2.0 - t, -s, jnp.ones_like(s))
    n2, r2 = roots_quadratic(z / 2.0 + t, s, jnp.ones_like(s))

    shift = b / 4.0
    cand = jnp.concatenate([r1, r2], axis=-1) - shift[..., None]
    coeffs = tuple(c[..., None] for c in (a0, a1, a2, a3, a4))
    cand = jnp.where(jnp.isfinite(cand), _newton_polish(coeffs, cand), cand)
    roots4 = jnp.sort(cand, axis=-1)
    n4 = (n1 + n2).astype(jnp.int32)

    nc, rc = roots_cubic(a0, a1, a2, a3, tol)
    rc4 = jnp.concatenate([rc, jnp.full(rc.shape[:-1] + (1,), inf, dt)], -1)
    nroots = jnp.where(is_quartic, n4, nc)
    roots = jnp.where(is_quartic[..., None], roots4, rc4)
    return nroots, roots


def smallest_positive_root(nroots, roots, big: float = jnp.inf):
    """Smallest strictly-positive real root (the step-length question
    every ROOTS call in the IPM asks). +inf if none."""
    pos = jnp.where(
        (roots > 0)
        & jnp.isfinite(roots)
        & (jax.lax.broadcasted_iota(jnp.int32, roots.shape,
                                    roots.ndim - 1) < nroots[..., None]),
        roots, big)
    return jnp.min(pos, axis=-1)


def polynomial_roots_newton(coeffs, x0, iters: int = 30):
    """Arbitrary-degree real-root refinement by damped Newton from x0
    (reference ROOTS_polynomial roots.f90:913 uses a companion-matrix +
    polish scheme; here the polish is the exported primitive and the
    companion eigenproblem is jnp.roots on host when needed)."""
    return _newton_polish(list(coeffs), jnp.asarray(x0), iters)
