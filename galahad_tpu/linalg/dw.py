"""Double-word (compensated) arithmetic for f32-factor accuracy.

TPU hardware has no fp64; the reference reaches direct-solver accuracy
through dynamically pivoted fp64 factorizations + iterative refinement
(reference src/ir/ir.f90:334).  The TPU-native replacement (SURVEY §7.3)
keeps the FACTORIZATION in fast f32 and recovers accuracy with
error-free transformations:

  * two_sum / two_prod — exact rounding-error extraction (Knuth /
    Dekker-Veltkamp; no FMA needed, survives XLA since it performs no
    unsafe reassociation);
  * compensated_sum — cascaded combination of residual terms so the
    cancellation  b - (t1 + ... + tk)  is captured exactly;
  * ir_solve_dw — iterative refinement with the ITERATE held as a
    double-word (hi, lo) pair (Carson-Higham style): residuals are
    evaluated against both words, so the attainable residual is set by
    one matvec's rounding, not by the f32 representation of x.

All ops are elementwise jnp — they vmap/jit and run on the VPU.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp


def _split_const(dtype):
    # Veltkamp splitter 2^ceil(p/2) + 1
    if np.dtype(dtype) == np.float32:
        return 4097.0          # 2^12 + 1  (p = 24)
    return 134217729.0         # 2^27 + 1  (p = 53)


def fast_two_sum(a, b):
    """(s, e) with s = fl(a+b), s+e = a+b exactly; requires |a| >= |b|."""
    s = a + b
    e = b - (s - a)
    return s, e


def two_sum(a, b):
    """(s, e) with s = fl(a+b), s+e = a+b exactly (no magnitude order)."""
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def two_prod(a, b):
    """(p, e) with p = fl(a*b), p+e = a*b exactly (Dekker splitting)."""
    p = a * b
    c = jnp.asarray(_split_const(a.dtype), a.dtype)
    ah = c * a - (c * a - a)
    al = a - ah
    bh = c * b - (c * b - b)
    bl = b - bh
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def dw_add(xh, xl, yh, yl=None):
    """Double-word + double-word (or single) -> normalized double-word."""
    sh, se = two_sum(xh, yh)
    se = se + xl
    if yl is not None:
        se = se + yl
    return fast_two_sum(sh, se)


def compensated_sum(*terms):
    """Sum vectors with cascaded two_sum; returns (hi, lo) capturing the
    combination cancellation exactly.  Use hi + lo for the best single-
    word value."""
    hi = terms[0]
    lo = jnp.zeros_like(hi)
    for t in terms[1:]:
        hi, e = two_sum(hi, t)
        lo = lo + e
    return hi, lo


def residual(b, *terms):
    """Accurate  b - sum(terms)  (single-word result, compensated)."""
    hi, lo = compensated_sum(b, *[-t for t in terms])
    return hi + lo


def ir_solve_dw(matvec, approx_solve, b, sweeps: int = 2):
    """Iterative refinement with a double-word iterate.

    x is carried as (xh, xl); each sweep evaluates
        r = (b - A xh) - A xl      (combination via two_sum)
    and folds the f32 correction into the pair.  Returns (x, |r|_inf)
    with x = xh + xl — the mixed-precision IR of SURVEY §7.3 replacing
    the reference's fp64 IR (src/ir/ir.f90:334)."""
    xh = approx_solve(b)
    xl = jnp.zeros_like(xh)
    r = b
    for _ in range(sweeps):
        t = matvec(xh)
        rh, rl = two_sum(b, -t)
        r = (rh - matvec(xl)) + rl
        d = approx_solve(r)
        xh, xl = dw_add(xh, xl, d)
    return xh + xl, jnp.max(jnp.abs(r))
