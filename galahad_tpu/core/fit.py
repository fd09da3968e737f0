"""Hermite and Puiseux polynomial interpolation of path data.

TPU-native re-design of GALAHAD's FIT package (reference
src/fit/fit.f90: FIT_hermite_interpolation :318,
FIT_puiseux_interpolation :481).  The IPM arc-fitting logic
(cqp.f90:345-349) evaluates the central path x(α) either as a Taylor
series Σ x^k α^k or as a Puiseux series in powers of √α; FIT turns
series coefficients at α=0 (values + derivatives) into evaluable
polynomials.

Everything here is batched: coefficient arrays carry a leading
component axis, so one call fits the whole primal-dual vector family at
once (n + m + duals components), where the reference loops component by
component.
"""
from __future__ import annotations

import jax.numpy as jnp


def hermite_coefficients(derivs):
    """Polynomial coefficients (low→high) of the degree-(k-1)
    truncated Taylor polynomial from derivatives at 0.

    derivs: (..., k) array with derivs[..., j] = d^j f / dα^j (0).
    Returns coeffs (..., k): coeffs[..., j] = derivs[..., j] / j!.

    This is the single-point (confluent) case of FIT_hermite_
    interpolation (fit.f90:318) — the form CQP uses: all information
    comes from one point on the arc (cqp.f90's series construction).
    """
    derivs = jnp.asarray(derivs)
    k = derivs.shape[-1]
    fact = jnp.cumprod(jnp.concatenate(
        [jnp.ones(1, derivs.dtype), jnp.arange(1, k, dtype=derivs.dtype)]))
    return derivs / fact


def hermite_interpolation(alphas, values):
    """Divided-difference (Newton form) interpolation through distinct
    points — the general two-plus-point Hermite case of fit.f90:318
    restricted to function values. Returns Newton coefficients; pair
    with :func:`newton_eval`."""
    alphas = jnp.asarray(alphas)
    values = jnp.asarray(values)
    k = alphas.shape[-1]
    table = values
    coeffs = [table[..., 0]]
    for level in range(1, k):
        num = table[..., 1:] - table[..., :-1]
        den = alphas[..., level:] - alphas[..., :-level]
        table = num / den
        coeffs.append(table[..., 0])
    return jnp.stack(coeffs, axis=-1)


def newton_eval(alphas, coeffs, t):
    """Evaluate the Newton-form polynomial at t (broadcasts)."""
    alphas = jnp.asarray(alphas)
    coeffs = jnp.asarray(coeffs)
    k = coeffs.shape[-1]
    acc = coeffs[..., k - 1]
    for j in range(k - 2, -1, -1):
        acc = coeffs[..., j] + (t - alphas[..., j]) * acc
    return acc


def polyval(coeffs, t):
    """Evaluate Σ coeffs[..., j] t^j (Horner, low→high coeffs)."""
    coeffs = jnp.asarray(coeffs)
    k = coeffs.shape[-1]
    acc = coeffs[..., k - 1]
    for j in range(k - 2, -1, -1):
        acc = acc * t + coeffs[..., j]
    return acc


def puiseux_coefficients(derivs):
    """Puiseux-series coefficients: f(α) ≈ Σ c_j (√α)^j, built from the
    same one-point derivative data (fit.f90:481).  The Puiseux
    re-parameterization θ = √α maps derivative j of f wrt α into the
    2j-th θ-coefficient; odd θ-coefficients are zero for analytic f but
    the evaluation in θ is what stabilizes steps near degenerate
    solutions (cqp.f90 arcs 'ZP', 4/5).

    Returns coeffs (..., 2k-1) in θ = √α, low→high.
    """
    taylor = hermite_coefficients(derivs)
    k = taylor.shape[-1]
    out_len = 2 * k - 1
    coeffs = jnp.zeros(taylor.shape[:-1] + (out_len,), taylor.dtype)
    coeffs = coeffs.at[..., 0::2].set(taylor)
    return coeffs


def puiseux_eval(coeffs, alpha):
    """Evaluate a Puiseux polynomial at α ≥ 0 (θ = √α)."""
    return polyval(coeffs, jnp.sqrt(jnp.asarray(alpha)))
