"""Univariate global optimization (UGO).

TPU-native re-design of GALAHAD's UGO (reference src/ugo/ugo.f90:
UGO_solve :641): global minimum of a smooth f on [a, b] by
Lipschitz-bound interval branching (Piyavskii-Shubert with an adaptive
Lipschitz estimate, the reference's default scheme).

The reference grows interval lists dynamically; here the evaluated
points live in a fixed (maxit + 2)-slot buffer under lax.fori_loop —
one new evaluation per iteration at the minimizer of the piecewise
lower bound, vmap-able over batches of problems.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc


@control_dc
class UGOControl:
    maxit: int = 100
    lipschitz_inflation: float = 2.0   # global L estimate = inflation * max slope
    initial_points: int = 2            # endpoints
    refine_newton_its: int = 5         # final local polish


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "f", "iter", "evals"],
    meta_fields=[],
)
@dataclasses.dataclass
class UGOInfo:
    x: Any
    f: Any
    iter: Any
    evals: Any


def ugo_solve(f: Callable, a, b, ctl: UGOControl = UGOControl()) -> UGOInfo:
    """Globally minimize scalar f on [a, b]."""
    a = jnp.asarray(a)
    dt = a.dtype if jnp.issubdtype(a.dtype, jnp.floating) else jnp.float64
    a = jnp.asarray(a, dt)
    b = jnp.asarray(b, dt)
    cap = ctl.maxit + 2

    xs0 = jnp.full((cap,), b, dt).at[0].set(a).at[1].set(b)
    fs0 = jnp.full((cap,), jnp.inf, dt)
    fs0 = fs0.at[0].set(f(a)).at[1].set(f(b))

    def body(i, carry):
        xs, fs = carry
        k = i + 2                           # number of points so far
        order = jnp.argsort(xs)             # filled slots sorted; padding = b
        xo = xs[order]
        fo = fs[order]
        valid = jnp.arange(cap) < k
        # treat padding as collapsed to b: mask intervals beyond k-1
        dx = xo[1:] - xo[:-1]
        df = jnp.abs(fo[1:] - fo[:-1])
        iv_valid = (jnp.arange(cap - 1) < k - 1) & (dx > 1e-14)
        slopes = jnp.where(iv_valid, df / jnp.maximum(dx, 1e-14), 0.0)
        L = ctl.lipschitz_inflation * jnp.maximum(jnp.max(slopes), 1e-8)
        # Piyavskii lower bound on each interval:
        #   min over [x_i, x_{i+1}] of max(f_i - L (x - x_i), f_{i+1} - L (x_{i+1} - x))
        lb = 0.5 * (fo[1:] + fo[:-1]) - 0.5 * L * dx
        lb = jnp.where(iv_valid, lb, jnp.inf)
        j = jnp.argmin(lb)
        # bound minimizer position in interval j
        xj = 0.5 * (xo[j] + xo[j + 1]) + 0.5 * (fo[j] - fo[j + 1]) / L
        xj = jnp.clip(xj, xo[j] + 0.25 * dx[j], xo[j + 1] - 0.25 * dx[j])
        xs = xs.at[k].set(xj)
        fs = fs.at[k].set(f(xj))
        return xs, fs

    xs, fs = lax.fori_loop(0, ctl.maxit, body, (xs0, fs0))
    ibest = jnp.argmin(fs)
    xbest = xs[ibest]

    # local Newton polish (safeguarded into [a, b])
    df = jax.grad(f)
    d2f = jax.grad(df)

    def polish(i, x):
        g = df(x)
        h = d2f(x)
        step = -g / jnp.where(jnp.abs(h) > 1e-12, h, 1.0)
        x_new = jnp.clip(x + step, a, b)
        return jnp.where(f(x_new) <= f(x), x_new, x)

    xbest = lax.fori_loop(0, ctl.refine_newton_its, polish, xbest)
    return UGOInfo(
        x=xbest, f=f(xbest),
        iter=jnp.array(ctl.maxit, jnp.int32),
        evals=jnp.array(ctl.maxit + 2 + ctl.refine_newton_its, jnp.int32),
    )
