"""Filter trust-region method for nonlinear feasibility / least squares
(FILTRANE equivalent) plus the filter acceptance mechanism (FILTER).

TPU-native re-design of GALAHAD's FILTRANE (reference
src/filtrane/filtrane.f90: filter trust-region for c_l <= c(x) <= c_u)
and FILTER (src/filter/filter.f90: the (theta, f) dominance filter).

Problem: find x (within bounds) with c_l <= c(x) <= c_u, by decreasing
the violation  r(x) = c(x) - clip(c(x), c_l, c_u).

Method: Gauss-Newton trust-region steps on 1/2||r||^2 (exact TRS on the
J'J model, tr/trs.py), accepted either by the classical ratio test OR by
the filter — a fixed-capacity array of (theta_inf, theta_2) pairs with
masked dominance tests, so the whole acceptance test is a vectorized
comparison (the reference grows a linked list).  Filter acceptance is
what lets FILTRANE take large non-monotone steps.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from ..core.problem import INFINITY
from ..core.status import Status
from ..tr.trs import trs_solve


@control_dc
class FiltraneControl:
    maxit: int = 100
    stop_c: float = 1.0e-8            # feasibility tolerance on theta_2
    initial_radius: float = 1.0
    filter_capacity: int = 40
    gamma_filter: float = 1.0e-4      # filter margin
    eta_successful: float = 0.01
    infinity: float = INFINITY


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["theta_inf", "theta_2", "count"],
    meta_fields=["cap"],
)
@dataclasses.dataclass
class Filter:
    """Fixed-capacity (theta_inf, theta_2) dominance filter."""

    theta_inf: Any
    theta_2: Any
    count: Any
    cap: int = 0


def filter_init(cap: int, dtype=jnp.float64) -> Filter:
    return Filter(
        theta_inf=jnp.full((cap,), jnp.inf, dtype),
        theta_2=jnp.full((cap,), jnp.inf, dtype),
        count=jnp.array(0, jnp.int32),
        cap=cap,
    )


def filter_acceptable(f: Filter, t_inf, t_2, gamma):
    """Point acceptable iff it improves on EVERY filter entry in at
    least one measure, by the margin gamma (reference filter.f90
    acceptance)."""
    active = jnp.arange(f.cap) < f.count
    dominates = (t_inf >= (1 - gamma) * f.theta_inf) & (
        t_2 >= (1 - gamma) * f.theta_2
    )
    return ~jnp.any(active & dominates)


def filter_add(f: Filter, t_inf, t_2) -> Filter:
    """Insert a pair; ring-overwrite when full (the margin keeps the
    filter finite in theory; capacity is a hard cap in practice)."""
    j = f.count % f.cap
    return dataclasses.replace(
        f,
        theta_inf=f.theta_inf.at[j].set(t_inf),
        theta_2=f.theta_2.at[j].set(t_2),
        count=jnp.minimum(f.count + 1, jnp.array(2 ** 30, jnp.int32)),
    )


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "theta", "iter", "converged", "status"],
    meta_fields=[],
)
@dataclasses.dataclass
class FiltraneInfo:
    x: Any
    theta: Any          # final 1/2||r||^2
    iter: Any
    converged: Any
    status: Any


def filtrane_solve(constraints: Callable, x0, c_l, c_u,
                   x_l=None, x_u=None,
                   ctl: FiltraneControl = FiltraneControl()) -> FiltraneInfo:
    """Find a feasible point of c_l <= c(x) <= c_u (+ optional bounds on
    x, enforced by projection)."""
    x = jnp.asarray(x0)
    dt = x.dtype
    n = x.shape[-1]
    c_l = jnp.asarray(c_l, dt)
    c_u = jnp.asarray(c_u, dt)
    lo = jnp.asarray(x_l, dt) if x_l is not None else jnp.full(
        n, -2 * ctl.infinity, dt)
    hi = jnp.asarray(x_u, dt) if x_u is not None else jnp.full(
        n, 2 * ctl.infinity, dt)

    def viol(xv):
        c = constraints(xv)
        return c - jnp.clip(c, c_l, c_u)

    def theta2(xv):
        r = viol(xv)
        return 0.5 * jnp.sum(r * r)

    @jax.jit
    def gn_step(xv, radius):
        r = viol(xv)
        J = jax.jacfwd(viol)(xv)
        H = J.T @ J
        g = J.T @ r
        tr = trs_solve(H, g, radius)
        s = tr.x
        pred = -tr.obj
        return s, pred

    filt = filter_init(ctl.filter_capacity, dt)
    radius = float(ctl.initial_radius)
    status = int(Status.MAX_ITERATIONS)
    it = 0
    th2 = float(theta2(x))
    for it in range(1, ctl.maxit + 1):
        if th2 <= ctl.stop_c:
            status = int(Status.OK)
            break
        s, pred = gn_step(x, radius)
        x_trial = jnp.clip(x + s, lo, hi)
        th2_t = float(theta2(x_trial))
        r_t = viol(x_trial)
        thinf_t = float(jnp.max(jnp.abs(r_t), initial=0.0))
        ared = th2 - th2_t
        ratio = ared / max(float(pred), 1e-300)
        ok_ratio = ratio >= ctl.eta_successful and float(pred) > 0
        ok_filter = bool(filter_acceptable(filt, thinf_t, th2_t,
                                           ctl.gamma_filter)) and th2_t < th2
        if ok_ratio or ok_filter:
            if not ok_ratio:
                # filter-only acceptance: record the OLD point in the
                # filter (standard filter bookkeeping)
                r_old = viol(x)
                filt = filter_add(
                    filt, float(jnp.max(jnp.abs(r_old), initial=0.0)), th2
                )
            x = x_trial
            th2 = th2_t
            radius = min(radius * 2.0, 1e10) if ratio > 0.9 else radius
        else:
            radius = max(radius * 0.25, 1e-12)
    else:
        it = ctl.maxit
    if th2 <= ctl.stop_c:
        status = int(Status.OK)

    return FiltraneInfo(
        x=x, theta=jnp.asarray(th2, dt), iter=jnp.array(it, jnp.int32),
        converged=jnp.array(status == int(Status.OK)),
        status=jnp.array(status, jnp.int32),
    )
