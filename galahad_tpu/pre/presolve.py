"""QP presolver (pragmatic subset).

TPU-native re-design of GALAHAD's PRESOLVE (reference
src/presolve/presolve.f90: PRESOLVE_apply :2836, analyze :4017 —
a 22k-line engine of redundancy elimination, bound tightening, variable
fixing and dual tests with exact solution restoration).

The subset implemented here keeps every transform *shape-preserving*
(masking, never deletion — SURVEY §7.3), which makes restoration exact
and trivial and keeps one compiled program valid across presolve
outcomes:

  * interval bound tightening from constraint activity ranges
    (the reference's primal constraint analysis), iterated `sweeps` times;
  * forcing-constraint detection -> variables fixed at bounds;
  * free-row detection (activity range inside [c_l, c_u] -> row vacuous);
  * infeasibility detection (empty primal interval).

Returns the transformed QP (same shapes) plus a report.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP


@control_dc
class PresolveControl:
    sweeps: int = 3
    infinity: float = INFINITY
    feas_tol: float = 1.0e-9


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qp", "infeasible", "n_tightened", "n_forced_rows"],
    meta_fields=[],
)
@dataclasses.dataclass
class PresolveInfo:
    qp: Any
    infeasible: Any
    n_tightened: Any
    n_forced_rows: Any


def presolve_apply(qp: QP, ctl: PresolveControl = PresolveControl()
                   ) -> PresolveInfo:
    inf = ctl.infinity
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    big = jnp.asarray(2.0 * inf, dt)

    x_l0 = jnp.where(qp.x_l > -inf, qp.x_l, -big)
    x_u0 = jnp.where(qp.x_u < inf, qp.x_u, big)

    if m == 0:
        infeas = jnp.any(x_l0 > x_u0 + ctl.feas_tol)
        return PresolveInfo(
            qp=qp, infeasible=infeas,
            n_tightened=jnp.array(0, jnp.int32),
            n_forced_rows=jnp.array(0, jnp.int32),
        )

    A = qp.A
    Ap = jnp.maximum(A, 0.0)
    An = jnp.minimum(A, 0.0)
    c_l = jnp.where(qp.c_l > -inf, qp.c_l, -big)
    c_u = jnp.where(qp.c_u < inf, qp.c_u, big)

    def clampinf(v):
        return jnp.clip(v, -big, big)

    def sweep(i, carry):
        x_l, x_u, tightened = carry
        # activity range of each row given current bounds
        act_lo = clampinf(Ap @ x_l + An @ x_u)
        act_hi = clampinf(Ap @ x_u + An @ x_l)
        # implied bound on x_j from row i:
        #   a_ij x_j in [c_l_i - (act_hi_i - contrib_hi), ...]
        # contribution of j at the extremes:
        lo_wo = act_lo[:, None] - jnp.where(A > 0, A * x_l[None, :],
                                            A * x_u[None, :])
        hi_wo = act_hi[:, None] - jnp.where(A > 0, A * x_u[None, :],
                                            A * x_l[None, :])
        # a_ij x_j >= c_l_i - hi_wo  and  a_ij x_j <= c_u_i - lo_wo
        lhs = c_l[:, None] - hi_wo
        rhs = c_u[:, None] - lo_wo
        pos = A > 0
        neg = A < 0
        new_lo = jnp.where(pos, lhs / jnp.where(pos, A, 1.0), -big)
        new_lo = jnp.where(neg, rhs / jnp.where(neg, A, 1.0), new_lo)
        new_hi = jnp.where(pos, rhs / jnp.where(pos, A, 1.0), big)
        new_hi = jnp.where(neg, lhs / jnp.where(neg, A, 1.0), new_hi)
        # only rows with finite relevant data tighten
        new_lo = jnp.where(jnp.abs(new_lo) < inf, new_lo, -big)
        new_hi = jnp.where(jnp.abs(new_hi) < inf, new_hi, big)
        cand_lo = jnp.max(new_lo, axis=0)
        cand_hi = jnp.min(new_hi, axis=0)
        x_l_new = jnp.maximum(x_l, cand_lo)
        x_u_new = jnp.minimum(x_u, cand_hi)
        tightened = tightened + jnp.sum(
            (x_l_new > x_l + 1e-12) | (x_u_new < x_u - 1e-12)
        ).astype(jnp.int32)
        return x_l_new, x_u_new, tightened

    x_l, x_u, n_tight = lax.fori_loop(
        0, ctl.sweeps, sweep, (x_l0, x_u0, jnp.array(0, jnp.int32))
    )

    act_lo = clampinf(Ap @ x_l + An @ x_u)
    act_hi = clampinf(Ap @ x_u + An @ x_l)
    # forcing rows: activity range degenerate against a bound -> every
    # variable in the row is forced to the extreme that attains it
    force_lo = act_hi <= c_l + ctl.feas_tol   # must sit at act_hi
    force_hi = act_lo >= c_u - ctl.feas_tol   # must sit at act_lo
    n_forced = jnp.sum(force_lo | force_hi)

    def apply_forcing(x_l, x_u):
        # row forces x_j to x_u_j where a_ij > 0 (for force_lo), etc.
        fl = force_lo[:, None] & (A != 0)
        fh = force_hi[:, None] & (A != 0)
        to_hi = jnp.any(fl & (A > 0), axis=0) | jnp.any(fh & (A < 0), axis=0)
        to_lo = jnp.any(fl & (A < 0), axis=0) | jnp.any(fh & (A > 0), axis=0)
        x_l = jnp.where(to_hi, x_u, x_l)
        x_u = jnp.where(to_lo, x_l, x_u)
        return x_l, x_u

    x_l, x_u = apply_forcing(x_l, x_u)

    # vacuous rows: activity range within [c_l, c_u] -> relax to free
    vacuous = (act_lo >= c_l - ctl.feas_tol) & (act_hi <= c_u + ctl.feas_tol)
    c_l_new = jnp.where(vacuous, -big, qp.c_l)
    c_u_new = jnp.where(vacuous, big, qp.c_u)

    infeasible = (
        jnp.any(x_l > x_u + ctl.feas_tol)
        | jnp.any(act_lo > c_u + ctl.feas_tol)
        | jnp.any(act_hi < c_l - ctl.feas_tol)
    )

    qp_out = dataclasses.replace(
        qp,
        x_l=jnp.where(jnp.abs(x_l) < inf, x_l, qp.x_l),
        x_u=jnp.where(jnp.abs(x_u) < inf, x_u, qp.x_u),
        c_l=c_l_new, c_u=c_u_new,
    )
    return PresolveInfo(
        qp=qp_out, infeasible=infeasible,
        n_tightened=n_tight, n_forced_rows=n_forced.astype(jnp.int32),
    )
