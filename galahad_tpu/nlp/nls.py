"""Nonlinear least squares by adaptive regularization (NLS).

TPU-native re-design of GALAHAD's NLS (reference src/nls/nls.f90:
NLS_solve :1287; model variants :115-123 — Gauss-Newton, Newton,
tensor-Newton; J'J assembly via BSC).  Here:

  min_x  1/2 ||r(x)||^2     for a jax-traceable residual r: R^n -> R^m

  * model="gauss_newton": J via jax.jacfwd, subproblem
        min 1/2||r + J s||^2 + (sigma/p)||s||^p
    solved exactly through the eigen-secular RQS on (J'J, J'r) — the
    BSC-assembled normal-equations path (reference bsc.f90:372) as one
    batched MXU matmul.
  * model="newton": full Hessian J'J + sum_i r_i Hess(r_i) via
    jax.hessian of the scalarized objective.
The driver is the same lax.while_loop regularization loop as nlp/arc.py.
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from ..core.status import Status
from ..tr.trs import rqs_solve
from .tru import TRUState


@control_dc
class NLSControl:
    """Mirrors NLS_control_type defaults where meaningful
    (reference src/nls/nls.f90 controls; model :213-217)."""

    maxit: int = 100
    initial_weight: float = 1.0
    minimum_weight: float = 1.0e-16
    stop_g_absolute: float = 1.0e-6
    stop_g_relative: float = 1.0e-8
    stop_c_absolute: float = 1.0e-12   # stop when ||r||^2 below this
    eta_successful: float = 1.0e-2
    eta_very_successful: float = 0.9
    weight_decrease: float = 0.5
    weight_increase: float = 2.0
    power: float = 3.0
    model: str = "gauss_newton"        # | "newton"


def nls_solve(residual: Callable, x0, ctl: NLSControl = NLSControl()):
    """Minimize 1/2||r(x)||^2.  Fully jittable.  Returns TRUState
    (f = 1/2||r||^2, g = J'r, radius = current weight sigma)."""
    x0 = jnp.asarray(x0)
    dt = x0.dtype
    p = ctl.power

    def obj(x):
        r = residual(x)
        return 0.5 * jnp.sum(r * r)

    r0 = residual(x0)
    J0 = jax.jacfwd(residual)(x0)
    g0 = J0.T @ r0
    ng0 = jnp.linalg.norm(g0)
    stop_g = jnp.maximum(ctl.stop_g_absolute, ctl.stop_g_relative * ng0)

    st0 = TRUState(
        x=x0, f=0.5 * jnp.sum(r0 * r0), g=g0,
        radius=jnp.asarray(ctl.initial_weight, dt),
        iter=jnp.array(0, jnp.int32),
        converged=(ng0 <= stop_g),
        status=jnp.where(ng0 <= stop_g, int(Status.OK),
                         int(Status.MAX_ITERATIONS)).astype(jnp.int32),
        norm_g=ng0,
    )

    def cond(st):
        return (~st.converged) & (st.iter < ctl.maxit)

    def body(st):
        sigma = st.radius
        r = residual(st.x)
        J = jax.jacfwd(residual)(st.x)
        g = J.T @ r
        if ctl.model == "newton":
            H = jax.hessian(obj)(st.x)
        else:  # gauss_newton: H = J'J (normal equations via MXU matmul)
            H = J.T @ J
        sub = rqs_solve(H, g, sigma, p=p)
        s = sub.x
        f_trial = obj(st.x + s)
        pred = -(sub.obj - (sigma / p) * sub.norm_x**p)
        tiny = jnp.finfo(dt).tiny
        ratio = (st.f - f_trial) / jnp.maximum(pred, tiny)
        success = ratio >= ctl.eta_successful
        very = ratio >= ctl.eta_very_successful

        x = jnp.where(success, st.x + s, st.x)
        f = jnp.where(success, f_trial, st.f)
        r_new = residual(x)
        J_new = jax.jacfwd(residual)(x)
        g_new = J_new.T @ r_new
        sigma = jnp.where(
            very,
            jnp.maximum(ctl.minimum_weight, ctl.weight_decrease * sigma),
            jnp.where(success, sigma, ctl.weight_increase * sigma),
        )
        ng = jnp.linalg.norm(g_new)
        conv = (ng <= stop_g) | (f <= ctl.stop_c_absolute)
        return TRUState(
            x=x, f=f, g=g_new, radius=sigma, iter=st.iter + 1,
            converged=conv,
            status=jnp.where(conv, int(Status.OK),
                             int(Status.MAX_ITERATIONS)).astype(jnp.int32),
            norm_g=ng,
        )

    return lax.while_loop(cond, body, st0)
