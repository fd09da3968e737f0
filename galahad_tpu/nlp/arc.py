"""Adaptive cubic regularization (ARC) for unconstrained minimization.

TPU-native re-design of GALAHAD's ARC (reference src/arc/arc.f90:
ARC_solve :1111; subproblems via RQS direct or GLRT iterative;
weight-update logic in the main loop).  Same jax design as nlp/tru.py:
the solve is one lax.while_loop, subproblems are the batched
eigen-secular RQS (tr/trs.py) or Krylov GLRT (tr/gltr.py).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from ..core.status import Status
from ..tr.gltr import GLRTControl, glrt_solve
from ..tr.trs import rqs_solve
from .tru import TRUState, _hvp


@control_dc
class ARCControl:
    """Mirrors ARC_control_type defaults where meaningful
    (reference src/arc/arc.f90 controls)."""

    maxit: int = 100
    initial_weight: float = 1.0       # sigma_0 (regularization weight)
    minimum_weight: float = 1.0e-16
    stop_g_absolute: float = 1.0e-5
    stop_g_relative: float = 1.0e-8
    eta_successful: float = 1.0e-2
    eta_very_successful: float = 0.9
    weight_decrease: float = 0.5      # gamma on very successful
    weight_increase: float = 2.0      # gamma on failure
    power: float = 3.0                # p in (sigma/p)||s||^p
    subproblem_direct: bool = True
    glrt_itmax: int = 64


def arc_solve(objective: Callable, x0, ctl: ARCControl = ARCControl()):
    """Minimize a smooth objective by adaptive cubic regularization.
    Fully jittable; returns TRUState (radius field carries sigma)."""
    x0 = jnp.asarray(x0)
    dt = x0.dtype
    p = ctl.power

    f0, g0 = jax.value_and_grad(objective)(x0)
    ng0 = jnp.linalg.norm(g0)
    stop_g = jnp.maximum(ctl.stop_g_absolute, ctl.stop_g_relative * ng0)

    st0 = TRUState(
        x=x0, f=f0, g=g0,
        radius=jnp.asarray(ctl.initial_weight, dt),   # sigma
        iter=jnp.array(0, jnp.int32),
        converged=ng0 <= stop_g,
        status=jnp.where(ng0 <= stop_g, int(Status.OK),
                         int(Status.MAX_ITERATIONS)).astype(jnp.int32),
        norm_g=ng0,
    )

    def cond(st):
        return (~st.converged) & (st.iter < ctl.maxit)

    def body(st):
        sigma = st.radius
        if ctl.subproblem_direct:
            H = jax.hessian(objective)(st.x)
            sub = rqs_solve(H, st.g, sigma, p=p)
        else:
            sub = glrt_solve(_hvp(objective, st.x), st.g, sigma, p=p,
                             ctl=GLRTControl(itmax=ctl.glrt_itmax))
        s = sub.x
        f_trial = objective(st.x + s)
        # predicted decrease uses the *model without* the regularizer
        # (reference arc.f90 ratio definition)
        pred = -(sub.obj - (sigma / p) * sub.norm_x**p)
        tiny = jnp.finfo(dt).tiny
        ratio = (st.f - f_trial) / jnp.maximum(pred, tiny)
        success = ratio >= ctl.eta_successful
        very = ratio >= ctl.eta_very_successful

        x = jnp.where(success, st.x + s, st.x)
        f = jnp.where(success, f_trial, st.f)
        g = jnp.where(success, jax.grad(objective)(x), st.g)
        sigma = jnp.where(
            very,
            jnp.maximum(ctl.minimum_weight, ctl.weight_decrease * sigma),
            jnp.where(success, sigma, ctl.weight_increase * sigma),
        )
        ng = jnp.linalg.norm(g)
        conv = ng <= stop_g
        return TRUState(
            x=x, f=f, g=g, radius=sigma, iter=st.iter + 1,
            converged=conv,
            status=jnp.where(conv, int(Status.OK),
                             int(Status.MAX_ITERATIONS)).astype(jnp.int32),
            norm_g=ng,
        )

    return lax.while_loop(cond, body, st0)
