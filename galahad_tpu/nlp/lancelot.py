"""Augmented-Lagrangian solver for generally-constrained NLP
(LANCELOT-class).

TPU-native re-design of GALAHAD's LANCELOT B (reference
src/lancelot/lancelot.f90: LANCELOT_solve :499 — augmented Lagrangian
outer iteration with bound-constrained trust-region inner solves; the
reference's group-partial-separability machinery exists to make sparse
Hessian assembly cheap, which jax autodiff + XLA fusion make unnecessary
here).

Problem:   min f(x)   s.t.  c_l <= c(x) <= c_u,  x_l <= x <= x_u

Method (Conn-Gould-Toint, the LANCELOT algorithm):
  outer k: minimize the Rockafellar shifted augmented Lagrangian
      Phi(x; y, mu) = f(x) + 1/(2 mu) ( ||w(x) - s(x)||^2 - mu^2||y||^2 ),
      w(x) = c(x) + mu y,   s(x) = clip(w(x), c_l, c_u)
  over the box with TRB (nlp/tru.py);
  then: if infeasibility <= eta_k  ->  first-order multiplier update
      y <- (w - s)/mu  and tighten (omega_k, eta_k);
  else -> decrease mu.  (The classical dual-update/penalty-update fork,
  lancelot.f90 main loop.)

The inner solve is one compiled while_loop; the outer loop runs on the
host with early exit (iteration counts are small and data-dependent).
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
from .tru import TRBControl, trb_solve


@control_dc
class LancelotControl:
    maxit: int = 30                   # outer iterations
    initial_mu: float = 0.1
    mu_decrease: float = 0.1          # tau in the penalty fork
    stop_c: float = 1.0e-6            # final infeasibility tolerance
    stop_g: float = 1.0e-6            # final projected-gradient tolerance
    inner_maxit: int = 200
    inner_model: str = "auto"         # "auto" | "newton" | "hvp":
    # "newton" materializes the dense AL Hessian (small n); "hvp" is the
    # matrix-free large-n path (curvature via jvp-of-grad + masked GLTR
    # — the role of the reference's group-partial-separable Hessian
    # assembly, lancelot.f90/SURVEY §3.3); "auto" switches on n.
    hvp_threshold: int = 256          # auto: use "hvp" when n exceeds this
    infinity: float = INFINITY


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "f", "infeas", "norm_pg", "mu", "iter",
                 "converged", "status"],
    meta_fields=[],
)
@dataclasses.dataclass
class LancelotInfo:
    x: Any
    y: Any
    f: Any
    infeas: Any
    norm_pg: Any
    mu: Any
    iter: Any
    converged: Any
    status: Any


def lancelot_solve(objective: Callable, constraints: Callable, x0,
                   c_l, c_u, x_l=None, x_u=None,
                   ctl: LancelotControl = LancelotControl()) -> LancelotInfo:
    """Minimize objective subject to c_l <= constraints(x) <= c_u and
    optional bounds.  Both callables must be jax-traceable."""
    x = jnp.asarray(x0)
    dt = x.dtype
    n = x.shape[-1]
    c_l = jnp.asarray(c_l, dt)
    c_u = jnp.asarray(c_u, dt)
    if x_l is None:
        x_l = jnp.full(n, -2 * ctl.infinity, dt)
    if x_u is None:
        x_u = jnp.full(n, 2 * ctl.infinity, dt)
    x_l = jnp.asarray(x_l, dt)
    x_u = jnp.asarray(x_u, dt)

    m = jnp.asarray(constraints(x)).shape[-1]
    y = jnp.zeros(m, dt)
    mu = float(ctl.initial_mu)

    def infeasibility(x):
        c = constraints(x)
        return jnp.linalg.norm(c - jnp.clip(c, c_l, c_u))

    # LANCELOT's classic tolerance schedules
    omega = 1.0 / mu ** 0.1 if mu < 1 else 0.1   # inner grad tol
    eta = mu ** 0.1

    status = int(Status.MAX_ITERATIONS)
    it = 0
    omega_k = max(omega, ctl.stop_g)
    eta_k = max(eta, ctl.stop_c)
    for it in range(1, ctl.maxit + 1):
        def phi(xv, y=y, mu=mu):
            w = constraints(xv) + mu * y
            s = jnp.clip(w, c_l, c_u)
            return objective(xv) + (jnp.sum((w - s) ** 2)
                                    - mu**2 * jnp.sum(y**2)) / (2.0 * mu)

        inner_model = ctl.inner_model
        if inner_model == "auto":
            inner_model = "hvp" if n > ctl.hvp_threshold else "newton"
        st = trb_solve(
            phi, x, x_l, x_u,
            TRBControl(maxit=ctl.inner_maxit, model=inner_model,
                       stop_g_absolute=float(omega_k), stop_g_relative=0.0),
        )
        x = st.x
        w = constraints(x) + mu * y
        s = jnp.clip(w, c_l, c_u)
        viol = float(infeasibility(x))

        if viol <= eta_k:
            y = (w - s) / mu                      # first-order update
            if viol <= ctl.stop_c and float(st.norm_g) <= ctl.stop_g:
                status = int(Status.OK)
                break
            eta_k = max(eta_k * mu ** 0.9, ctl.stop_c)
            omega_k = max(omega_k * mu, ctl.stop_g)
        else:
            mu = mu * ctl.mu_decrease
            eta_k = max(mu ** 0.1, ctl.stop_c)
            omega_k = max(mu, ctl.stop_g)

    return LancelotInfo(
        x=x, y=y, f=objective(x), infeas=infeasibility(x),
        norm_pg=st.norm_g, mu=jnp.asarray(mu, dt),
        iter=jnp.array(it, jnp.int32),
        converged=jnp.array(status == int(Status.OK)),
        status=jnp.array(status, jnp.int32),
    )
