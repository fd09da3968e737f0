"""Reformulate a QP as an l1-penalty QP (elastic form).

TPU-native re-design of GALAHAD's LPQP (reference src/lpqp/lpqp.f90 —
builds the explicit l1QP min q(x) + rho ||violation||_1 that QPA/L1QP
consume).  The elastic construction: each general constraint row gets
nonnegative elastics (u, v) with
    c_l - u <= A x - (u - v)... (reference keeps one-sided splitting)
Here:   min 1/2 x'Hx + g'x + rho * 1'(u + v)
        s.t. c_l <= A x + u - v <= c_u,  u, v >= 0, bounds on x kept.
Violations are absorbed by u/v at linear cost rho, so the reformulated
problem is always feasible — the exact-penalty property the reference
relies on (lpqp.f90 header).

The output is a plain QP pytree over the extended variable
w = [x; u; v], solvable by any solver in the family; ``lpqp_restore``
maps a solution back.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.problem import INFINITY, QP


def lpqp_formulate(qp: QP, rho: float, infinity: float = INFINITY) -> QP:
    """Build the elastic l1-QP over w = [x; u; v] (LPQP_formulate)."""
    n, m = qp.n, qp.m
    dt = qp.g.dtype
    if m == 0:
        return qp
    H = qp.H_dense()
    Hw = jnp.zeros((n + 2 * m, n + 2 * m), dt).at[:n, :n].set(H)
    gw = jnp.concatenate([qp.g, jnp.full(2 * m, rho, dt)])
    Aw = jnp.concatenate([qp.A, jnp.eye(m, dtype=dt), -jnp.eye(m, dtype=dt)],
                         axis=1)
    big = jnp.asarray(2 * infinity, dt)
    x_l = jnp.concatenate([qp.x_l, jnp.zeros(2 * m, dt)])
    x_u = jnp.concatenate([qp.x_u, jnp.full(2 * m, big, dt)])
    x0 = qp.x if qp.x is not None else jnp.zeros(n, dt)
    w0 = jnp.concatenate([x0, jnp.zeros(2 * m, dt)])
    return QP(H=Hw, g=gw, A=Aw, c_l=qp.c_l, c_u=qp.c_u,
              x_l=x_l, x_u=x_u, f=qp.f, x=w0,
              name=(qp.name + "_l1") if qp.name else "", h_kind="dense")


def lpqp_restore(qp: QP, w, y=None, zw=None):
    """Extract (x, u, v) and original-space duals from the elastic
    solution (LPQP_restore)."""
    n, m = qp.n, qp.m
    x = w[:n]
    u = w[n:n + m]
    v = w[n + m:n + 2 * m]
    z = zw[:n] if zw is not None else None
    return x, u, v, y, z


def lpqp_violation(qp: QP, w):
    """l1 constraint violation absorbed by the elastics."""
    n, m = qp.n, qp.m
    return jnp.sum(w[n:n + 2 * m])
