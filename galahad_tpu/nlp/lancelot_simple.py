"""One-call dense LANCELOT wrapper.

TPU-native equivalent of GALAHAD's lancelot_simple package (reference
src/lancelot_simple/ — a flat, no-derived-types entry point over
LANCELOT B for small dense problems).  Here the simplification is the
call signature: a single function taking plain callables and arrays;
derivatives come from AD, equality constraints are expressed by
c_l == c_u, and the default controls match nlp/lancelot.py.
"""
from __future__ import annotations

from typing import Callable

import jax.numpy as jnp

from .lancelot import LancelotControl, LancelotInfo, lancelot_solve


def lancelot_simple(objective: Callable, x0,
                    constraints: Callable | None = None,
                    c_eq: int = 0, c_le=None,
                    x_l=None, x_u=None,
                    maxit: int = 100) -> LancelotInfo:
    """Minimize ``objective`` with optional constraints.

    constraints(x) returns a vector whose first ``c_eq`` components are
    equalities ( = 0 ) and the rest inequalities ( <= 0 ), the
    lancelot_simple convention; bounds optional.
    """
    x0 = jnp.asarray(x0)
    dt = x0.dtype
    ctl = LancelotControl(maxit=maxit)
    if constraints is None:
        cons = lambda x: jnp.zeros(0, dt)
        c_l = jnp.zeros(0, dt)
        c_u = jnp.zeros(0, dt)
    else:
        m = jnp.asarray(constraints(x0)).shape[-1]
        cons = constraints
        big = jnp.asarray(2 * ctl.infinity, dt)
        c_l = jnp.where(jnp.arange(m) < c_eq, 0.0, -big)
        c_u = jnp.zeros(m, dt)
    return lancelot_solve(objective, cons, x0, c_l, c_u,
                          x_l=x_l, x_u=x_u, ctl=ctl)
