"""Dense secant Hessian updates (BFGS / SR1) with Powell damping.

TPU-native equivalent of GALAHAD's SEC (reference src/sec/sec.f90:
SEC_bfgs_update :309, SEC_sr1_update :412).  Pure functions on dense
(n, n) matrices — rank-one/two updates are outer products, trivially
batched and fused by XLA.
"""
from __future__ import annotations

import jax.numpy as jnp


def sec_initial(n, scale=1.0, dtype=jnp.float64):
    return scale * jnp.eye(n, dtype=dtype)


def bfgs_update(B, s, y, damping: float = 0.2):
    """Powell-damped BFGS update of B (reference sec.f90:309: the damped
    form guarantees positive definiteness with eta = damping)."""
    Bs = B @ s
    sBs = jnp.dot(s, Bs)
    sty = jnp.dot(s, y)
    theta = jnp.where(
        sty >= damping * sBs,
        1.0,
        (1.0 - damping) * sBs / jnp.maximum(sBs - sty, jnp.finfo(B.dtype).tiny),
    )
    yb = theta * y + (1.0 - theta) * Bs
    styb = jnp.dot(s, yb)
    return (
        B
        - jnp.outer(Bs, Bs) / jnp.maximum(sBs, jnp.finfo(B.dtype).tiny)
        + jnp.outer(yb, yb) / jnp.maximum(styb, jnp.finfo(B.dtype).tiny)
    )


def sr1_update(B, s, y, skip_tol: float = 1.0e-8):
    """SR1 update with the standard skip safeguard
    (reference sec.f90:412): skip when |(y - Bs)'s| is tiny."""
    r = y - B @ s
    rs = jnp.dot(r, s)
    denom_ok = jnp.abs(rs) > skip_tol * jnp.linalg.norm(r) * jnp.linalg.norm(s)
    upd = jnp.outer(r, r) / jnp.where(denom_ok, rs, 1.0)
    return jnp.where(denom_ok, B + upd, B)
