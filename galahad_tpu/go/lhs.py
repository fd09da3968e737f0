"""Latin hypercube sampling.

TPU-native equivalent of GALAHAD's LHS (reference src/lhs/lhs.f90,
used by BGO for multistart seeding).  jax.random-based (reproducible
streams replace RAND, src/rand/rand.f90:22-33).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def lhs_sample(key, npoints: int, dims: int, dtype=jnp.float64):
    """npoints x dims Latin hypercube on [0, 1]^dims: one sample per
    stratum per dimension, strata independently permuted."""
    k1, k2 = jax.random.split(key)
    u = jax.random.uniform(k1, (npoints, dims), dtype=dtype)
    # independent stratum permutation per dimension
    perms = jax.vmap(
        lambda k: jax.random.permutation(k, npoints)
    )(jax.random.split(k2, dims)).T                     # (npoints, dims)
    return (perms.astype(dtype) + u) / npoints


def lhs_sample_box(key, npoints: int, x_l, x_u):
    """Latin hypercube over the box [x_l, x_u]."""
    x_l = jnp.asarray(x_l)
    x_u = jnp.asarray(x_u)
    u = lhs_sample(key, npoints, x_l.shape[-1], x_l.dtype)
    return x_l + u * (x_u - x_l)
