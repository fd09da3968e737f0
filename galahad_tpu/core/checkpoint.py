"""Convergence-history checkpointing: first iteration/time at which the
residual drops below 10^-i, i = 1..16.

TPU-native re-design of GALAHAD's CHECKPOINT package (reference
src/checkpoint/checkpoint.f90:37-62, wired into CQP inform at
cqp.f90:566-567).  This is instrumentation, not state saving — the
state-saving analogue in this framework is that every solver state is a
pytree (orbax/pickle-serializable by construction).

The record is a fixed-shape pytree so it lives inside jitted loops:
``checkpoint_update`` is pure and runs under lax.while_loop.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

NLEVELS = 16


class Checkpoints(NamedTuple):
    """checkpointsIter[i] / checkpointsTime[i]: first iteration / wall
    time with residual <= 10^{-(i+1)}; -1 / inf if never attained
    (mirrors inform%checkpointsIter/Time, checkpoint.f90:37-62)."""
    iters: jnp.ndarray   # (16,) int32
    times: jnp.ndarray   # (16,) float


def checkpoint_init(dtype=jnp.float64) -> Checkpoints:
    from .problem import canonical_dtype

    dtype = canonical_dtype(dtype)
    return Checkpoints(
        iters=jnp.full((NLEVELS,), -1, jnp.int32),
        times=jnp.full((NLEVELS,), jnp.inf, dtype),
    )


def checkpoint_update(cp: Checkpoints, residual, iteration,
                      time=0.0) -> Checkpoints:
    """Record thresholds newly crossed by ``residual`` (pure, jittable)."""
    residual = jnp.asarray(residual)
    levels = 10.0 ** (-jnp.arange(1, NLEVELS + 1, dtype=cp.times.dtype))
    attained = residual <= levels
    fresh = attained & (cp.iters < 0)
    return Checkpoints(
        iters=jnp.where(fresh, jnp.asarray(iteration, jnp.int32), cp.iters),
        times=jnp.where(fresh, jnp.asarray(time, cp.times.dtype), cp.times),
    )
