"""Stochastic multistart global optimization in a box (BGO).

TPU-native re-design of GALAHAD's BGO (reference src/bgo/bgo.f90:
BGO_solve :653: random multistart + TRB local minimization).  The
reference runs starts sequentially; here ALL starts minimize
simultaneously — Latin-hypercube seeds vmapped through the fully
compiled projected trust-region solver (nlp/tru.trb_solve), the batch
axis shardable over a device mesh (parallel/mesh.py).  This is the
thousands-of-subproblems headline pattern of SURVEY §5.7.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from ..nlp.tru import TRBControl, trb_solve
from .lhs import lhs_sample_box


@control_dc
class BGOControl:
    attempts: int = 16              # multistart batch size
    maxit_local: int = 100
    stop_g_absolute: float = 1.0e-6
    random_seed: int = 0
    include_given_start: bool = True


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "f", "norm_pg", "starts_converged"],
    meta_fields=[],
)
@dataclasses.dataclass
class BGOInfo:
    x: Any
    f: Any
    norm_pg: Any
    starts_converged: Any


def bgo_solve(objective: Callable, x_l, x_u, x0=None,
              ctl: BGOControl = BGOControl()) -> BGOInfo:
    """Approximate global minimum of objective on [x_l, x_u]."""
    x_l = jnp.asarray(x_l)
    x_u = jnp.asarray(x_u, x_l.dtype)
    key = jax.random.PRNGKey(ctl.random_seed)
    starts = lhs_sample_box(key, ctl.attempts, x_l, x_u)
    if x0 is not None and ctl.include_given_start:
        starts = starts.at[0].set(jnp.clip(jnp.asarray(x0, x_l.dtype),
                                           x_l, x_u))

    local_ctl = TRBControl(maxit=ctl.maxit_local,
                           stop_g_absolute=ctl.stop_g_absolute)

    def local(x_start):
        return trb_solve(objective, x_start, x_l, x_u, local_ctl)

    sts = jax.vmap(local)(starts)
    ibest = jnp.argmin(sts.f)
    return BGOInfo(
        x=sts.x[ibest], f=sts.f[ibest], norm_pg=sts.norm_g[ibest],
        starts_converged=jnp.sum(sts.converged),
    )
