"""Deterministic global optimization in a box (DGO).

TPU-native re-design of GALAHAD's DGO (reference src/dgo/dgo.f90:
DGO_solve :807: deterministic branch-and-refine with Lipschitz lower
bounds).  Implementation: DIRECT-style box trisection with an adaptive
Lipschitz estimate — fixed-capacity box arrays under lax.fori_loop (the
reference grows a dictionary/hash of boxes, src/hash), one box split
(two new evaluations) per iteration, finished by a projected TR polish
from the best center.  Batched evaluation of all candidate centers per
sweep is the TPU win.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from ..nlp.tru import TRBControl, trb_solve


@control_dc
class DGOControl:
    maxit: int = 100                   # number of box splits
    lipschitz_inflation: float = 2.0
    maxit_local: int = 50
    stop_g_absolute: float = 1.0e-6


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "f", "norm_pg", "boxes"],
    meta_fields=[],
)
@dataclasses.dataclass
class DGOInfo:
    x: Any
    f: Any
    norm_pg: Any
    boxes: Any


def dgo_solve(objective: Callable, x_l, x_u,
              ctl: DGOControl = DGOControl()) -> DGOInfo:
    """Deterministic global minimization on [x_l, x_u]."""
    x_l = jnp.asarray(x_l)
    dt = x_l.dtype
    x_u = jnp.asarray(x_u, dt)
    n = x_l.shape[-1]
    cap = 1 + 2 * ctl.maxit

    C0 = jnp.zeros((cap, n), dt).at[0].set(0.5 * (x_l + x_u))
    W0 = jnp.zeros((cap, n), dt).at[0].set(0.5 * (x_u - x_l))
    F0 = jnp.full((cap,), jnp.inf, dt).at[0].set(
        objective(0.5 * (x_l + x_u)))
    valid0 = jnp.zeros((cap,), bool).at[0].set(True)

    def body(i, carry):
        C, W, F, valid = carry
        k = 1 + 2 * i                       # boxes so far
        # adaptive Lipschitz estimate from center spread
        fbest = jnp.min(jnp.where(valid, F, jnp.inf))
        r = jnp.linalg.norm(jnp.where(valid[:, None], W, 0.0), axis=1)
        L = ctl.lipschitz_inflation * jnp.max(
            jnp.where(valid & (r > 1e-14), (F - fbest) / jnp.maximum(r, 1e-14),
                      0.0)
        ) + 1e-8
        # select the box with the smallest Lipschitz lower bound
        lb = jnp.where(valid, F - L * r, jnp.inf)
        j = jnp.argmin(lb)
        # trisect along the longest dimension
        d = jnp.argmax(W[j])
        wj = W[j]
        e = jax.nn.one_hot(d, n, dtype=dt)
        shift = (2.0 / 3.0) * wj[d] * e
        c_minus = C[j] - shift
        c_plus = C[j] + shift
        w_new = wj - (2.0 / 3.0) * wj[d] * e
        C = C.at[j].set(C[j]).at[k].set(c_minus).at[k + 1].set(c_plus)
        W = W.at[j].set(w_new).at[k].set(w_new).at[k + 1].set(w_new)
        F = F.at[k].set(objective(c_minus)).at[k + 1].set(objective(c_plus))
        valid = valid.at[k].set(True).at[k + 1].set(True)
        return C, W, F, valid

    C, W, F, valid = lax.fori_loop(0, ctl.maxit, body, (C0, W0, F0, valid0))
    ibest = jnp.argmin(jnp.where(valid, F, jnp.inf))

    st = trb_solve(objective, C[ibest], x_l, x_u,
                   TRBControl(maxit=ctl.maxit_local,
                              stop_g_absolute=ctl.stop_g_absolute))
    better = st.f <= F[ibest]
    return DGOInfo(
        x=jnp.where(better, st.x, C[ibest]),
        f=jnp.where(better, st.f, F[ibest]),
        norm_pg=st.norm_g,
        boxes=jnp.sum(valid),
    )
