"""Problem scalings (SCALE equivalent).

TPU-native re-design of GALAHAD's SCALE (reference src/scale/scale.f90:
SCALE_get/apply/recover :397+, methods :585-591: Curtis-Reid sym/unsym,
Sinkhorn-Knopp equilibration, norm-based).  All methods are fixed-sweep
jittable iterations on dense |A| / |H|; applying a scaling is elementwise
multiply (fused by XLA), and recovery maps solutions back exactly.

Scaled problem (row scale r, column scale c):
    A~ = diag(r) A diag(c),  H~ = diag(c) H diag(c),  g~ = c*g,
    bounds x~ = x/c, constraint bounds scaled by r.
Solution recovery: x = c*x~, y = r*y~, z = z~/c.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP


@control_dc
class ScaleControl:
    method: str = "sinkhorn"     # "sinkhorn" | "norm" | "curtis_reid"
    sweeps: int = 10
    infinity: float = INFINITY


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["row", "col"],
    meta_fields=[],
)
@dataclasses.dataclass
class Scaling:
    row: Any     # (m,) constraint scale factors
    col: Any     # (n,) variable scale factors


def scale_get(qp: QP, ctl: ScaleControl = ScaleControl()) -> Scaling:
    """Compute scale factors from the problem data."""
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    A = jnp.abs(qp.A) if m > 0 else jnp.zeros((0, n), dt)
    Habs = jnp.abs(qp.H_dense())

    if ctl.method == "norm":
        r = 1.0 / jnp.sqrt(jnp.maximum(jnp.max(A, axis=1), 1e-10)) \
            if m > 0 else jnp.ones((0,), dt)
        colmax = jnp.maximum(
            jnp.max(A, axis=0, initial=0.0) if m > 0 else 0.0,
            jnp.max(Habs, axis=0, initial=0.0),
        )
        c = 1.0 / jnp.sqrt(jnp.maximum(colmax, 1e-10))
        return Scaling(row=r, col=c)

    if ctl.method == "curtis_reid":
        # least-squares log scaling: minimize sum (log|a_ij| + p_i + q_j)^2
        # over nonzeros; solved by a fixed number of Jacobi sweeps on the
        # normal equations (the reference's MC29-style algorithm).
        mask = A > 0
        logA = jnp.where(mask, jnp.log(jnp.maximum(A, 1e-30)), 0.0)
        cnt_r = jnp.maximum(jnp.sum(mask, axis=1), 1)
        cnt_c = jnp.maximum(jnp.sum(mask, axis=0), 1)

        def body(i, pq):
            p, q = pq
            p = -(jnp.sum(logA + jnp.where(mask, q[None, :], 0.0), axis=1)
                  ) / cnt_r
            q = -(jnp.sum(logA + jnp.where(mask, p[:, None], 0.0), axis=0)
                  ) / cnt_c
            return p, q

        p0 = jnp.zeros((m,), dt)
        q0 = jnp.zeros((n,), dt)
        p, q = lax.fori_loop(0, ctl.sweeps, body, (p0, q0))
        return Scaling(row=jnp.exp(p), col=jnp.exp(q))

    # sinkhorn: Ruiz-style alternating equilibration of row and column
    # inf-norms of the stacked [A; H] operator (each sweep divides the
    # current scaled matrix's row/col norms by their square roots;
    # converges to unit norms)
    def body(i, rc):
        r, c = rc
        if m > 0:
            M = A * r[:, None] * c[None, :]
            r = r / jnp.sqrt(jnp.maximum(jnp.max(M, axis=1), 1e-10))
        M = A * r[:, None] * c[None, :] if m > 0 else None
        Hs = Habs * c[None, :] * c[:, None]
        colmax = jnp.maximum(
            jnp.max(M, axis=0, initial=0.0) if m > 0 else 0.0,
            jnp.max(Hs, axis=0, initial=0.0),
        )
        c = c / jnp.sqrt(jnp.maximum(colmax, 1e-10))
        return r, c

    r0 = jnp.ones((m,), dt)
    c0 = jnp.ones((n,), dt)
    r, c = lax.fori_loop(0, ctl.sweeps, body, (r0, c0))
    return Scaling(row=r, col=c)


def scale_apply(qp: QP, s: Scaling,
                infinity: float = INFINITY) -> QP:
    """Return the scaled problem (SCALE_apply equivalent).  Infinite
    bounds stay infinite."""
    r, c = s.row, s.col
    m = qp.m

    def sb(v, f):       # scale bound, preserving +-inf markers
        return jnp.where(jnp.abs(v) >= infinity, v, v * f)

    H = qp.H_dense() * c[None, :] * c[:, None]
    g = qp.g * c
    A = (qp.A * r[:, None] * c[None, :]) if m > 0 else qp.A
    return dataclasses.replace(
        qp,
        H=H, h_kind="dense", g=g, A=A,
        c_l=sb(qp.c_l, r) if m > 0 else qp.c_l,
        c_u=sb(qp.c_u, r) if m > 0 else qp.c_u,
        x_l=sb(qp.x_l, 1.0 / c),
        x_u=sb(qp.x_u, 1.0 / c),
        x=qp.x / c if qp.x is not None else None,
        y=qp.y / r if (qp.y is not None and m > 0) else qp.y,
        z=qp.z * c if qp.z is not None else None,
    )


def scale_recover(s: Scaling, x, y=None, z=None):
    """Map a solution of the scaled problem back (SCALE_recover)."""
    out = [x * s.col]
    if y is not None:
        out.append(y * s.row)
    if z is not None:
        out.append(z / s.col)
    return tuple(out) if len(out) > 1 else out[0]
