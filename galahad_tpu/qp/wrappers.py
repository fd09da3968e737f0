"""Thin named-solver wrappers completing the reference's QP/LP menu.

Each corresponds to a whole GALAHAD package that is, mathematically, a
specialization of a solver already in this framework — the reference
keeps them as separate 2-10 kLoC packages for interface reasons; here
they are explicit restrictions:

  * ``lpb_solve``  — LP by primal-dual IPM (reference src/lpb/lpb.f90:
    LPB_solve :1143): the IPM with H == 0.
  * ``dlp_solve``  — LP by dual gradient projection (src/dlp/dlp.f90):
    DQP restricted to a (regularized) LP.
  * ``bqpb_solve`` — bound-constrained QP IPM (src/bqpb/bqpb.f90:
    BQPB_solve :599): the IPM with m == 0.
"""
from __future__ import annotations

import dataclasses

import jax.numpy as jnp

from ..core.problem import QP
from .dqp import DQPControl, dqp_solve
from .ipm import IPMControl, ipm_solve


def lpb_solve(qp: QP, ctl: IPMControl = IPMControl()):
    """LP interior-point solve: forces h_kind='zero' (LPB contract)."""
    lp = dataclasses.replace(qp, H=None, h_kind="zero")
    return ipm_solve(lp, ctl)


def dlp_solve(qp: QP, reg: float = 1.0e-6, ctl: DQPControl = DQPControl()):
    """LP by dual projection.  The dual method needs strictly convex H
    (dqp.f90 requirement); the DLP specialization regularizes the LP
    with (reg/2)||x||^2 — the reference's dlp uses the same proximal
    device internally."""
    n = qp.n
    dt = qp.g.dtype
    reg_qp = dataclasses.replace(
        qp, H=jnp.full((n,), reg, dt), h_kind="diagonal")
    return dqp_solve(reg_qp, ctl=ctl)


def bqpb_solve(H, g, x_l, x_u, x0=None, f=0.0,
               ctl: IPMControl = IPMControl()):
    """Bound-constrained QP by IPM (BQPB): the m == 0 path of the IPM.
    Accepts H as (n, n) dense or (n,) diagonal."""
    g = jnp.asarray(g)
    dt = g.dtype
    n = g.shape[0]
    H = jnp.asarray(H)
    h_kind = "diagonal" if H.ndim == 1 else "dense"
    qp = QP(H=H, g=g, A=jnp.zeros((0, n), dt),
            c_l=jnp.zeros(0, dt), c_u=jnp.zeros(0, dt),
            x_l=jnp.asarray(x_l, dt), x_u=jnp.asarray(x_u, dt),
            f=f, x=None if x0 is None else jnp.asarray(x0, dt),
            h_kind=h_kind)
    return ipm_solve(qp, ctl)
