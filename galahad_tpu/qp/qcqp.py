"""Quadratically-constrained QP (QCQP).

The reference's RPD reader accepts the QCQP problem-type codes
(reference src/rpd/rpd.f90:20-45: 'Q' in the constraint class) and hands
the quadratic constraint Hessians to the caller; GALAHAD itself solves
such problems through its general NLP packages (LANCELOT accepts any
smooth constraints, src/lancelot/lancelot.f90:499).  Here the QCQP gets
a first-class container and solver so the QPLIB -> solve pipeline covers
every RPD problem class:

    min  1/2 x'Hx + g'x + f
    s.t. c_l <= A x + 1/2 <x, Q_i x> <= c_u,   x_l <= x <= x_u

Two solve paths:
  * ``method="al"`` (default): the augmented-Lagrangian outer loop of
    nlp/lancelot.py (the reference's own route for nonlinear
    constraints) with TRB inner solves; constraint values/derivatives
    come from one einsum (MXU work), not callbacks.
  * ``method="filter"``: feasibility-first — nlp/filtrane.py finds an
    interior feasible point, then "al" polishes (useful when the
    starting point is badly infeasible).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP, classify_bounds
from ..core.status import Status
from ..nlp.lancelot import LancelotControl, lancelot_solve


@control_dc
class QCQPControl:
    method: str = "al"            # "al" | "filter"
    maxit: int = 30               # outer AL iterations
    stop_c: float = 1.0e-7
    stop_g: float = 1.0e-7
    inner_maxit: int = 300
    infinity: float = INFINITY


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["H", "g", "f", "A", "Qc", "c_l", "c_u", "x_l", "x_u",
                 "x", "y", "z"],
    meta_fields=["name", "h_kind"],
)
@dataclasses.dataclass
class QCQP:
    """QCQP container: a QP plus stacked constraint Hessians ``Qc``
    (m, n, n) — the RPD H_c triples assembled dense (the QCQP instances
    RPD targets are small; a COO variant can layer on like SparseQP)."""

    g: jnp.ndarray
    A: jnp.ndarray
    Qc: jnp.ndarray              # (m, n, n) symmetric constraint Hessians
    c_l: jnp.ndarray
    c_u: jnp.ndarray
    x_l: jnp.ndarray
    x_u: jnp.ndarray
    H: Any = None
    f: Any = 0.0
    x: Any = None
    y: Any = None
    z: Any = None
    name: str = ""
    h_kind: str = "dense"

    @property
    def n(self) -> int:
        return self.g.shape[-1]

    @property
    def m(self) -> int:
        return self.A.shape[-2]

    def Hx(self, v):
        return QP.Hx(self, v)

    def objective(self, x):
        return 0.5 * jnp.vdot(x, self.Hx(x)) + jnp.vdot(self.g, x) + self.f

    def constraints(self, x):
        """c(x) = A x + 1/2 <x, Q_i x> per row (one einsum -> MXU)."""
        lin = self.A @ x
        if self.m == 0:
            return lin
        quad = 0.5 * jnp.einsum("mij,i,j->m", self.Qc, x, x)
        return lin + quad

    def to_qp(self) -> QP:
        """Drop the quadratic constraint terms (valid when Qc == 0)."""
        return QP(H=self.H, g=self.g, f=self.f, A=self.A,
                  c_l=self.c_l, c_u=self.c_u, x_l=self.x_l, x_u=self.x_u,
                  x=self.x, y=self.y, z=self.z, name=self.name,
                  h_kind=self.h_kind)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "y", "z", "obj", "infeas", "norm_pg", "iter",
                 "converged", "status"],
    meta_fields=[],
)
@dataclasses.dataclass
class QCQPInfo:
    x: Any
    y: Any
    z: Any
    obj: Any
    infeas: Any
    norm_pg: Any
    iter: Any
    converged: Any
    status: Any


def qcqp_solve(p: QCQP, ctl: QCQPControl = QCQPControl()) -> QCQPInfo:
    """Solve the QCQP.  Returns primal x, constraint multipliers y,
    bound duals z (recovered as the Lagrangian-gradient residual, the
    same convention the QP solvers use for fixed variables)."""
    masks = classify_bounds(p, ctl.infinity)

    def objective(x):
        return p.objective(x)

    def constraints(x):
        return p.constraints(x)

    x0 = p.x if p.x is not None else jnp.zeros(p.n, p.g.dtype)

    if ctl.method == "filter":
        # feasibility first (FILTRANE role): drive the constraint
        # violation into the feasible region, then polish with AL
        from ..nlp.filtrane import FiltraneControl, filtrane_solve

        fst = filtrane_solve(constraints, x0, p.c_l, p.c_u, p.x_l, p.x_u,
                             FiltraneControl(maxit=ctl.inner_maxit))
        x0 = jnp.clip(fst.x, p.x_l, p.x_u)

    st = lancelot_solve(
        objective, constraints, x0, p.c_l, p.c_u, p.x_l, p.x_u,
        LancelotControl(maxit=ctl.maxit, stop_c=ctl.stop_c,
                        stop_g=ctl.stop_g, inner_maxit=ctl.inner_maxit,
                        infinity=ctl.infinity),
    )
    x, y = st.x, st.y
    # bound dual z = grad_x L = grad f - J(x)' y on the bounds
    gL = jax.grad(objective)(x) - jax.vjp(constraints, x)[1](y)[0]
    z = jnp.where(masks.has_xl | masks.has_xu, gL, 0.0)
    return QCQPInfo(
        x=x, y=y, z=z, obj=objective(x), infeas=st.infeas,
        norm_pg=st.norm_pg, iter=st.iter, converged=st.converged,
        status=st.status,
    )
