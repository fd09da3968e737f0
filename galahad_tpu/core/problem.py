"""Problem containers (pytrees).

TPU-native re-design of GALAHAD's problem types:
  * ``QP``   mirrors ``QPT_problem_type``  (reference src/qpt/qpt.f90:128-240)
  * ``NLP``  mirrors ``NLPT_problem_type`` (reference src/nlpt/nlpt.f90:84)

Design notes (why this is not a port):
  The reference stores sparse matrices in 8 storage kinds and *permutes*
  problems into a standard bound-ordered form (QPP, src/qpp/qpp.f90:214).
  Permutation produces dynamic shapes, which XLA cannot tile; instead we
  keep every array at its natural static shape and classify bounds with
  boolean *masks* computed from the data (free / lower / upper / range /
  fixed).  All solvers index through these masks, so problem structure is
  static under ``jit`` and batches of problems ``vmap`` cleanly.

  The v1 compute path is dense (H: (n, n), A: (m, n)); banded and
  block-sparse representations layer on top with the same mask contract.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

# GALAHAD convention: magnitudes >= infinity are "no bound"
# (reference src/cqp/cqp.f90:219, control%infinity default 1e19).
INFINITY = 1.0e19


def canonical_dtype(dtype):
    """Resolve a requested float dtype against the runtime x64 mode:
    float64 becomes float32 when x64 is disabled (the TPU default)
    instead of tripping per-array truncation warnings."""
    import numpy as _np

    if _np.dtype(dtype) == _np.float64 and not jax.config.jax_enable_x64:
        return _np.float32
    return dtype


def _field(**kw):
    return dataclasses.field(**kw)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["H", "g", "f", "A", "c_l", "c_u", "x_l", "x_u", "x", "y", "z"],
    meta_fields=["name", "h_kind"],
)
@dataclasses.dataclass
class QP:
    """Quadratic program  min 1/2 x'Hx + g'x + f
                          s.t. c_l <= A x <= c_u,  x_l <= x <= x_u.

    ``h_kind`` tags the Hessian structure (static metadata):
      "dense"    H is (n, n)
      "diagonal" H is (n,) holding the diagonal
      "zero"     H is None (LP)
      "identity" H is None, Hessian is I
      "scaled_identity" H is () scalar multiple of I
    These replace the reference's SMT storage-type strings
    (src/qpt/qpt.f90 H%type values; see also src/rpd/rpd.f90:20-45).
    """

    g: jnp.ndarray                      # (n,) objective gradient
    A: jnp.ndarray                      # (m, n) constraint Jacobian (dense v1)
    c_l: jnp.ndarray                    # (m,) constraint lower bounds
    c_u: jnp.ndarray                    # (m,) constraint upper bounds
    x_l: jnp.ndarray                    # (n,) variable lower bounds
    x_u: jnp.ndarray                    # (n,) variable upper bounds
    H: Any = None                       # see h_kind
    f: Any = 0.0                        # objective constant
    x: Any = None                       # (n,) primal starting point / solution
    y: Any = None                       # (m,) constraint multipliers
    z: Any = None                       # (n,) bound duals
    name: str = ""
    h_kind: str = "dense"

    @property
    def n(self) -> int:
        return self.g.shape[-1]

    @property
    def m(self) -> int:
        return self.A.shape[-2] if self.A is not None else 0

    def dtype(self):
        return self.g.dtype

    # --- constraint-matrix actions (replace QPD_AX, src/qpd/qpd.f90;
    # overridable by structured problem types, e.g. BandedQP) ---
    def Ax(self, v: jnp.ndarray) -> jnp.ndarray:
        return self.A @ v

    def Aty(self, y: jnp.ndarray) -> jnp.ndarray:
        return self.A.T @ y

    # --- Hessian action (replaces QPD_HX, reference src/qpd/qpd.f90) ---
    def Hx(self, v: jnp.ndarray) -> jnp.ndarray:
        k = self.h_kind
        if k == "dense":
            return self.H @ v
        if k == "diagonal":
            return self.H * v
        if k == "zero":
            return jnp.zeros_like(v)
        if k == "identity":
            return v
        if k == "scaled_identity":
            return self.H * v
        raise ValueError(f"unknown h_kind {k!r}")

    def H_dense(self) -> jnp.ndarray:
        """Materialize H as a dense (n, n) matrix."""
        n = self.n
        k = self.h_kind
        if k == "dense":
            return self.H
        if k == "diagonal":
            return jnp.diag(self.H)
        if k == "zero":
            return jnp.zeros((n, n), self.g.dtype)
        if k == "identity":
            return jnp.eye(n, dtype=self.g.dtype)
        if k == "scaled_identity":
            return self.H * jnp.eye(n, dtype=self.g.dtype)
        raise ValueError(f"unknown h_kind {k!r}")

    def H_diag(self) -> jnp.ndarray:
        n = self.n
        k = self.h_kind
        if k == "dense":
            return jnp.diagonal(self.H, axis1=-2, axis2=-1)
        if k == "diagonal":
            return self.H
        if k == "zero":
            return jnp.zeros((n,), self.g.dtype)
        if k == "identity":
            return jnp.ones((n,), self.g.dtype)
        if k == "scaled_identity":
            return self.H * jnp.ones((n,), self.g.dtype)
        raise ValueError(f"unknown h_kind {k!r}")

    def objective(self, x: jnp.ndarray) -> jnp.ndarray:
        return 0.5 * jnp.vdot(x, self.Hx(x)) + jnp.vdot(self.g, x) + self.f


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "has_xl", "has_xu", "x_free", "x_fixed", "x_range",
        "has_cl", "has_cu", "c_free", "c_equality", "c_range",
    ],
    meta_fields=[],
)
@dataclasses.dataclass
class BoundMasks:
    """Static-shape bound classification (replaces QPP reordering,
    reference src/qpp/qpp.f90:214 and the `dims` sections documented at
    src/cqp/cqp.f90:3009-3031).

    All fields are boolean arrays; variable masks have shape (n,),
    constraint masks shape (m,).  A *fixed* variable has x_l == x_u; an
    *equality* constraint has c_l == c_u.
    """

    has_xl: jnp.ndarray
    has_xu: jnp.ndarray
    x_free: jnp.ndarray
    x_fixed: jnp.ndarray
    x_range: jnp.ndarray
    has_cl: jnp.ndarray
    has_cu: jnp.ndarray
    c_free: jnp.ndarray
    c_equality: jnp.ndarray
    c_range: jnp.ndarray


def classify_bounds(qp: QP, infinity: float = INFINITY) -> BoundMasks:
    has_xl = qp.x_l > -infinity
    has_xu = qp.x_u < infinity
    x_fixed = has_xl & has_xu & (qp.x_u - qp.x_l <= 0.0)
    has_cl = qp.c_l > -infinity
    has_cu = qp.c_u < infinity
    c_equality = has_cl & has_cu & (qp.c_u - qp.c_l <= 0.0)
    return BoundMasks(
        has_xl=has_xl,
        has_xu=has_xu,
        x_free=~(has_xl | has_xu),
        x_fixed=x_fixed,
        x_range=has_xl & has_xu & ~x_fixed,
        has_cl=has_cl,
        has_cu=has_cu,
        c_free=~(has_cl | has_cu),
        c_equality=c_equality,
        c_range=has_cl & has_cu & ~c_equality,
    )


def check_qp(qp: QP, infinity: float = INFINITY) -> int:
    """Validate a QP (host-side); returns a Status code.

    Mirrors the input checks each reference solver performs on entry
    (e.g. src/cqp/cqp.f90 restrictions n>=1, m>=0, consistent bounds ->
    statuses -3 / -4).
    """
    from .status import Status

    if qp.n < 1:
        return int(Status.RESTRICTIONS)
    A = getattr(qp, "A", None)
    if A is not None and A.shape[-1] != qp.n:
        return int(Status.RESTRICTIONS)
    a_pat = getattr(qp, "a_pat", None)           # SparseQP
    if a_pat is not None and a_pat.n != qp.n:
        return int(Status.RESTRICTIONS)
    if qp.x_l.shape[-1] != qp.n or qp.x_u.shape[-1] != qp.n:
        return int(Status.RESTRICTIONS)
    xl = jnp.where(qp.x_l > -infinity, qp.x_l, -jnp.inf)
    xu = jnp.where(qp.x_u < infinity, qp.x_u, jnp.inf)
    if bool(jnp.any(xl > xu)):
        return int(Status.BAD_BOUNDS)
    if qp.m > 0:
        cl = jnp.where(qp.c_l > -infinity, qp.c_l, -jnp.inf)
        cu = jnp.where(qp.c_u < infinity, qp.c_u, jnp.inf)
        if bool(jnp.any(cl > cu)):
            return int(Status.BAD_BOUNDS)
    return int(Status.OK)


# ---------------------------------------------------------------------------
# Nonlinear programming problem
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "x_l", "x_u", "c_l", "c_u", "y", "z"],
    meta_fields=["name", "objective", "constraints"],
)
@dataclasses.dataclass
class NLP:
    """Nonlinear program  min f(x)  s.t.  c_l <= c(x) <= c_u, x_l <= x <= x_u.

    Mirrors NLPT_problem_type (reference src/nlpt/nlpt.f90:84) but replaces
    CUTEst evaluation callbacks / reverse communication with jax-traceable
    callables: ``objective(x) -> scalar`` and ``constraints(x) -> (m,)``.
    Gradients / Hessian-vector products come from jax.grad / jax.jvp, which
    replaces the reference's eval_G/eval_H/eval_HPROD callback suite
    (src/tru/tru.f90:1102-1440).
    """

    x: jnp.ndarray                       # starting point / solution
    x_l: jnp.ndarray
    x_u: jnp.ndarray
    c_l: Any = None
    c_u: Any = None
    y: Any = None
    z: Any = None
    name: str = ""
    objective: Any = None                # callable f(x) -> scalar
    constraints: Any = None              # callable c(x) -> (m,) or None

    @property
    def n(self) -> int:
        return self.x.shape[-1]


def unconstrained_nlp(objective, x0, name: str = "") -> NLP:
    x0 = jnp.asarray(x0)
    n = x0.shape[-1]
    inf = jnp.full((n,), 2 * INFINITY, x0.dtype)
    return NLP(x=x0, x_l=-inf, x_u=inf, name=name, objective=objective)
