"""Sparse problem containers (COO pytrees with static patterns).

TPU-native equivalent of the reference's SMT/ZD11 sparse storage
(reference src/zd11/zd11.f90:12-17) applied to the QP container
(QPT_problem_type, src/qpt/qpt.f90:128): the sparsity PATTERN is static
host metadata (hashed by identity, so jit traces once per pattern) and
only the VALUES are device arrays.  Matrix actions are segment-sum
scatters (the mop_Ax role, src/mop/mop.f90:40); the KKT factorization
path routes through the supernodal LDL^T via linalg.sbls.sparse_kkt_*
(the CQP -> SBLS -> SLS -> SSIDS flagship stack, SURVEY §3.1).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp

from .problem import INFINITY


class COOPattern:
    """Static coordinate sparsity pattern (host-side numpy).

    Hash/eq are by identity: reuse ONE pattern object across solves so
    jitted programs retrace only when the structure really changes
    (the new_problem_structure contract, reference src/qpt/qpt.f90:161).
    """

    __slots__ = ("rows", "cols", "m", "n")

    def __init__(self, rows, cols, m: int, n: int):
        self.rows = np.asarray(rows, np.int32)
        self.cols = np.asarray(cols, np.int32)
        self.m = int(m)
        self.n = int(n)

    @property
    def nnz(self) -> int:
        return len(self.rows)

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other

    def __repr__(self):
        return f"COOPattern({self.m}x{self.n}, nnz={self.nnz})"


def lower_triangle(rows, cols, vals):
    """Normalize a symmetric COO triple to the lower triangle
    (row >= col), summing duplicates.  Host-side."""
    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    vals = np.asarray(vals)
    r = np.maximum(rows, cols)
    c = np.minimum(rows, cols)
    key = r * (c.max() + 1 if len(c) else 1) + c
    order = np.argsort(key, kind="stable")
    r, c, v = r[order], c[order], vals[order]
    if len(r):
        first = np.ones(len(r), bool)
        first[1:] = (r[1:] != r[:-1]) | (c[1:] != c[:-1])
        idx = np.cumsum(first) - 1
        rr, cc = r[first], c[first]
        vv = np.zeros(first.sum(), vals.dtype)
        np.add.at(vv, idx, v)
        return rr, cc, vv
    return r, c, v


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["h_vals", "a_vals", "g", "f", "c_l", "c_u", "x_l", "x_u",
                 "x", "y", "z"],
    meta_fields=["h_pat", "a_pat", "name"],
)
@dataclasses.dataclass
class SparseQP:
    """Quadratic program with sparse H (lower triangle) and A in COO.

    Same mathematical contract as core.problem.QP; the IPM reaches the
    supernodal augmented-system KKT factorization through ``build_kkt``
    (mirrors src/cqp/cqp.f90:4781 -> src/sbls/sbls.f90:1695 ->
    src/sls/sls.f90:3521 -> SSIDS).
    """

    g: jnp.ndarray
    c_l: jnp.ndarray
    c_u: jnp.ndarray
    x_l: jnp.ndarray
    x_u: jnp.ndarray
    h_vals: Any = None          # (nnz_h,) values of the H lower triangle
    a_vals: Any = None          # (nnz_a,) values of A
    f: Any = 0.0
    x: Any = None
    y: Any = None
    z: Any = None
    h_pat: COOPattern = None    # lower triangle (row >= col), deduplicated
    a_pat: COOPattern = None
    name: str = ""

    h_kind = "sparse"           # static tag (parallels QP.h_kind)

    @property
    def n(self) -> int:
        return self.g.shape[-1]

    @property
    def m(self) -> int:
        return self.a_pat.m if self.a_pat is not None else 0

    def dtype(self):
        return self.g.dtype

    # --- matrix actions (mop_Ax role, reference src/mop/mop.f90:40) ---
    def Ax(self, v: jnp.ndarray) -> jnp.ndarray:
        p = self.a_pat
        out = jnp.zeros(p.m, v.dtype)
        return out.at[jnp.asarray(p.rows)].add(
            self.a_vals * v[jnp.asarray(p.cols)])

    def Aty(self, y: jnp.ndarray) -> jnp.ndarray:
        p = self.a_pat
        out = jnp.zeros(p.n, y.dtype)
        return out.at[jnp.asarray(p.cols)].add(
            self.a_vals * y[jnp.asarray(p.rows)])

    def Hx(self, v: jnp.ndarray) -> jnp.ndarray:
        if self.h_pat is None or self.h_pat.nnz == 0:
            return jnp.zeros_like(v)
        r = jnp.asarray(self.h_pat.rows)
        c = jnp.asarray(self.h_pat.cols)
        out = jnp.zeros_like(v).at[r].add(self.h_vals * v[c])
        off = r != c
        return out.at[c].add(jnp.where(off, self.h_vals * v[r], 0.0))

    def H_diag(self) -> jnp.ndarray:
        out = jnp.zeros(self.n, self.g.dtype)
        if self.h_pat is None or self.h_pat.nnz == 0:
            return out
        r = jnp.asarray(self.h_pat.rows)
        c = jnp.asarray(self.h_pat.cols)
        return out.at[r].add(jnp.where(r == c, self.h_vals, 0.0))

    def objective(self, x: jnp.ndarray) -> jnp.ndarray:
        return 0.5 * jnp.vdot(x, self.Hx(x)) + jnp.vdot(self.g, x) + self.f

    # --- IPM hook: sparse augmented-system KKT --------------------------
    def build_kkt(self, D_x, C_diag, ctl):
        """Factorize K = [[H + D_x + rho I, A'], [A, -C - delta I]] with
        the supernodal LDL^T (analysed once per pattern) and return a
        solver closure with iterative refinement against the
        UNregularized K (the IR role, reference src/ir/ir.f90:334)."""
        from ..linalg.sbls import sparse_kkt_factorize, sparse_kkt_plan

        from ..linalg.dw import dw_add, two_sum

        plan = sparse_kkt_plan(self.h_pat, self.a_pat, self.n)
        # f32 factors need LARGER quasi-definite regularization: with
        # delta ~ 1e-8 an active constraint's -(C+delta) pivot is tiny
        # and static elimination suffers catastrophic element growth
        # (observed: intermittent O(1) solve errors -> dual-residual
        # spikes).  delta ~ 1e-4 bounds the growth and the double-word
        # IR below recovers full accuracy (the reference escalates
        # pivot tolerances instead, sbls.f90:198-205).
        f32 = jnp.asarray(self.g).dtype == jnp.float32
        rho = ctl.rho if ctl.rho else (1e-4 if f32 else 1e-8)
        # a NON-default ctl.delta is an explicit user choice; only the
        # untouched default is upgraded on f32
        delta = (ctl.delta if ctl.delta != 1e-8
                 else (1e-4 if f32 else ctl.delta))
        fac = sparse_kkt_factorize(
            plan, self.h_vals, self.a_vals, D_x, C_diag,
            rho=rho, delta=delta)
        n = self.n

        def Kmul(u):
            u1, u2 = u[:n], u[n:]
            return jnp.concatenate([
                self.Hx(u1) + D_x * u1 + self.Aty(u2),
                self.Ax(u1) - C_diag * u2,
            ])

        def kkt_solve(b1, b2):
            # double-word iterate IR: f32 factors still deliver ~1e-6
            # KKT residuals (SURVEY §7.3; linalg/dw.py)
            b = jnp.concatenate([b1, b2])
            xh = plan.solve(fac, b)
            xl = jnp.zeros_like(xh)
            for _ in range(ctl.refine):
                rh, rl = two_sum(b, -Kmul(xh))
                r = (rh - Kmul(xl)) + rl
                xh, xl = dw_add(xh, xl, plan.solve(fac, r))
            u = xh + xl
            return u[:n], -u[n:]

        return kkt_solve


def make_sparse_qp(n, m, *, h_coo=None, a_coo=None, g, c_l=None, c_u=None,
                   x_l=None, x_u=None, f=0.0, x=None, y=None, z=None,
                   name: str = "", dtype=None) -> SparseQP:
    """Assemble a SparseQP from raw COO triples (H may be given in
    either/both triangles; it is normalized to lower).  Host-side."""
    g = jnp.asarray(g, dtype)
    dt = g.dtype
    if h_coo is not None:
        hr, hc, hv = lower_triangle(*h_coo)
        h_pat = COOPattern(hr, hc, n, n)
        h_vals = jnp.asarray(hv, dt)
    else:
        h_pat = COOPattern([], [], n, n)
        h_vals = jnp.zeros((0,), dt)
    if a_coo is not None:
        ar, ac, av = a_coo
        a_pat = COOPattern(ar, ac, m, n)
        a_vals = jnp.asarray(av, dt)
    else:
        a_pat = COOPattern([], [], m, n)
        a_vals = jnp.zeros((0,), dt)

    def vec(v, default, size):
        if v is None:
            return jnp.full((size,), default, dt)
        return jnp.asarray(v, dt)

    return SparseQP(
        g=g, f=f,
        c_l=vec(c_l, -INFINITY, m), c_u=vec(c_u, INFINITY, m),
        x_l=vec(x_l, -INFINITY, n), x_u=vec(x_u, INFINITY, n),
        h_vals=h_vals, a_vals=a_vals, h_pat=h_pat, a_pat=a_pat,
        x=None if x is None else jnp.asarray(x, dt),
        y=None if y is None else jnp.asarray(y, dt),
        z=None if z is None else jnp.asarray(z, dt),
        name=name,
    )
