"""SLS: uniform facade over symmetric factorization backends.

TPU-native re-design of GALAHAD's SLS (reference src/sls/sls.f90:
SLS_analyse :2178, SLS_factorize :3521, SLS_solve :4692; backend
dispatch by name :843-921 over MA27/MA57/SSIDS/PARDISO/potr/sytr/pbtr).

Backends here (dispatch by the same kind of name string):
  * "potr"  — dense Cholesky (SPD), lax.linalg.cholesky: the batched
    MXU path;
  * "sytr"  — dense symmetric indefinite, solved through LU with
    partial pivoting (lax.linalg.lu) — the TPU-available stable dense
    indefinite solve; inertia is not exposed (use "eigh" when needed);
  * "eigh"  — dense eigendecomposition: gives inertia (SLS_enquire
    equivalent) and pseudo-inverse solves;
  * "pbtr"  — block-tridiagonal/banded Cholesky (linalg/banded.py):
    O(n b^2) flops, the large-banded workhorse;
  * "cg"    — matrix-free conjugate gradients (no factorization), for
    well-conditioned or preconditioned systems;
  * "supernodal" — sparse multifrontal Cholesky (linalg/supernodal.py,
    the SSIDS replacement): pass A = (symbolic, values) from
    supernodal_analyse.

All factor objects expose .solve(rhs) and vmap/jit cleanly.  Dynamic
threshold pivoting does not exist on TPU by design — quasi-definite
regularization + iterative refinement replaces it (SURVEY §7.1/7.3).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from .banded import BlockTridiagFactors, block_tridiag_cholesky, block_tridiag_solve
from .cholesky import chol_factor_shifted, chol_solve


@control_dc
class SLSControl:
    solver: str = "potr"
    shift: float = 0.0           # regularization added to the diagonal
    cg_maxit: int = 256
    cg_tol: float = 1.0e-12


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["data", "aux", "ok", "inertia"],
    meta_fields=["kind"],
)
@dataclasses.dataclass
class SLSFactors:
    data: Any
    aux: Any
    ok: Any
    inertia: Any       # (pos, neg, zero) or (-1,-1,-1) if unavailable
    kind: str = "potr"

    def solve(self, rhs):
        return sls_solve(self, rhs)


def sls_factorize(A, ctl: SLSControl = SLSControl()) -> SLSFactors:
    """Factorize a symmetric matrix.  A is (n, n) dense for
    potr/sytr/eigh, a (D, L) block pair for pbtr, or a matvec closure
    for cg (pass through to sls_solve)."""
    kind = ctl.solver
    none3 = jnp.array([-1, -1, -1], jnp.int32)

    if kind == "pbtr":
        D, L = A
        f = block_tridiag_cholesky(D, L)
        return SLSFactors(data=f, aux=None, ok=f.ok, inertia=none3,
                          kind=kind)

    if kind == "cg":
        return SLSFactors(data=A, aux=ctl, ok=jnp.array(True),
                          inertia=none3, kind=kind)

    if kind == "supernodal":
        from .supernodal import supernodal_factorize

        sym, vals = A
        fac = supernodal_factorize(sym, vals, shift=ctl.shift)
        return SLSFactors(data=fac, aux=sym, ok=jnp.array(True),
                          inertia=none3, kind=kind)

    A = jnp.asarray(A)
    n = A.shape[-1]
    if ctl.shift:
        A = A + ctl.shift * jnp.eye(n, dtype=A.dtype)

    if kind == "potr":
        L, _, ok = chol_factor_shifted(A, 0.0, max_tries=1)
        return SLSFactors(
            data=L, aux=None, ok=ok,
            inertia=jnp.where(ok, jnp.array([n, 0, 0], jnp.int32), none3),
            kind=kind,
        )

    if kind == "sytr":
        lu, piv, perm = lax.linalg.lu(A)
        ok = jnp.all(jnp.abs(jnp.diagonal(lu, axis1=-2, axis2=-1)) > 0)
        return SLSFactors(data=(lu, piv, perm), aux=None, ok=ok,
                          inertia=none3, kind=kind)

    if kind == "eigh":
        lam, Q = jnp.linalg.eigh(A)
        tol = jnp.max(jnp.abs(lam)) * jnp.finfo(A.dtype).eps * n
        pos = jnp.sum(lam > tol).astype(jnp.int32)
        neg = jnp.sum(lam < -tol).astype(jnp.int32)
        zero = (n - pos - neg).astype(jnp.int32)
        return SLSFactors(
            data=(lam, Q), aux=tol, ok=zero == 0,
            inertia=jnp.stack([pos, neg, zero]), kind=kind,
        )

    raise ValueError(f"unknown SLS solver {kind!r}")


def sls_solve(f: SLSFactors, rhs):
    """Solve A x = rhs with the factors (SLS_solve equivalent)."""
    if f.kind == "potr":
        return chol_solve(f.data, rhs)
    if f.kind == "sytr":
        lu, piv, perm = f.data
        x = rhs[..., perm] if rhs.ndim == 1 else rhs[perm]
        x = lax.linalg.triangular_solve(lu, x[..., None] if x.ndim == 1 else x,
                                        left_side=True, lower=True,
                                        unit_diagonal=True)
        x = lax.linalg.triangular_solve(lu, x, left_side=True, lower=False)
        return x[..., 0] if rhs.ndim == 1 else x
    if f.kind == "eigh":
        lam, Q = f.data
        safe = jnp.where(jnp.abs(lam) > f.aux, lam, jnp.inf)
        w = (jnp.swapaxes(Q, -1, -2) @ (rhs[..., None] if rhs.ndim == 1
                                        else rhs))
        w = w / safe[..., None]
        x = Q @ w
        return x[..., 0] if rhs.ndim == 1 else x
    if f.kind == "pbtr":
        return block_tridiag_solve(f.data, rhs)
    if f.kind == "supernodal":
        from .supernodal import supernodal_solve

        return supernodal_solve(f.aux, f.data, rhs)
    if f.kind == "cg":
        return _cg_solve(f.data, rhs, f.aux)
    raise ValueError(f"unknown SLS solver {f.kind!r}")


def sls_enquire(f: SLSFactors):
    """Inertia (pos, neg, zero) — SLS_enquire equivalent; (-1,-1,-1)
    when the backend does not expose it."""
    return f.inertia


def _cg_solve(matvec, b, ctl: SLSControl):
    """Plain CG (the matrix-free backend)."""
    x0 = jnp.zeros_like(b)
    r0 = b
    p0 = r0
    rs0 = jnp.vdot(r0, r0).real

    def cond(st):
        x, r, p, rs, k = st
        return (rs > ctl.cg_tol**2 * jnp.maximum(rs0, 1e-300)) & (
            k < ctl.cg_maxit
        )

    def body(st):
        x, r, p, rs, k = st
        Ap = matvec(p)
        alpha = rs / jnp.maximum(jnp.vdot(p, Ap).real, 1e-300)
        x = x + alpha * p
        r = r - alpha * Ap
        rs_new = jnp.vdot(r, r).real
        p = r + (rs_new / jnp.maximum(rs, 1e-300)) * p
        return x, r, p, rs_new, k + 1

    x, *_ = lax.while_loop(cond, body, (x0, r0, p0, rs0,
                                        jnp.array(0, jnp.int32)))
    return x
