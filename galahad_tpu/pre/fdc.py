"""Dependent equality-constraint detection (FDC equivalent).

TPU-native re-design of GALAHAD's FDC (reference src/fdc/fdc.f90:
FDC_find_dependent :517): the reference factorizes the augmented matrix
[alpha I, A'; A, 0] with SLS/ULS and inspects pivots.  On TPU the
numerically robust, batched-friendly tool is an SVD rank decision on the
equality block; dependent rows are *masked*, never deleted, so shapes
stay static (SURVEY §7.3 "sparsity dynamism" mitigation).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc


@control_dc
class FDCControl:
    tolerance: float = 0.5e-7    # relative pivot tolerance (reference
    # fdc control max_infeas-style default scale)


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["independent", "n_dependent", "inconsistent"],
    meta_fields=[],
)
@dataclasses.dataclass
class FDCInfo:
    independent: Any     # (m,) bool mask of independent rows
    n_dependent: Any
    inconsistent: Any    # True if a dependent row has inconsistent rhs


def fdc_find_dependent(A, b, ctl: FDCControl = FDCControl()) -> FDCInfo:
    """Mask linearly dependent rows of A (equality constraints A x = b).

    Greedy row selection through a pivoted Gram-Schmidt sweep: rows are
    orthogonalized in order against the accepted set; a row whose
    residual norm falls below tol * ||row|| is dependent.  Consistency of
    a dependent row's rhs is checked the same way.  O(m^2 n) MXU work,
    static shapes."""
    A = jnp.asarray(A)
    dt = A.dtype
    b = jnp.asarray(b, dt)
    m, n = A.shape
    tol = jnp.asarray(ctl.tolerance, dt)

    def body2(carry, i):
        Q, qb, accepted, incons = carry
        row = A[i]
        coeff = Q @ row
        r = row - Q.T @ coeff
        rb = b[i] - jnp.dot(coeff, qb)
        rn = jnp.linalg.norm(r)
        scale = jnp.maximum(jnp.linalg.norm(row), 1e-30)
        indep = rn > tol * scale
        q = jnp.where(indep, r / jnp.where(rn > 0, rn, 1.0), 0.0)
        qbi = jnp.where(indep, rb / jnp.where(rn > 0, rn, 1.0), 0.0)
        Q = Q.at[i].set(q)
        qb = qb.at[i].set(qbi)
        accepted = accepted.at[i].set(indep)
        bscale = jnp.maximum(jnp.abs(b[i]), 1.0)
        incons = incons | (~indep & (jnp.abs(rb) > tol * bscale * 100.0))
        return (Q, qb, accepted, incons), None

    Q0 = jnp.zeros((m, n), dt)
    qb0 = jnp.zeros((m,), dt)
    acc0 = jnp.zeros((m,), bool)
    (Q, qb, accepted, incons), _ = jax.lax.scan(
        body2, (Q0, qb0, acc0, jnp.array(False)), jnp.arange(m)
    )
    return FDCInfo(
        independent=accepted,
        n_dependent=m - jnp.sum(accepted),
        inconsistent=incons,
    )
