"""Iterative refinement (IR equivalent).

TPU-native version of GALAHAD's IR (reference src/ir/ir.f90:
IR_solve :334): wraps any approximate solve with residual-correction
sweeps against the true operator — the mechanism that lets regularized,
pivot-free TPU factorizations reach direct-solver accuracy
(SURVEY §7.1 pivoting translation).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.config import control as control_dc


@control_dc
class IRControl:
    itref_max: int = 2           # reference default sweeps
    acceptable_residual_relative: float = 1.0e-12


def ir_solve(matvec, approx_solve, b, ctl: IRControl = IRControl()):
    """x ~ A^-1 b by refinement: x += M(b - A x) for itref_max sweeps,
    where M = approx_solve.  Returns (x, final_residual_norm)."""
    x = approx_solve(b)
    r = b - matvec(x)
    for _ in range(ctl.itref_max):
        x = x + approx_solve(r)
        r = b - matvec(x)
    return x, jnp.linalg.norm(r)
