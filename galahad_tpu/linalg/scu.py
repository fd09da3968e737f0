"""Schur-complement updating for bordered systems (SCU equivalent).

TPU-native re-design of GALAHAD's SCU (reference src/scu/scu.f90:
SCU_factorize :200, SCU_solve :643, SCU_append :811, SCU_delete :1176):
solve

    [ A  B ] [x1]   [b1]
    [ C  D ] [x2] = [b2]

where the caller owns a factorization of A (passed as a solve closure)
and the border grows/shrinks as an active set changes.  The reference
maintains a dense factorization of the Schur complement S = D - C A^-1 B
updated per append/delete.

TPU re-design: the border lives in FIXED-capacity buffers (cap rows)
with a validity count — append/delete are O(cap^2) masked updates, so
shapes stay static under jit and active-set loops compile once
(SURVEY §7.3).  S is kept explicitly and solved densely per operation
(cap is small in all reference uses: working-set changes, crossover).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["B", "C", "D", "S", "count"],
    meta_fields=["cap", "n"],
)
@dataclasses.dataclass
class SCUState:
    B: Any        # (n, cap) border columns
    C: Any        # (cap, n) border rows
    D: Any        # (cap, cap) corner block
    S: Any        # (cap, cap) Schur complement (identity on unused slots)
    count: Any    # int32 active border size
    cap: int = 0
    n: int = 0


def scu_setup(n: int, cap: int, dtype=jnp.float64) -> SCUState:
    z = jnp.zeros
    return SCUState(
        B=z((n, cap), dtype), C=z((cap, n), dtype),
        D=z((cap, cap), dtype), S=jnp.eye(cap, dtype=dtype),
        count=jnp.array(0, jnp.int32), cap=cap, n=n,
    )


def _mask(state: SCUState):
    return jnp.arange(state.cap) < state.count


def scu_append(state: SCUState, a_solve: Callable, b_col, c_row, d_val
               ) -> SCUState:
    """Grow the border by one (row, column): SCU_append equivalent.
    b_col (n,), c_row (n,), d_val scalar."""
    j = state.count
    B = state.B.at[:, j].set(b_col)
    C = state.C.at[j, :].set(c_row)
    D = state.D.at[j, j].set(d_val)
    state = dataclasses.replace(state, B=B, C=C, D=D, count=j + 1)
    return scu_refresh(state, a_solve)


def scu_delete(state: SCUState, a_solve: Callable, idx) -> SCUState:
    """Remove border entry idx (SCU_delete): compact by swapping the last
    active slot into idx, then rebuild S from the stored blocks (cap is
    small in every reference use; one masked O(cap^2 n) matmul)."""
    last = state.count - 1
    def swap_rowcol(M, i, j, axis):
        Mi = jnp.take(M, i, axis=axis)
        Mj = jnp.take(M, j, axis=axis)
        M = _set_along(M, i, Mj, axis)
        M = _set_along(M, j, Mi, axis)
        return M

    B = swap_rowcol(state.B, idx, last, 1)
    C = swap_rowcol(state.C, idx, last, 0)
    D = swap_rowcol(swap_rowcol(state.D, idx, last, 0), idx, last, 1)
    B = B.at[:, last].set(0.0)
    C = C.at[last, :].set(0.0)
    D = D.at[last, :].set(0.0).at[:, last].set(0.0)
    state = dataclasses.replace(state, B=B, C=C, D=D, count=last)
    return scu_refresh(state, a_solve)


def _set_along(M, i, v, axis):
    if axis == 0:
        return M.at[i, :].set(v)
    return M.at[:, i].set(v)


def scu_refresh(state: SCUState, a_solve: Callable) -> SCUState:
    """Recompute S = D - C A^-1 B on the active slots (used after
    delete, or to squash accumulated update error — the reference's
    refactorize escape hatch)."""
    m = _mask(state)
    S = state.D - state.C @ a_solve(state.B)
    S = jnp.where(jnp.outer(m, m), S, 0.0)
    S = S + jnp.diag(jnp.where(m, 0.0, 1.0))
    return dataclasses.replace(state, S=S)


def scu_solve(state: SCUState, a_solve: Callable, b1, b2):
    """Solve the bordered system (SCU_solve): block elimination
        S x2 = b2 - C A^-1 b1;   A x1 = b1 - B x2.
    b2 is (cap,) with inactive entries ignored."""
    m = _mask(state)
    w = a_solve(b1)
    rhs2 = jnp.where(m, b2 - state.C @ w, 0.0)
    x2 = jnp.linalg.solve(state.S, rhs2)
    x2 = jnp.where(m, x2, 0.0)
    x1 = a_solve(b1 - state.B @ x2)
    return x1, x2
