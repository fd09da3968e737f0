"""Sparse Hessian recovery from secant pairs (gradient differences).

TPU-native re-design of GALAHAD's SHA (reference src/sha/sha.f90:
SHA_analyse :420, SHA_estimate :1005): given a known sparsity pattern
and a set of (step, gradient-difference) pairs, recover the Hessian
entries row-by-row from small least-squares systems.

The reference groups rows and solves per-row dense LS on the host; here
every row's system is padded to the maximum row degree and solved in ONE
batched ``lstsq`` (vmapped QR) — a natural MXU batch (SURVEY §8.6:
"on TPU a natural batched lstsq").
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


@partial(
    jax.tree_util.register_dataclass,
    data_fields=[],
    meta_fields=["row_cols", "row_deg", "n", "max_deg"],
)
@dataclasses.dataclass
class SHAPattern:
    """Symbolic analysis product (SHA_analyse equivalent): per-row
    column indices padded to max degree (static metadata)."""

    row_cols: Any        # (n, max_deg) int array, padded with col 0
    row_deg: Any         # (n,) degrees
    n: int = 0
    max_deg: int = 0


def sha_analyse(n: int, rows, cols) -> SHAPattern:
    """Build per-row padded index sets from a symmetric sparsity pattern
    given in coordinate form (both triangles or either)."""
    adj = [set() for _ in range(n)]
    for r, c in zip(np.asarray(rows), np.asarray(cols)):
        adj[int(r)].add(int(c))
        adj[int(c)].add(int(r))
    deg = np.array([len(a) for a in adj])
    max_deg = int(deg.max()) if n else 0
    padded = np.zeros((n, max_deg), dtype=np.int32)
    for i, a in enumerate(adj):
        idx = sorted(a)
        padded[i, : len(idx)] = idx
    return SHAPattern(
        row_cols=tuple(map(tuple, padded)), row_deg=tuple(deg.tolist()),
        n=n, max_deg=max_deg,
    )


def sha_estimate(pattern: SHAPattern, S, Y):
    """Estimate H (symmetric, given sparsity) from pairs H s_k ~= y_k.

    S, Y: (npairs, n).  Each row i solves
        min || S[:, cols_i] h_i - Y[:, i] ||
    over its nonzero entries h_i — all rows in one vmapped lstsq.
    Needs npairs >= max row degree for full rank.
    Returns dense (n, n) H (zeros off-pattern).
    """
    S = jnp.asarray(S)
    Y = jnp.asarray(Y)
    n, max_deg = pattern.n, pattern.max_deg
    cols = jnp.asarray(pattern.row_cols, jnp.int32).reshape(n, max_deg)
    deg = jnp.asarray(pattern.row_deg, jnp.int32)

    def solve_row(cols_i, deg_i, y_i):
        A = S[:, cols_i]                          # (npairs, max_deg)
        mask = jnp.arange(max_deg) < deg_i
        A = jnp.where(mask[None, :], A, 0.0)
        # ridge-free LS via normal equations with tiny Tikhonov for the
        # padded (zero) columns
        G = A.T @ A + jnp.diag(jnp.where(mask, 0.0, 1.0))
        h = jnp.linalg.solve(G, A.T @ y_i)
        return jnp.where(mask, h, 0.0)

    H_rows = jax.vmap(solve_row)(cols, deg, Y.T)   # (n, max_deg)
    rows_idx = jnp.repeat(jnp.arange(n), max_deg)
    active = (jnp.arange(max_deg)[None, :] < deg[:, None]).reshape(-1)
    vals = jnp.where(active, H_rows.reshape(-1), 0.0)
    H = jnp.zeros((n, n), S.dtype).at[rows_idx, cols.reshape(-1)].add(vals)
    # the pattern is symmetric, so each off-diagonal entry was estimated
    # from both of its rows; average the two (diagonal doubles then halves)
    mult = jnp.zeros((n, n), S.dtype).at[rows_idx, cols.reshape(-1)].add(
        jnp.where(active, 1.0, 0.0)
    )
    total = mult + mult.T
    return jnp.where(total > 0, (H + H.T) / jnp.maximum(total, 1.0), 0.0)
