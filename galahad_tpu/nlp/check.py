"""Derivative verification (CHECK) and finite-difference sparse
Hessian estimation by row grouping (FDH).

TPU-native re-design of GALAHAD's CHECK package (reference
src/check/check.f90:35 — verify user gradients/Jacobians/Hessians
against finite differences) and FDH (src/fdh/fdh.f90:15 — estimate a
sparse Hessian from gradient differences using a graph-coloring
grouping of the columns).

Re-designs:
  * In this framework, first derivatives come from jax.grad and are
    exact — CHECK's role shifts to verifying *user-supplied* callbacks
    (e.g. hand-written gradients passed for speed) against AD, and to
    validating AD itself against central differences (which is what the
    tests of every reference package do with their known solutions).
    All probe evaluations batch through vmap: one compiled sweep
    evaluates every coordinate probe simultaneously, where the
    reference loops host-side.
  * FDH: the sequential greedy coloring runs on the host once per
    sparsity pattern (static metadata); the per-group gradient
    differences then evaluate as ONE batched gradient call (vmap over
    group seed vectors), and the recovery solve is vectorized.
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from ..core.config import control as control_dc


@control_dc
class CheckControl:
    h: float = 1.0e-6           # FD step (central differences)
    tol: float = 1.0e-4         # relative agreement threshold
    verify_gradient: bool = True
    verify_hessian: bool = True


@dataclasses.dataclass
class CheckInfo:
    ok: bool
    grad_ok: bool
    hess_ok: bool
    max_grad_error: float
    max_hess_error: float
    grad_bad_indices: Any
    hess_bad_indices: Any


def check_derivatives(f: Callable, x, grad: Callable | None = None,
                      hess: Callable | None = None,
                      ctl: CheckControl = CheckControl()) -> CheckInfo:
    """Verify ``grad`` (and optionally ``hess``) of scalar ``f`` at x
    against central finite differences (CHECK_verify equivalent,
    reference check.f90:35).  grad=None verifies jax.grad itself."""
    x = jnp.asarray(x)
    n = x.shape[-1]
    dt = x.dtype
    h = jnp.asarray(ctl.h, dt)
    g_fun = grad if grad is not None else jax.grad(f)

    E = jnp.eye(n, dtype=dt)

    grad_ok = True
    max_ge = 0.0
    g_bad = np.zeros(0, np.int64)
    if ctl.verify_gradient:
        g = g_fun(x)
        fd = jax.vmap(lambda e: (f(x + h * e) - f(x - h * e)) / (2 * h))(E)
        scale = 1.0 + jnp.abs(fd)
        err = jnp.abs(g - fd) / scale
        max_ge = float(jnp.max(err))
        g_bad = np.nonzero(np.asarray(err) > ctl.tol)[0]
        grad_ok = max_ge <= ctl.tol

    hess_ok = True
    max_he = 0.0
    h_bad = np.zeros((0, 2), np.int64)
    if ctl.verify_hessian:
        H_fun = hess if hess is not None else jax.hessian(f)
        H = H_fun(x)
        fdH = jax.vmap(lambda e: (g_fun(x + h * e) - g_fun(x - h * e))
                       / (2 * h))(E)
        fdH = (fdH + fdH.T) / 2
        scale = 1.0 + jnp.abs(fdH)
        err = jnp.abs(H - fdH) / scale
        max_he = float(jnp.max(err))
        bad = np.argwhere(np.asarray(err) > ctl.tol)
        h_bad = bad
        hess_ok = max_he <= ctl.tol

    return CheckInfo(ok=grad_ok and hess_ok, grad_ok=grad_ok,
                     hess_ok=hess_ok, max_grad_error=max_ge,
                     max_hess_error=max_he, grad_bad_indices=g_bad,
                     hess_bad_indices=h_bad)


# ---------------------------------------------------------------------------
# FDH: sparse Hessian by graph-colored gradient differences
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class FDHPattern:
    """Static analysis product (FDH_analyse, fdh.f90): column groups
    such that no two columns in a group share a row of the pattern."""
    n: int
    rows: np.ndarray
    cols: np.ndarray
    groups: np.ndarray          # (n,) group id per column
    ngroups: int


def fdh_analyse(n: int, rows, cols) -> FDHPattern:
    """Greedy distance-2 coloring of the column intersection graph —
    the standard Curtis-Powell-Reid grouping the reference implements
    (fdh.f90 analyse phase).  Host-side; pattern is static metadata."""
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    # symmetrize pattern
    r = np.concatenate([rows, cols])
    c = np.concatenate([cols, rows])
    nbr = [set() for _ in range(n)]
    for i, j in zip(r, c):
        if i != j:
            nbr[j].add(i)
    # column j conflicts with column k if they share a row: build
    # row -> columns map
    rowcols = {}
    for i, j in zip(r, c):
        rowcols.setdefault(int(i), set()).add(int(j))
    groups = -np.ones(n, np.int32)
    for j in range(n):
        used = set()
        for i in nbr[j] | {j}:
            for kcol in rowcols.get(int(i), ()):
                if groups[kcol] >= 0:
                    used.add(int(groups[kcol]))
        g = 0
        while g in used:
            g += 1
        groups[j] = g
    return FDHPattern(n=n, rows=rows.astype(np.int32),
                      cols=cols.astype(np.int32), groups=groups,
                      ngroups=int(groups.max()) + 1 if n else 0)


def fdh_estimate(pattern: FDHPattern, grad: Callable, x,
                 h: float = 1.0e-6):
    """Estimate the sparse Hessian entries (pattern order) from ONE
    batched gradient sweep over the group seed vectors
    (FDH_estimate, fdh.f90): for group g with seed s_g = sum of unit
    vectors of its columns, (grad(x + h s_g) - grad(x))/h stacks the
    Hessian columns of the group; entry (i, j) is read from group(j)'s
    difference at row i."""
    x = jnp.asarray(x)
    dt = x.dtype
    h = jnp.asarray(h, dt)
    seeds = jnp.asarray(
        np.eye(pattern.ngroups, dtype=np.float64)[pattern.groups].T, dt)
    g0 = grad(x)
    diffs = jax.vmap(lambda s: (grad(x + h * s) - g0) / h)(seeds)
    vals = diffs[pattern.groups[pattern.cols], pattern.rows]
    # symmetrize using the transposed read where both are in-pattern
    vals_t = diffs[pattern.groups[pattern.rows], pattern.cols]
    return (vals + vals_t) / 2.0
