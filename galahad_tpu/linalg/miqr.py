"""Multilevel incomplete QR factorization for least-squares
preconditioning.

TPU-native re-design of GALAHAD's MIQR (reference src/miqr/miqr.f90:
17-26, implementing Li & Saad, SIMAX 28(2):524-550: recursively detect
sets of mutually (nearly) orthogonal columns, orthogonalize the rest
against them, and recurse on the reduced matrix; drop small fill).

Re-design: the level construction (greedy angle-threshold independent
set) is host-side static analysis — exactly the analyse/factorize split
used throughout this framework; the numeric work per level is two MXU
GEMMs (C = Q_l' A_rest and the rank-k update A_rest -= Q_l C), so the
factorization is a short sequence of large matmuls instead of the
reference's entry-wise sparse updates.  ``miqr_apply`` /
``miqr_apply_transpose`` back-substitute through the level structure;
used as the right-preconditioner for LSTR/LSRT/L2RT Golub-Kahan runs
(the reference's purpose).
"""
from __future__ import annotations

import dataclasses
from typing import Any, List

import jax.numpy as jnp
import numpy as np

from ..core.config import control as control_dc


@control_dc
class MIQRControl:
    max_levels: int = 4
    angle_tol: float = 0.1       # |cos| threshold for "orthogonal enough"
    drop_tol: float = 1.0e-3     # drop fill below this relative size
    min_reduction: float = 0.1   # stop recursing if level selects < 10%


@dataclasses.dataclass
class MIQRFactors:
    """Per level: selected column indices, their (rescaled) R11 diagonal
    block (here: column norms, since selected columns are treated as
    orthogonal — the 'incomplete' part), and the coupling block R12.
    Final level: dense R of the remainder."""
    levels: List[Any]
    R_final: Any
    perm: Any            # column permutation (concatenated selections)
    n: int


def miqr_form(A, ctl: MIQRControl = MIQRControl()) -> MIQRFactors:
    """Build the multilevel incomplete R with A (m, n) dense (host+device
    mix; returns device arrays inside a static level structure)."""
    A = np.asarray(A, np.float64)
    m, n = A.shape
    levels = []
    remaining = np.arange(n)
    work = A.copy()

    for _ in range(ctl.max_levels):
        k = work.shape[1]
        if k == 0:
            break
        norms = np.linalg.norm(work, axis=0)
        norms = np.where(norms > 0, norms, 1.0)
        W = work / norms
        # greedy independent set under the angle threshold
        order = np.argsort(-norms)
        sel: list[int] = []
        G = W.T @ W
        chosen = np.zeros(k, bool)
        for j in order:
            if all(abs(G[j, s]) <= ctl.angle_tol for s in sel):
                sel.append(int(j))
                chosen[j] = True
        if len(sel) < max(1, int(ctl.min_reduction * k)):
            break
        sel_idx = np.array(sel, np.int64)
        rest_idx = np.nonzero(~chosen)[0]
        Q = W[:, sel_idx]                        # treated as orthonormal
        C = Q.T @ work[:, rest_idx]              # R12 block
        C[np.abs(C) < ctl.drop_tol * norms[rest_idx][None, :]] = 0.0
        work = work[:, rest_idx] - Q @ C         # orthogonalized remainder
        levels.append(dict(
            cols=remaining[sel_idx],
            rest=remaining[rest_idx],
            d=jnp.asarray(norms[sel_idx]),
            R12=jnp.asarray(C),
        ))
        remaining = remaining[rest_idx]
        if remaining.size == 0:
            break

    if remaining.size:
        R_final = np.linalg.qr(work, mode="r")
        # guard rank deficiency
        dset = np.abs(np.diag(R_final))
        bad = dset < 1e-12 * max(dset.max(), 1.0)
        R_final[bad, bad] = 1.0
        R_final = jnp.asarray(R_final)
    else:
        R_final = jnp.zeros((0, 0))
    perm = np.concatenate([lv["cols"] for lv in levels] + [remaining]) \
        if levels or remaining.size else np.zeros(0, np.int64)
    perm = perm.astype(np.int64)

    # R12 columns were built in each level's local "rest" order; the
    # solves consume the trailing block in final perm order — reorder
    # the coupling blocks once here.
    offset = 0
    for lv in levels:
        offset += len(lv["cols"])
        tail = perm[offset:]
        lut = {int(c): i for i, c in enumerate(lv["rest"])}
        mapping = np.array([lut[int(c)] for c in tail], np.int64)
        lv["R12"] = lv["R12"][:, mapping]
    return MIQRFactors(levels=levels, R_final=R_final, perm=perm, n=n)


def miqr_apply(f: MIQRFactors, y):
    """x = R^-1 y (right-preconditioner apply).  y is in permuted
    coordinates produced by miqr_apply_transpose's output convention;
    both applies use the same static level structure."""
    y = jnp.asarray(y)
    x = jnp.zeros(f.n, y.dtype)
    # positions of each original column inside perm order
    pos = 0
    slots = []
    for lv in f.levels:
        kk = lv["cols"].shape[0]
        slots.append((pos, pos + kk))
        pos += kk
    nfin = f.n - pos

    # back substitution bottom-up: final dense block first
    if nfin:
        xf = jnp.linalg.solve(
            f.R_final, y[pos:pos + nfin]) if nfin else y[pos:pos]
    else:
        xf = jnp.zeros(0, y.dtype)
    x_rest = xf
    for lv, (a, b) in zip(reversed(f.levels), reversed(slots)):
        rhs = y[a:b] - lv["R12"] @ x_rest
        x_lvl = rhs / lv["d"]
        x_rest = jnp.concatenate([x_lvl, x_rest])
    x = x.at[f.perm].set(x_rest)
    return x


def miqr_apply_transpose(f: MIQRFactors, x):
    """y = R^-T x (the other triangular solve of the split
    preconditioned normal equations)."""
    x = jnp.asarray(x)
    xp = x[f.perm]
    out = []
    off = 0
    carry = xp
    for lv in f.levels:
        kk = lv["cols"].shape[0]
        head, carry = carry[:kk], carry[kk:]
        y_lvl = head / lv["d"]
        carry = carry - lv["R12"].T @ y_lvl
        out.append(y_lvl)
        off += kk
    if carry.shape[0]:
        y_fin = jnp.linalg.solve(f.R_final.T, carry)
        out.append(y_fin)
    return jnp.concatenate(out) if out else jnp.zeros(0, x.dtype)
