"""Limited-memory secant Hessians (L-BFGS / L-SR1), compact form.

TPU-native re-design of GALAHAD's LMS/LMT (reference src/lms/lms.f90:
LMS_setup/form/apply :283,509; methods :332-348 — 1=BFGS, 2=SR1,
3=inverse BFGS, 4=inverse shifted BFGS; types src/lmt/lmt.f90), built on
the Byrd-Nocedal-Schnabel compact representation the reference cites
(lms.f90:17-21).

Design: fixed-size ring buffers S, Y of shape (mem, n) inside a pytree;
slot validity is a boolean mask so updates and applies are pure,
jittable and vmap-able.  The small (2m x 2m) middle systems are dense
factorizations — exactly the reference's SYTRF of len_c x len_c blocks,
here batched MXU work.  The shifted apply B + lambda*I (method 4,
LMS_form_shift lms.f90:1082) is first-class because TR methods need it.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc


@control_dc
class LMSControl:
    memory: int = 10            # reference default 10 (lms.f90)
    method: str = "bfgs"        # "bfgs" | "sr1"


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["S", "Y", "valid", "head", "delta"],
    meta_fields=["method"],
)
@dataclasses.dataclass
class LMSData:
    """Persistent L-QN state (LMS_data_type equivalent)."""

    S: Any            # (mem, n) step history
    Y: Any            # (mem, n) gradient-difference history
    valid: Any        # (mem,) bool slot validity
    head: Any         # int32: next slot to overwrite
    delta: Any        # scalar: B0 = delta I scaling
    method: str = "bfgs"


def lms_setup(n: int, ctl: LMSControl = LMSControl(),
              dtype=jnp.float64) -> LMSData:
    mem = ctl.memory
    return LMSData(
        S=jnp.zeros((mem, n), dtype),
        Y=jnp.zeros((mem, n), dtype),
        valid=jnp.zeros((mem,), bool),
        head=jnp.array(0, jnp.int32),
        delta=jnp.array(1.0, dtype),
        method=ctl.method,
    )


def lms_update(data: LMSData, s, y, curvature_tol: float = 1.0e-8) -> LMSData:
    """Append a secant pair (s, y).  BFGS pairs with s'y too small are
    rejected (the reference's acceptance test); SR1 keeps every pair and
    relies on the apply-time safeguard.  delta = y'y / s'y (standard
    Barzilai-Borwein-style B0 scaling, as in LMS_form)."""
    sty = jnp.dot(s, y)
    ss = jnp.dot(s, s)
    yy = jnp.dot(y, y)
    ok = sty > curvature_tol * jnp.sqrt(ss * yy) if data.method == "bfgs" \
        else (ss > 0)
    mem = data.S.shape[0]
    idx = data.head % mem

    def do_update(d: LMSData) -> LMSData:
        return LMSData(
            S=d.S.at[idx].set(s),
            Y=d.Y.at[idx].set(y),
            valid=d.valid.at[idx].set(True),
            head=d.head + 1,
            delta=jnp.where(sty > 0, yy / sty, d.delta),
            method=d.method,
        )

    return jax.tree_util.tree_map(
        lambda new, old: jnp.where(ok, new, old), do_update(data), data
    )


def _masked_middle_bfgs(data: LMSData, shift):
    """Compact-form middle matrix for B = (delta+shift) I - W M^-1 W'.

    For B = delta I - [dS Y] [[dS'S, L], [L', -D]]^-1 [dS'; Y'],
    invalid slots are replaced by identity rows/cols (harmless: the
    corresponding W columns are zero)."""
    d = data.delta
    S, Y, v = data.S, data.Y, data.valid
    mem = S.shape[0]
    StS = S @ S.T
    StY = S @ Y.T
    # L: strictly lower triangle of S'Y in *chronological* order.
    age = (data.head - 1 - jnp.arange(mem)) % mem  # 0 = newest
    older = age[:, None] > age[None, :]            # pair i newer than j
    L = jnp.where(~older & v[:, None] & v[None, :], StY, 0.0)
    L = L - jnp.diag(jnp.diagonal(L))              # strictly lower (chron)
    D = jnp.diagonal(StY)
    M11 = d * StS
    top = jnp.concatenate([M11, L], axis=1)
    bot = jnp.concatenate([L.T, -jnp.diag(D)], axis=1)
    M = jnp.concatenate([top, bot], axis=0)
    vv = jnp.concatenate([v, v])
    M = jnp.where(vv[:, None] & vv[None, :], M, 0.0)
    M = M + jnp.diag(jnp.where(vv, 0.0, 1.0))
    W = jnp.concatenate([d * S, Y], axis=0)        # (2mem, n)
    W = jnp.where(vv[:, None], W, 0.0)
    return W, M


def lms_apply(data: LMSData, v, shift=0.0):
    """w = (B + shift I) v — the TR-shifted Hessian action
    (reference method 4 / LMS_form_shift)."""
    if data.method == "sr1":
        return _sr1_apply(data, v, shift)
    W, M = _masked_middle_bfgs(data, shift)
    Wv = W @ v
    sol = jnp.linalg.solve(M, Wv)
    return (data.delta + shift) * v - W.T @ sol


def _sr1_apply(data: LMSData, v, shift=0.0):
    """Compact SR1: B = d I + (Y - d S)(D + L + L' - d S'S)^-1 (Y - d S)'
    with the same masking scheme."""
    d = data.delta
    S, Y, vmask = data.S, data.Y, data.valid
    mem = S.shape[0]
    StY = S @ Y.T
    StS = S @ S.T
    age = (data.head - 1 - jnp.arange(mem)) % mem
    older = age[:, None] > age[None, :]
    L = jnp.where(~older & vmask[:, None] & vmask[None, :], StY, 0.0)
    L = L - jnp.diag(jnp.diagonal(L))
    D = jnp.diagonal(StY)
    M = jnp.diag(D) + L + L.T - d * StS
    M = jnp.where(vmask[:, None] & vmask[None, :], M, 0.0)
    # SR1 middle matrix may be singular; regularize tiny pivots
    M = M + jnp.diag(jnp.where(vmask, 0.0, 1.0))
    eps = jnp.finfo(v.dtype).eps
    M = M + jnp.eye(mem, dtype=v.dtype) * eps * (
        1.0 + jnp.max(jnp.abs(M))
    )
    U = Y - d * S
    U = jnp.where(vmask[:, None], U, 0.0)
    Uv = U @ v
    sol = jnp.linalg.solve(M, Uv)
    return (d + shift) * v + U.T @ sol


def lms_apply_inverse(data: LMSData, v):
    """H v with H = B^-1 by the two-loop recursion (method 3,
    inverse BFGS).  Fixed-trip loop over the ring buffer with masking."""
    if data.method != "bfgs":
        raise ValueError("inverse apply is defined for method='bfgs'")
    S, Y, valid = data.S, data.Y, data.valid
    mem = S.shape[0]
    rho = jnp.where(valid, 1.0 / jnp.maximum(
        jnp.sum(S * Y, axis=1), jnp.finfo(v.dtype).tiny), 0.0)
    # chronological order: newest first for loop 1
    age = (data.head - 1 - jnp.arange(mem)) % mem
    order = jnp.argsort(age)         # newest .. oldest

    def loop1(carry, i):
        q, alphas = carry
        j = order[i]
        a = rho[j] * jnp.dot(S[j], q)
        q = q - jnp.where(valid[j], a, 0.0) * Y[j]
        return (q, alphas.at[i].set(jnp.where(valid[j], a, 0.0))), None

    (q, alphas), _ = jax.lax.scan(
        loop1, (v, jnp.zeros((mem,), v.dtype)), jnp.arange(mem)
    )
    r = q / data.delta

    def loop2(r, i):
        k = mem - 1 - i
        j = order[k]
        b = rho[j] * jnp.dot(Y[j], r)
        r = r + jnp.where(valid[j], alphas[k] - b, 0.0) * S[j]
        return r, None

    r, _ = jax.lax.scan(loop2, r, jnp.arange(mem))
    return r
