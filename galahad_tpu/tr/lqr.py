"""LQR / LQT: trust-region and regularized subproblems by MINRES-style
Lanczos recurrences.

TPU-native re-design of GALAHAD's LQR/LQT packages (reference
src/lqr/lqr.f90, src/lqt/lqt.f90 — "new" solvers minimizing the
quadratic model over Krylov spaces with MINRES-like recurrences,
complementing GLTR's CG-like ones; useful when H is indefinite and the
residual norm, not the model value, drives the stop test).

Re-design: the shared Lanczos engine of tr/gltr.py builds the
tridiagonal T_k once; LQR then minimizes over the Krylov space
    lqr:  min  1/2 h'T h + gamma e1'h   s.t. ||h|| <= radius
    lqt:  min  1/2 h'T h + gamma e1'h + (sigma/3)||h||^3
exactly in the small space (batched eigen-secular TRS / RQS), while the
MINRES aspect — monitoring ||H x + b|| rather than the CG objective —
is exposed via the returned residual norm, computed from the Lanczos
relation ||Hx+b|| = |beta_{k+1} e_k' h| without extra matvecs.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from ..core.config import control as control_dc
from .gltr import _lanczos
from .trs import TRSControl, _trs_from_eigen, rqs_solve


@control_dc
class LQRControl:
    itmax: int = 64
    stop_relative: float = 1.0e-8
    stop_absolute: float = 0.0


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "obj", "multiplier", "iter", "norm_x", "resid"],
    meta_fields=[],
)
@dataclasses.dataclass
class LQRInfo:
    x: Any
    obj: Any
    multiplier: Any
    iter: Any
    norm_x: Any
    resid: Any        # MINRES residual ||Hx + b|| estimate


def _krylov_setup(matvec, b, prec, ctl):
    if prec is None:
        prec = lambda v: v
    itmax = ctl.itmax
    V, alphas, betas, gamma0, k = _lanczos(
        matvec, -b, prec, itmax, ctl.stop_relative, ctl.stop_absolute)
    idx = jnp.arange(itmax)
    active = idx < k
    diag = jnp.where(active, alphas, 1.0e12)
    off = jnp.where(idx[:-1] < k - 1, betas[:-1], 0.0)
    T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    # _lanczos runs on -b, so b = -gamma0 * v1 and the reduced linear
    # term is b'(V'h) = -gamma0 * h1 (same convention as gltr.py).
    c_t = jnp.zeros((itmax,), b.dtype).at[0].set(-gamma0)
    return V, T, c_t, betas, gamma0, k, active


def _finish(V, h, T, c_t, betas, k, active, lam):
    h = jnp.where(active, h, 0.0)
    x = V.T @ h
    obj = 0.5 * h @ (T @ h) + c_t @ h
    # Lanczos relation: residual of (T + lam) h = -c_t extended to H:
    # ||Hx + lam x + b|| = beta_{k} |h_{k-1}| (next off-diagonal)
    last = jnp.clip(k - 1, 0, h.shape[0] - 1)
    resid = jnp.abs(betas[last] * h[last])
    return x, obj, resid


def lqr_solve(matvec: Callable, b, radius, prec: Callable | None = None,
              ctl: LQRControl = LQRControl(),
              trs_ctl: TRSControl = TRSControl()) -> LQRInfo:
    """min 1/2 x'Hx + b'x s.t. ||x||_M <= radius over the Krylov space
    (LQR_solve equivalent, reference src/lqr/lqr.f90)."""
    b = jnp.asarray(b)
    V, T, c_t, betas, gamma0, k, active = _krylov_setup(matvec, b, prec, ctl)
    lam_eig, Q = jnp.linalg.eigh(T)
    ct_eig = Q.T @ c_t
    info = _trs_from_eigen(lam_eig, ct_eig, jnp.asarray(radius, b.dtype),
                           lambda w: Q @ w, trs_ctl)
    h = info.x
    x, obj, resid = _finish(V, h, T, c_t, betas, k, active, info.multiplier)
    return LQRInfo(x=x, obj=obj, multiplier=info.multiplier, iter=k,
                   norm_x=jnp.linalg.norm(h), resid=resid)


def lqt_solve(matvec: Callable, b, sigma, p: float = 3.0,
              prec: Callable | None = None,
              ctl: LQRControl = LQRControl()) -> LQRInfo:
    """min 1/2 x'Hx + b'x + (sigma/p)||x||_M^p over the Krylov space
    (LQT_solve equivalent, reference src/lqt/lqt.f90)."""
    b = jnp.asarray(b)
    V, T, c_t, betas, gamma0, k, active = _krylov_setup(matvec, b, prec, ctl)
    info = rqs_solve(T, c_t, sigma, p=p)
    h = info.x
    x, obj, resid = _finish(V, h, T, c_t, betas, k, active, info.multiplier)
    return LQRInfo(x=x, obj=obj, multiplier=info.multiplier, iter=k,
                   norm_x=jnp.linalg.norm(h), resid=resid)
