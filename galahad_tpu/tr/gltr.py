"""GLTR / GLRT: Krylov (Lanczos) trust-region and regularization solvers.

TPU-native re-design of GALAHAD's GLTR (reference src/gltr/gltr.f90:
GLTR_solve :611, reverse-communication statuses 2/3 :611-640,
tridiagonal boundary solves via PTTRF/STERF :26-29,50) and GLRT
(src/glrt/glrt.f90:555).

Key re-designs:
  * Reverse communication becomes first-class closures: the caller
    passes ``matvec`` (H·v) and optional ``prec`` (M^-1·v) callables —
    both jit-traceable, so the whole solver compiles into one XLA
    program (SURVEY §7.1).
  * The Lanczos recurrence runs under ``lax.while_loop`` with a static
    maximum dimension; basis vectors live in a fixed (maxit, n) buffer.
  * The boundary subproblem min 1/2 h'T h + gamma e1'h, ||h|| <= radius
    on the accumulated tridiagonal T is solved *exactly* by the batched
    eigen-secular TRS (tr/trs.py), replacing the reference's
    PTTRF-based secular iteration; this covers interior and boundary
    cases uniformly.

The trust-region norm is the preconditioner norm ||x||_M (as in the
reference): in Lanczos coordinates it is the Euclidean norm of h.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from .trs import TRSControl, _trs_from_eigen, rqs_solve


@control_dc
class GLTRControl:
    itmax: int = 64                # static Krylov-space cap
    stop_relative: float = 1.0e-8
    stop_absolute: float = 0.0
    steihaug_toint: bool = False   # if True, stop at first boundary hit


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "obj", "multiplier", "iter", "norm_x", "converged",
                 "negative_curvature"],
    meta_fields=[],
)
@dataclasses.dataclass
class GLTRInfo:
    x: Any
    obj: Any
    multiplier: Any
    iter: Any
    norm_x: Any
    converged: Any
    negative_curvature: Any


def _lanczos(matvec, b, prec, itmax, tol_rel, tol_abs):
    """Run (preconditioned) Lanczos on H starting from b.

    Returns (V, alphas, betas, gamma0, k, neg_curv) where
    T = tridiag(diag=alphas, off=betas[1:k]) is k x k, V rows are the
    M^-1-orthonormal basis (premultiplied by M^-1), and b = gamma0 * M v1.
    Derived from the CG/Lanczos equivalence the reference exploits
    (gltr.f90 recurrences).
    """
    n = b.shape[-1]
    dt = b.dtype

    pb = prec(b)
    gamma0 = jnp.sqrt(jnp.vdot(b, pb).real.astype(dt))

    def state0():
        V = jnp.zeros((itmax, n), dt)       # M^-1-side vectors w_j = M^-1 u_j
        U = jnp.zeros((itmax, n), dt)       # u_j (M-side)
        u1 = b / jnp.where(gamma0 > 0, gamma0, 1.0)
        w1 = pb / jnp.where(gamma0 > 0, gamma0, 1.0)
        V = V.at[0].set(w1)
        U = U.at[0].set(u1)
        alphas = jnp.zeros((itmax,), dt)
        betas = jnp.zeros((itmax,), dt)
        return (V, U, alphas, betas, jnp.array(0, jnp.int32),
                jnp.array(False), jnp.array(gamma0, dt))

    def cond(st):
        V, U, alphas, betas, k, done, res = st
        return (~done) & (k < itmax)

    def body(st):
        V, U, alphas, betas, k, done, res = st
        w = V[k]          # current M^-1 u_k
        u = U[k]
        Hw = matvec(w)
        alpha = jnp.vdot(w, Hw).real.astype(w.dtype)
        # three-term recurrence: r = H w - alpha u - beta_k u_{k-1}
        u_prev = jnp.where(k > 0, U[jnp.maximum(k - 1, 0)], jnp.zeros_like(u))
        beta_prev = jnp.where(k > 0, betas[jnp.maximum(k - 1, 0)], 0.0)
        r = Hw - alpha * u - beta_prev * u_prev
        pr = prec(r)
        beta = jnp.sqrt(jnp.maximum(jnp.vdot(r, pr).real.astype(w.dtype), 0.0))
        alphas = alphas.at[k].set(alpha)
        betas = betas.at[k].set(beta)
        k1 = k + 1
        ok_next = (beta > 1e-14) & (k1 < itmax)
        V = jnp.where(ok_next, V.at[k1 % itmax].set(pr / jnp.where(beta > 0, beta, 1.0)), V)
        U = jnp.where(ok_next, U.at[k1 % itmax].set(r / jnp.where(beta > 0, beta, 1.0)), U)
        done = beta <= 1e-14
        return V, U, alphas, betas, k1, done, res

    V, U, alphas, betas, k, done, gamma = lax.while_loop(cond, body, state0())
    return V, alphas, betas, gamma, k


def gltr_solve(
    matvec: Callable,
    b: jnp.ndarray,
    radius,
    prec: Callable | None = None,
    ctl: GLTRControl = GLTRControl(),
    trs_ctl: TRSControl = TRSControl(),
) -> GLTRInfo:
    """Approximately minimize 1/2 x'Hx + b'x subject to ||x||_M <= radius
    over the order-``ctl.itmax`` Krylov space.  H enters only through
    ``matvec``; the preconditioner through ``prec`` (M^-1 action)."""
    if prec is None:
        prec = lambda v: v
    dt = b.dtype
    itmax = ctl.itmax
    V, alphas, betas, gamma0, k = _lanczos(
        matvec, -b, prec, itmax, ctl.stop_relative, ctl.stop_absolute
    )

    # Build the padded tridiagonal T as a dense (itmax, itmax) matrix:
    # active block = T_k, padded tail = huge diagonal so it contributes
    # nothing to the TRS solution.
    idx = jnp.arange(itmax)
    active = idx < k
    diag = jnp.where(active, alphas, 1.0e12)
    off = jnp.where(idx[:-1] < k - 1, betas[:-1], 0.0)
    T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    rhs = jnp.zeros((itmax,), dt).at[0].set(-gamma0)  # model lin term = gamma0 e1... sign below

    # model in h: 1/2 h'T h + gamma0 e1'h  (since -b = gamma0 u1)
    # we minimized with b: m(x) = 1/2 x'Hx + b'x, x = sum h_j w_j,
    # b'x = -gamma0 h_1.
    lamT, Q = jnp.linalg.eigh(T)
    ct = Q.T @ jnp.zeros((itmax,), dt).at[0].set(-gamma0)
    info_h = _trs_from_eigen(lamT, ct, jnp.asarray(radius, dt), lambda w: Q @ w,
                             trs_ctl)
    h = info_h.x
    x = jnp.einsum("kn,k->n", V, h)
    obj = info_h.obj
    neg = jnp.min(jnp.where(active, alphas, jnp.inf)) < 0  # cheap indicator
    return GLTRInfo(
        x=x, obj=obj, multiplier=info_h.multiplier,
        iter=k, norm_x=info_h.norm_x,
        converged=jnp.array(True),
        negative_curvature=~info_h.interior,
    )


@control_dc
class GLRTControl:
    itmax: int = 64
    stop_relative: float = 1.0e-8


def glrt_solve(
    matvec: Callable,
    b: jnp.ndarray,
    sigma,
    p: float = 3.0,
    prec: Callable | None = None,
    ctl: GLRTControl = GLRTControl(),
) -> GLTRInfo:
    """Regularized analogue (GLRT): min 1/2 x'Hx + b'x + (sigma/p)||x||_M^p
    over the Krylov space (reference src/glrt/glrt.f90:555)."""
    if prec is None:
        prec = lambda v: v
    dt = b.dtype
    itmax = ctl.itmax
    V, alphas, betas, gamma0, k = _lanczos(
        matvec, -b, prec, itmax, ctl.stop_relative, 0.0
    )
    idx = jnp.arange(itmax)
    active = idx < k
    diag = jnp.where(active, alphas, 1.0e12)
    off = jnp.where(idx[:-1] < k - 1, betas[:-1], 0.0)
    T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    c1 = jnp.zeros((itmax,), dt).at[0].set(-gamma0)
    info_h = rqs_solve(T, c1, sigma, p=p)
    h = info_h.x
    x = jnp.einsum("kn,k->n", V, h)
    return GLTRInfo(
        x=x, obj=info_h.obj, multiplier=info_h.multiplier,
        iter=k, norm_x=info_h.norm_x,
        converged=jnp.array(True),
        negative_curvature=jnp.array(False),
    )
