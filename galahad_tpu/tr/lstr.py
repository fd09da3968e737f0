"""Golub-Kahan least-squares Krylov solvers: LSTR / LSRT / L2RT.

TPU-native re-design of GALAHAD's LSTR (reference src/lstr/lstr.f90:
LSTR_solve :538, reverse communication u <- A v, v <- A' u), LSRT
(src/lsrt/lsrt.f90:541) and L2RT (src/l2rt/l2rt.f90:541).

  LSTR:  min ||A x - b||_2          s.t. ||x|| <= radius
  LSRT:  min 1/2||A x - b||^2 + (sigma/p)||x||^p
  L2RT:  min   ||A x - b||_2  + mu/2||x||^2 + (sigma/p)||x||^p

Reverse communication becomes closures ``matvec`` (A·v) and ``rmatvec``
(Aᵀ·u); the lower-bidiagonal projected problems are solved exactly
through the eigen-secular machinery of tr/trs.py on the (small, static
itmax-sized) tridiagonal AᵀA projection — replacing the reference's
specialised bidiagonal secular iterations with one uniform batched
kernel.  Everything runs under lax.while_loop with fixed maximum
dimension and is vmap-able over problem batches.
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
class LSTRControl:
    itmax: int = 64
    stop_relative: float = 1.0e-10


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["x", "obj", "multiplier", "iter", "norm_x", "r_norm"],
    meta_fields=[],
)
@dataclasses.dataclass
class LSTRInfo:
    x: Any
    obj: Any          # value of the solved subproblem objective
    multiplier: Any
    iter: Any
    norm_x: Any
    r_norm: Any       # ||A x - b||


def _golub_kahan(matvec, rmatvec, b, itmax):
    """Lower-bidiagonalization of A with starting vector b
    (Paige-Saunders):  beta_1 u_1 = b,  alpha_i v_i = A'u_i - beta_i v_{i-1},
    beta_{i+1} u_{i+1} = A v_i - alpha_i u_i.

    Returns (V, alphas, betas, beta1, k): V is (itmax, n) rows v_i;
    B_k is the (k+1) x k lower bidiagonal [alphas; betas_{2..k+1}]."""
    dt = b.dtype
    beta1 = jnp.linalg.norm(b)
    u = b / jnp.where(beta1 > 0, beta1, 1.0)
    n = rmatvec(u).shape[-1]

    def state0():
        V = jnp.zeros((itmax, n), dt)
        alphas = jnp.zeros((itmax,), dt)
        betas = jnp.zeros((itmax,), dt)   # beta_{i+1} values
        v_prev = jnp.zeros((n,), dt)
        return (V, alphas, betas, u, v_prev, jnp.array(0, jnp.int32),
                jnp.array(False))

    def cond(st):
        V, alphas, betas, u, v_prev, k, done = st
        return (~done) & (k < itmax)

    def body(st):
        V, alphas, betas, u, v_prev, k, done = st
        w = rmatvec(u) - jnp.where(k > 0, betas[jnp.maximum(k - 1, 0)], 0.0) \
            * v_prev
        alpha = jnp.linalg.norm(w)
        v = w / jnp.where(alpha > 0, alpha, 1.0)
        p = matvec(v) - alpha * u
        beta = jnp.linalg.norm(p)
        u_new = p / jnp.where(beta > 0, beta, 1.0)
        V = V.at[k].set(v)
        alphas = alphas.at[k].set(alpha)
        betas = betas.at[k].set(beta)
        tiny = jnp.asarray(1e-14, dt)
        done = (alpha <= tiny) | (beta <= tiny)
        return V, alphas, betas, u_new, v, k + 1, done

    V, alphas, betas, u, v_prev, k, done = lax.while_loop(cond, body, state0())
    return V, alphas, betas, beta1, k


def _projected_normal(alphas, betas, beta1, k, itmax, dt):
    """T = B'B (tridiagonal, padded) and c = -B'(beta1 e1) for the
    projected problem min 1/2 y'Ty + c'y [+ const]."""
    idx = jnp.arange(itmax)
    active = idx < k
    a = jnp.where(active, alphas, 0.0)
    be = jnp.where(active, betas, 0.0)
    diag = a * a + be * be
    diag = jnp.where(active, diag, 1.0e12)         # freeze padded tail
    off = a[1:] * be[:-1]
    off = jnp.where(idx[:-1] < k - 1, off, 0.0)
    T = jnp.diag(diag) + jnp.diag(off, 1) + jnp.diag(off, -1)
    c = jnp.zeros((itmax,), dt).at[0].set(-alphas[0] * beta1)
    return T, c


def lstr_solve(
    matvec: Callable,
    rmatvec: Callable,
    b,
    radius,
    ctl: LSTRControl = LSTRControl(),
) -> LSTRInfo:
    """min ||Ax - b|| s.t. ||x|| <= radius over the order-itmax Krylov
    space of A'A (exact for k >= rank)."""
    dt = b.dtype
    itmax = ctl.itmax
    V, alphas, betas, beta1, k = _golub_kahan(matvec, rmatvec, b, itmax)
    T, c = _projected_normal(alphas, betas, beta1, k, itmax, dt)
    lam, Q = jnp.linalg.eigh(T)
    ct = Q.T @ c
    info = _trs_from_eigen(lam, ct, jnp.asarray(radius, dt),
                           lambda w: Q @ w, TRSControl())
    y = info.x
    x = jnp.einsum("kn,k->n", V, y)
    # ||Ax-b||^2 = ||b||^2 + 2 (1/2 y'Ty + c'y)  (since T=B'B, c=-B'b)
    rsq = jnp.maximum(beta1**2 + 2.0 * info.obj, 0.0)
    return LSTRInfo(
        x=x, obj=jnp.sqrt(rsq), multiplier=info.multiplier,
        iter=k, norm_x=info.norm_x, r_norm=jnp.sqrt(rsq),
    )


@control_dc
class LSRTControl:
    itmax: int = 64


def lsrt_solve(
    matvec: Callable,
    rmatvec: Callable,
    b,
    sigma,
    p: float = 2.0,
    ctl: LSRTControl = LSRTControl(),
) -> LSTRInfo:
    """min 1/2||Ax - b||^2 + (sigma/p)||x||^p (reference lsrt.f90:541).

    p = 2 is plain Tikhonov (solved directly in eigen-coords); p > 2 via
    the RQS secular solver on the projected problem."""
    dt = b.dtype
    itmax = ctl.itmax
    V, alphas, betas, beta1, k = _golub_kahan(matvec, rmatvec, b, itmax)
    T, c = _projected_normal(alphas, betas, beta1, k, itmax, dt)
    if p == 2.0:
        lam, Q = jnp.linalg.eigh(T)
        ct = Q.T @ c
        y_w = -ct / (lam + sigma)
        y = Q @ y_w
        obj = 0.5 * jnp.sum(lam * y_w**2) + jnp.sum(ct * y_w)
        nx = jnp.linalg.norm(y)
        mult = jnp.asarray(sigma, dt)
        reg = 0.5 * sigma * nx**2
    else:
        info = rqs_solve(T, c, sigma, p=p)
        y, nx, mult = info.x, info.norm_x, info.multiplier
        reg = (sigma / p) * nx**p
        obj = info.obj - reg
    x = jnp.einsum("kn,k->n", V, y)
    rsq = jnp.maximum(beta1**2 + 2.0 * obj, 0.0)
    return LSTRInfo(
        x=x, obj=0.5 * rsq + reg, multiplier=mult,
        iter=k, norm_x=nx, r_norm=jnp.sqrt(rsq),
    )


@control_dc
class L2RTControl:
    itmax: int = 64
    newton_its: int = 48


def l2rt_solve(
    matvec: Callable,
    rmatvec: Callable,
    b,
    sigma,
    p: float = 3.0,
    mu: float = 0.0,
    ctl: L2RTControl = L2RTControl(),
) -> LSTRInfo:
    """min ||Ax - b||_2 + mu/2 ||x||^2 + (sigma/p)||x||^p
    (reference l2rt.f90:541).

    Optimality: (A'A + nu I) x = A'b with
        nu = mu*||r|| + sigma*||x||^{p-2}*||r||,   r = Ax - b
    (from scaling the gradient by ||r||).  Solved on the projected
    tridiagonal by a damped fixed-point iteration on nu in eigen-coords
    (each evaluation is O(itmax))."""
    dt = b.dtype
    itmax = ctl.itmax
    V, alphas, betas, beta1, k = _golub_kahan(matvec, rmatvec, b, itmax)
    T, c = _projected_normal(alphas, betas, beta1, k, itmax, dt)
    lam, Q = jnp.linalg.eigh(T)
    ct = Q.T @ c

    def norms_at(nu):
        yw = -ct / (lam + nu)
        nx = jnp.linalg.norm(yw)
        model = 0.5 * jnp.sum(lam * yw**2) + jnp.sum(ct * yw)
        rn = jnp.sqrt(jnp.maximum(beta1**2 + 2.0 * model, 0.0))
        return yw, nx, rn

    def body(i, nu):
        yw, nx, rn = norms_at(nu)
        target = mu * rn + sigma * jnp.maximum(nx, 1e-30) ** (p - 2.0) * rn
        return 0.5 * (nu + target)     # damped fixed point

    nu0 = jnp.asarray(mu * beta1 + sigma * beta1 + 1e-8, dt)
    nu = lax.fori_loop(0, ctl.newton_its, body, nu0)
    yw, nx, rn = norms_at(nu)
    y = Q @ yw
    x = jnp.einsum("kn,k->n", V, y)
    obj = rn + 0.5 * mu * nx**2 + (sigma / p) * nx**p
    return LSTRInfo(
        x=x, obj=obj, multiplier=nu, iter=k, norm_x=nx, r_norm=rn,
    )
