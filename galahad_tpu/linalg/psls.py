"""Definite preconditioners for trust-region methods (PSLS equivalent).

TPU-native version of GALAHAD's PSLS (reference src/psls/psls.f90:
preconditioner menu :89-130 — diagonal, band, full, Lin-More ICFS,
MI28 —; PSLS_form_and_factorize :711, PSLS_apply :4090).

Menu here: "none" | "diagonal" | "band" (block-tridiagonal Cholesky of
the banded part) | "full" (shifted dense Cholesky).  Each build returns
an apply closure M^-1 v for GLTR/TRU (psls_apply equivalent), made
positive definite by diagonal shifting when needed (the reference's
modified-factorization escape).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..core.config import control as control_dc
from .banded import block_tridiag_cholesky, block_tridiag_solve
from .cholesky import chol_factor_shifted, chol_solve


@control_dc
class PSLSControl:
    preconditioner: str = "diagonal"   # "none"|"diagonal"|"band"|"full"
    semi_bandwidth: int = 5            # reference default
    min_diagonal: float = 1.0e-5       # diagonal floor (psls control)


def psls_build(H, ctl: PSLSControl = PSLSControl()):
    """Return apply(v) ~ M^-1 v for the selected preconditioner of the
    dense symmetric H."""
    kind = ctl.preconditioner
    if kind == "none":
        return lambda v: v

    H = jnp.asarray(H)
    n = H.shape[-1]

    if kind == "diagonal":
        d = jnp.maximum(jnp.diagonal(H, axis1=-2, axis2=-1),
                        ctl.min_diagonal)
        return lambda v: v / d

    if kind == "band":
        b = max(ctl.semi_bandwidth, 1)
        k = -(-n // b)
        npad = k * b
        i = jnp.arange(npad)
        Hp = jnp.zeros((npad, npad), H.dtype).at[:n, :n].set(H)
        Hp = jnp.where(jnp.abs(i[:, None] - i[None, :]) > b, 0.0, Hp)
        Hp = Hp.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)
        # diagonal shift until the banded part is SPD
        base = jnp.maximum(ctl.min_diagonal, 0.0)
        D = jnp.stack([Hp[j * b:(j + 1) * b, j * b:(j + 1) * b]
                       for j in range(k)])
        L = jnp.stack([Hp[(j + 1) * b:(j + 2) * b, j * b:(j + 1) * b]
                       for j in range(k - 1)]) if k > 1 else jnp.zeros(
            (0, b, b), H.dtype)
        f = block_tridiag_cholesky(D, L)
        # fall back to a shifted variant if not SPD
        shift = jnp.sum(jnp.abs(Hp), axis=1).max() * 1e-8 + 1e-8
        D2 = D + shift * jnp.eye(b, dtype=H.dtype)
        f2 = block_tridiag_cholesky(D2, L)

        def apply(v):
            vp = jnp.zeros((npad,), v.dtype).at[:n].set(v)
            blocks = vp.reshape(k, b)
            x1 = block_tridiag_solve(f, blocks).reshape(npad)
            x2 = block_tridiag_solve(f2, blocks).reshape(npad)
            x = jnp.where(f.ok, x1, x2)
            return x[:n]

        return apply

    if kind == "full":
        L, _, ok = chol_factor_shifted(H, 0.0)
        return lambda v: chol_solve(L, v)

    raise ValueError(f"unknown preconditioner {kind!r}")
