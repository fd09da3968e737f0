"""Banded large-scale IPM path (LPB/CQP on banded structure).

The reference solves banded QPs (the QPBAND/LPBAND SIF family) through
sparse MA57/SSIDS factorizations; this module is the TPU-native
equivalent: problems carry banded operators in DIA storage
(linalg/band_ops.py) and every KKT solve is O(n b^2) block-tridiagonal
work (linalg/banded.py) — dense MXU blocks under a scan, no O(n^2)
memory anywhere.  The same ipm_step drives both paths: BandedQP plugs
its factorization in through the build_kkt hook.

KKT modes per structure (mirroring SBLS's decision tree, SURVEY §8.2):
  * m = 0, banded H         -> block-tridiagonal Cholesky of G = H + D_x;
  * diagonal/zero H         -> banded Schur complement
                               S = C + A G^-1 A' (band_ADAt) -> pbtr;
  * banded H and m > 0      -> preconditioned CG on S with the
                               diagonal-G pbtr Schur complement as
                               preconditioner and banded G solves inside
                               the operator (the reference's
                               SBLS_solve_iterative, sbls.f90:8762).
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..core.problem import classify_bounds
from ..linalg.band_ops import (
    BandMatrix,
    band_ADAt,
    sym_band_add_diag,
    sym_band_matvec,
    sym_band_to_blocks,
)
from ..linalg.banded import block_tridiag_cholesky, block_tridiag_solve
from .ipm import IPMControl, extract_solution, ipm_init, ipm_step

BIG = 1.0e20


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["h_diags", "g", "f", "A_band", "c_l", "c_u", "x_l", "x_u",
                 "x", "y", "z"],
    meta_fields=["name", "h_kind", "block", "cg_maxit"],
)
@dataclasses.dataclass
class BandedQP:
    """QP with banded H (symmetric DIA: h_diags[s, i] = H[i+s, i]) and
    banded A (BandMatrix).  Drop-in for QP in the IPM loop."""

    g: Any
    A_band: Any                  # BandMatrix or None
    c_l: Any
    c_u: Any
    x_l: Any
    x_u: Any
    h_diags: Any = None          # (wh+1, n) or None
    f: Any = 0.0
    x: Any = None
    y: Any = None
    z: Any = None
    name: str = ""
    h_kind: str = "banded"       # "banded" | "diagonal" | "zero"
    block: int = 8               # block-tridiagonal block size
    cg_maxit: int = 64

    @property
    def n(self) -> int:
        return self.g.shape[-1]

    @property
    def m(self) -> int:
        return self.A_band.m if self.A_band is not None else 0

    @property
    def A(self):                 # only touched by dense-path code
        return self.A_band.to_dense() if self.A_band is not None else None

    def dtype(self):
        return self.g.dtype

    def Ax(self, v):
        if self.m == 0:
            return jnp.zeros((0,), self.g.dtype)
        return self.A_band.matvec(v)

    def Aty(self, y):
        if self.m == 0:
            return jnp.zeros_like(self.g)
        return self.A_band.rmatvec(y)

    def Hx(self, v):
        if self.h_kind == "zero":
            return jnp.zeros_like(v)
        if self.h_kind == "diagonal":
            return self.h_diags[0] * v
        return sym_band_matvec(self.h_diags, v)

    def H_diag(self):
        if self.h_kind == "zero":
            return jnp.zeros_like(self.g)
        return self.h_diags[0]

    def objective(self, x):
        return 0.5 * jnp.vdot(x, self.Hx(x)) + jnp.vdot(self.g, x) + self.f

    # --- the KKT hook ipm_step dispatches on -------------------------
    def build_kkt(self, D_x, C_diag, ctl: IPMControl):
        n, m = self.n, self.m
        dt = self.g.dtype
        diag_G = self.h_kind in ("zero", "diagonal")

        if diag_G:
            Gd = self.H_diag() + D_x
            g_solve = lambda v: v / Gd
            apply_G = lambda v: Gd * v
        else:
            G_diags = self.h_diags.at[0].add(D_x)
            bsH = max(self.block, self.h_diags.shape[0] - 1)
            Dh, Lh = sym_band_to_blocks(G_diags, bsH)
            fH = block_tridiag_cholesky(Dh, Lh)
            kH, bH, _ = Dh.shape

            def g_solve(v):
                vp = jnp.zeros((kH * bH,), dt).at[:n].set(v)
                out = block_tridiag_solve(fH, vp.reshape(kH, bH))
                return out.reshape(-1)[:n]

            apply_G = lambda v: sym_band_matvec(G_diags, v) + 0.0

        if m == 0:
            def kkt_solve(b1, b2):
                return g_solve(b1), b2
            return kkt_solve

        if diag_G:
            # banded Schur complement, exact pbtr factorization
            Sd = band_ADAt(self.A_band, 1.0 / Gd)
            Sd = sym_band_add_diag(Sd, C_diag + ctl.delta)
            bs = max(self.block,
                     max(self.A_band.offsets) - min(self.A_band.offsets))
            Ds, Ls = sym_band_to_blocks(Sd, bs)
            fS = block_tridiag_cholesky(Ds, Ls)
            kS, bS, _ = Ds.shape

            def s_solve(r):
                rp = jnp.zeros((kS * bS,), dt).at[:m].set(r)
                out = block_tridiag_solve(fS, rp.reshape(kS, bS))
                return out.reshape(-1)[:m]
        else:
            # PCG on S = C + A G^-1 A' with diagonal-G preconditioner
            Gd_hat = self.H_diag() + D_x
            Sd_hat = band_ADAt(self.A_band, 1.0 / jnp.maximum(Gd_hat, 1e-12))
            Sd_hat = sym_band_add_diag(Sd_hat, C_diag + ctl.delta)
            bs = max(self.block,
                     max(self.A_band.offsets) - min(self.A_band.offsets))
            Ds, Ls = sym_band_to_blocks(Sd_hat, bs)
            fS = block_tridiag_cholesky(Ds, Ls)
            kS, bS, _ = Ds.shape

            def prec(r):
                rp = jnp.zeros((kS * bS,), dt).at[:m].set(r)
                out = block_tridiag_solve(fS, rp.reshape(kS, bS))
                return out.reshape(-1)[:m]

            def s_op(v):
                return C_diag * v + self.Ax(g_solve(self.Aty(v))) \
                    + ctl.delta * v

            def s_solve(r):
                x0 = prec(r)
                r0 = r - s_op(x0)
                z0 = prec(r0)
                p0 = z0
                rz0 = jnp.vdot(r0, z0)

                def body(i, st):
                    x, rr, z, p, rz = st
                    Ap = s_op(p)
                    alpha = rz / jnp.maximum(jnp.vdot(p, Ap), 1e-300)
                    x = x + alpha * p
                    rr = rr - alpha * Ap
                    z = prec(rr)
                    rz_new = jnp.vdot(rr, z)
                    p = z + (rz_new / jnp.maximum(rz, 1e-300)) * p
                    return x, rr, z, p, rz_new

                x, *_ = lax.fori_loop(0, self.cg_maxit, body,
                                      (x0, r0, z0, p0, rz0))
                return x

        def block_solve(r1, r2):
            w = g_solve(r1)
            dv = s_solve(self.Ax(w) - r2)
            dx = g_solve(r1 - self.Aty(dv))
            return dx, dv

        def kkt_solve(b1, b2):
            # solve [[G, A'],[A, -C]][x; v] = [b1; b2]; return (x, -v).
            # Refinement carries (x, v) as double-word pairs so f32
            # factors reach ~1e-6 KKT (linalg/dw.py, SURVEY §7.3).
            from ..linalg.dw import dw_add, two_sum

            x, v = block_solve(b1, b2)
            xl = jnp.zeros_like(x)
            vl = jnp.zeros_like(v)
            for _ in range(ctl.refine):
                r1h, r1l = two_sum(b1, -(apply_G(x) + self.Aty(v)))
                r2h, r2l = two_sum(b2, -(self.Ax(x) - C_diag * v))
                r1 = (r1h - (apply_G(xl) + self.Aty(vl))) + r1l
                r2 = (r2h - (self.Ax(xl) - C_diag * vl)) + r2l
                dx, dv = block_solve(r1, r2)
                x, xl = dw_add(x, xl, dx)
                v, vl = dw_add(v, vl, dv)
            return x + xl, -(v + vl)

        return kkt_solve


def ipm_solve_banded(qp: BandedQP, ctl: IPMControl = IPMControl()):
    """Host-loop banded IPM driver (same contract as ipm_solve)."""
    masks = classify_bounds(qp, ctl.infinity)
    st = ipm_init(qp, masks, ctl)
    step = jax.jit(lambda q, mk, s: ipm_step(q, mk, s, ctl))
    for _ in range(ctl.maxit):
        st = step(qp, masks, st)
        if bool(st.halt):
            break
    x, y, z = extract_solution(qp, masks, st)
    return x, y, z, st


def ipm_solve_banded_compiled(qp: BandedQP, ctl: IPMControl = IPMControl()):
    """Fully-compiled banded driver (lax.while_loop)."""
    masks = classify_bounds(qp, ctl.infinity)
    st0 = ipm_init(qp, masks, ctl)

    def cond(st):
        return (~st.halt) & (st.iter < ctl.maxit)

    def body(st):
        return ipm_step(qp, masks, st, ctl)

    st = lax.while_loop(cond, body, st0)
    x, y, z = extract_solution(qp, masks, st)
    return x, y, z, st
