"""Pallas TPU kernels for the supernodal numeric factorization.

TPU-native replacement of the reference's dense partial-factorization
kernels — the CPU blocked app-style LDL^T (reference
src/ssids/cpu/kernels/ldlt_app.cxx:40, block_ldlt.hxx) and the CUDA
multiblock partial LL^T/LDL^T (src/spral/dense_factor.cu:22-35) —
SURVEY §2.6 native checklist items 1-2.

Design (left-looking, batched over G fronts per grid program):

  * The whole (G, Fpad, Fpad) tile of SYMMETRIC fronts stays
    VMEM-resident through the entire elimination — the XLA composition
    (supernodal._blocked_partial_ldlt) re-reads the level from HBM on
    every panel step.
  * LEFT-LOOKING: column j is updated by all previous columns with ONE
    batched MXU matvec  L_store @ (d ∘ L_store[j, :])  — the O(n^2)
    work per column rides the MXU, not the VPU; the trailing Schur
    complement is ONE batched MXU SYRK at the end.
  * Mosaic constraint shaping: no lane/sublane slicing anywhere —
    column j is extracted by lane masking + reduction, its scalar d is
    re-broadcast through two rank-1 outer products (tiny MXU ops), and
    the per-front eliminated-column count arrives as a (G, 8, Fpad)
    mask plane (TPU block shapes cannot carry bare integer vectors).
    Shapes of the form (G, 1, 1) crash Mosaic layout inference and are
    avoided throughout.

The kernel serves fronts with Fpad <= MAX_PALLAS_FRONT; the rare large
fronts near the root keep the XLA blocked path, whose big batched MXU
SYRKs are already efficient there.

MEASURED RESULT (v5e single chip, 2026-08): the kernel is correct
(matches the XLA path to f32 rounding) but LOSES to the XLA blocked
composition on the realistic level shapes — e.g. nb=2048, Fpad=64,
cmax=32: XLA 2.1 ms (260 GFLOP/s) vs Pallas 15.2 ms (35 GFLOP/s).
Root cause: the elimination's sequential column dependency makes each
grid program latency-bound on ~10 small vector ops per column, and
Mosaic's stack allocation of loop temporaries (~50x the tile size)
caps the fronts-per-program at ~8, so the kernel cannot amortize op
latency across the level the way XLA's (nb, Fpad, B)-wide panel ops
do; the HBM traffic XLA pays per panel is cheaper than that latency at
these sizes.  Kept opt-in (GALAHAD_TPU_PALLAS=1) as the base for a
future revisit (candidate fix: double-buffered tile pipeline with
in-kernel DMA so one program streams the whole level).

Storage contract (consumed by supernodal_solve / extend-add): column
j < ncols holds d_j on the diagonal and L below it; entries ABOVE the
diagonal of eliminated columns are unspecified; the trailing square
holds the Schur update in both triangles.
"""
from __future__ import annotations

import functools

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

MAX_PALLAS_FRONT = 128


def _bdot(a, b, contract_a: int, contract_b: int):
    """Batched (leading-dim) dot_general on the MXU."""
    return lax.dot_general(
        a, b, (((contract_a,), (contract_b,)), ((0,), (0,))),
        preferred_element_type=jnp.float32).astype(a.dtype)


def _ldlt_kernel(m_ref, F_ref, out_ref, *, cmax: int, Fpad: int, G: int):
    dt = out_ref.dtype
    tiny = jnp.asarray(np.finfo(np.dtype(dt.name)).tiny * 16, dt)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, Fpad, 1), 1)
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, Fpad), 2)
    f = F_ref[:, :, :]
    # (G, 1, Fpad) eliminated-lane mask from the 8-replicated plane
    m1row = jnp.sum(m_ref[:, :, :], axis=1, keepdims=True) * jnp.asarray(
        0.125, dt)
    ones_col = jnp.ones((G, Fpad, 1), dt)
    # (G, Fpad, 1) twin of the mask via outer product + diagonal pick
    Om = _bdot(ones_col, m1row, 2, 1)                 # rows = m1row
    m1col = jnp.sum(jnp.where(rows == cols, Om, 0.0), axis=2,
                    keepdims=True)

    def col_step(j, carry):
        Ls, D = carry
        csel = jnp.where(cols == j, m1row, 0.0)       # (G, 1, Fpad)
        col0 = jnp.sum(f * csel, axis=2, keepdims=True)      # (G, Fpad, 1)
        rowj = jnp.sum(jnp.where(rows == j, Ls, 0.0), axis=1,
                       keepdims=True)                 # (G, 1, Fpad) = l[j,:]
        w = rowj * D                                  # d_k l[j,k]
        coln = col0 - _bdot(Ls, w, 2, 2)              # MXU column update
        # d = coln[j] re-broadcast: lane j row vector, then all-rows col
        O1 = _bdot(coln, csel, 2, 1)                  # col j of O1 = coln
        drow = jnp.sum(jnp.where(rows == j, O1, 0.0), axis=1,
                       keepdims=True)                 # lane j = d, else 0
        O2 = _bdot(ones_col, drow, 2, 1)
        d_rep = jnp.sum(jnp.where(cols == j, O2, 0.0), axis=2,
                        keepdims=True)                # (G, Fpad, 1) = d
        dn = jnp.where(jnp.abs(d_rep) > tiny, d_rep, 1.0)
        l = jnp.where(rows > j, coln / dn, 0.0)
        newcol = jnp.where(rows == j, d_rep, l)
        Ls = jnp.where((cols == j) & (rows >= j), newcol, Ls)
        return Ls, D + drow

    Ls, D = lax.fori_loop(
        0, cmax, col_step,
        (jnp.zeros((G, Fpad, Fpad), dt), jnp.zeros((G, 1, Fpad), dt)))

    # trailing Schur complement: ONE batched MXU SYRK
    Ld = jnp.where(rows > cols, Ls, 0.0)              # strict-lower L
    T = _bdot(Ld * D, Ld, 2, 2)
    trail = ((m1col < 0.5) & (m1row < 0.5))           # rows,cols >= ncols
    fout = f - jnp.where(trail, T, 0.0)
    elim = (m1row > 0.5) & (rows >= cols)
    out_ref[:, :, :] = jnp.where(elim, Ls, fout)


def _group_size(nb: int, Fpad: int) -> int:
    """Fronts per grid program: ~0.5 MB tiles (f, L-store, and Mosaic
    temporaries each cost one); multiple of 8 for sublane tiling."""
    g = max(8, ((128 << 10) // (Fpad * Fpad * 4)) // 8 * 8)
    return int(min(max(8, -(-nb // 8) * 8), g))


@functools.partial(jax.jit, static_argnames=("cmax", "B", "interpret"))
def partial_ldlt_pallas(F, ncols, cmax: int, B: int = 0,
                        interpret: bool = False):
    """Batched partial LDL^T of padded SYMMETRIC fronts (same
    eliminated-column / trailing-Schur contract as
    supernodal._blocked_partial_ldlt; B unused, kept for signature
    parity)."""
    del B
    nb0, Fpad, _ = F.shape
    G = _group_size(nb0, Fpad)
    pad = (-nb0) % G
    if pad:
        F = jnp.concatenate(
            [F, jnp.zeros((pad, Fpad, Fpad), F.dtype)], axis=0)
        ncols = jnp.concatenate(
            [jnp.asarray(ncols, jnp.int32), jnp.zeros(pad, jnp.int32)])
    nb = nb0 + pad
    ncv = jnp.asarray(ncols, jnp.int32)
    mask = (jnp.arange(Fpad, dtype=jnp.int32)[None, None, :]
            < ncv[:, None, None]).astype(F.dtype)
    mask = jnp.broadcast_to(mask, (nb, 8, Fpad))
    grid_spec = pl.GridSpec(
        grid=(nb // G,),
        in_specs=[
            pl.BlockSpec((G, 8, Fpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((G, Fpad, Fpad), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G, Fpad, Fpad), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    out = pl.pallas_call(
        functools.partial(_ldlt_kernel, cmax=cmax, Fpad=Fpad, G=G),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((nb, Fpad, Fpad), F.dtype),
        cost_estimate=pl.CostEstimate(
            flops=2 * int(cmax) * Fpad * Fpad * nb + 2 * Fpad**3 * nb,
            bytes_accessed=2 * nb * Fpad * Fpad * 4,
            transcendentals=0,
        ),
        interpret=interpret,
    )(mask, F)
    return out[:nb0] if pad else out
