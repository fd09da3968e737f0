"""Distributed block-angular KKT solve (shard_map + psum).

SURVEY §5.8 point (ii): the natural multi-chip decomposition of this
domain is BLOCK-ANGULAR — K independent scenario blocks coupled by a
small set of linking constraints:

    [ G_1              A_1' ] [x_1]   [b_1]
    [      ...              ] [...] = [...]
    [           G_K    A_K' ] [x_K]   [b_K]
    [ A_1  ...  A_K    -C   ] [ y ]   [ d ]

Each device factors ITS scenario blocks locally (batched Cholesky, MXU)
and contributes  S_k = A_k G_k^-1 A_k'  and  r_k = A_k G_k^-1 b_k  to
the coupling Schur complement; ONE psum over the mesh assembles
S = C + sum_k S_k and the reduced residual, the small coupling system is
solved replicated, and the back-substitution is again local.  This is
the SCU/BSC Schur-complement pattern of the reference
(src/scu/scu.f90, src/bsc/bsc.f90:372) executed with XLA collectives
over ICI instead of shared memory — the reference itself has NO
distributed backend (SURVEY §5.8), so this is new capability with
matching single-chip semantics (tested against the dense monolithic
solve in tests/test_parallel.py).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def _local_contrib(G, A, b):
    """Per-scenario (vmapped) local factor + Schur contribution."""
    L = jnp.linalg.cholesky(G)

    def gsolve(r):
        w = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, w, lower=False)

    W = gsolve(A.T)                      # G^-1 A'
    S_k = A @ W                          # A G^-1 A'
    r_k = A @ gsolve(b)
    return L, S_k, r_k


def _backsub(L, A, b, y):
    rhs = b - A.T @ y

    def gsolve(r):
        w = jax.scipy.linalg.solve_triangular(L, r, lower=True)
        return jax.scipy.linalg.solve_triangular(L.T, w, lower=False)

    return gsolve(rhs)


def block_angular_solve(mesh: Mesh, G, A, b, C, d, axis: str = "batch",
                        use_psum: bool = True):
    """Solve the block-angular KKT system over a device mesh.

    G (K, n, n) SPD scenario blocks, A (K, m, n) coupling rows,
    b (K, n) scenario RHS — all sharded over the leading axis;
    C (m, m) PSD coupling block and d (m,) replicated.
    Returns (x (K, n), y (m,)): the system solved is
        G_k x_k + A_k' y = b_k,   sum_k A_k x_k - C y = d.
    One psum assembles the coupling Schur complement; everything else
    is device-local (SURVEY §5.8 point ii)."""
    from jax.experimental.shard_map import shard_map

    G = jax.device_put(G, NamedSharding(mesh, P(axis, None, None)))
    A = jax.device_put(A, NamedSharding(mesh, P(axis, None, None)))
    b = jax.device_put(b, NamedSharding(mesh, P(axis, None)))
    C = jax.device_put(C, NamedSharding(mesh, P(None, None)))
    d = jax.device_put(d, NamedSharding(mesh, P(None)))

    @partial(
        shard_map, mesh=mesh,
        in_specs=(P(axis, None, None), P(axis, None, None), P(axis, None),
                  P(None, None), P(None)),
        out_specs=(P(axis, None), P(None)),
        check_rep=False,
    )
    def solve(Gl, Al, bl, Cr, dr):
        # local blocks: batched factor + contributions (MXU)
        L, S_k, r_k = jax.vmap(_local_contrib)(Gl, Al, bl)
        S_local = jnp.sum(S_k, axis=0)
        r_local = jnp.sum(r_k, axis=0)
        # ONE collective: assemble the coupling Schur complement.
        # (use_psum=False replaces the collective with the local terms —
        # numerically wrong on >1 device, used ONLY to measure the
        # communication fraction for the Amdahl scaling bound.)
        if use_psum:
            S = jax.lax.psum(S_local, axis) + Cr
            r = jax.lax.psum(r_local, axis) - dr
        else:
            S = S_local * len(mesh.devices.flat) + Cr
            r = r_local * len(mesh.devices.flat) - dr
        # replicated small solve:  (C + sum A G^-1 A') y = sum r - d
        Ls = jnp.linalg.cholesky(S)
        w = jax.scipy.linalg.solve_triangular(Ls, r, lower=True)
        y = jax.scipy.linalg.solve_triangular(Ls.T, w, lower=False)
        # local back-substitution
        x = jax.vmap(_backsub, in_axes=(0, 0, 0, None))(L, Al, bl, y)
        return x, y

    return jax.jit(solve)(G, A, b, C, d)


def block_angular_residual(G, A, b, C, d, x, y):
    """Monolithic residual of the block-angular system (for tests)."""
    r1 = jax.vmap(lambda Gk, Ak, bk, xk: Gk @ xk + Ak.T @ y - bk,
                  in_axes=(0, 0, 0, 0))(G, A, b, x)
    r2 = jnp.einsum("kmn,kn->m", A, x) - C @ y - d
    return jnp.maximum(jnp.max(jnp.abs(r1)), jnp.max(jnp.abs(r2)))
