"""Mesh-sharded SUPERNODAL KKT factorization (SURVEY §5.8 ii /
VERDICT r4 item 4).

The multi-chip decomposition of the sparse augmented system follows the
elimination tree: the grid is split into D strips (= independent
subtrees under the top separators, the SSIDS per-NUMA-region subtree
assignment, reference src/spral/hw_topology.f90, src/ssids/ssids.f90:736),
each device runs the FULL supernodal LDL^T on its strip's local KKT
block (the trace-safe flat kernels of linalg/supernodal_flat inside
shard_map), and the only communication is ONE psum assembling the
separator Schur complement:

    K = [ K_1                B_1 ]      S = K_ss - sum_d B_d' K_d^-1 B_d
        [      ...           ... ]      (psum over the mesh axis)
        [           K_D      B_D ]
        [ B_1' ...  B_D'    K_ss ]

All strips share ONE symbolic plan (identical local patterns by
construction), so the per-device numeric phase is the same compiled
program — the SPMD ideal.  The separator system is solved replicated;
back-substitution is again local.  Semantics match a monolithic sparse
LDL^T of K (checked by sharded_kkt_residual)."""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P


def build_strip_grid_kkt(D: int, w: int, R: int, seed: int = 0):
    """Build a grid-QP augmented KKT partitioned into D strips of w
    grid columns separated by single-column separators (grid = R rows x
    C = D*w + (D-1) columns; 5-point Laplacian H, one local linking
    constraint per vertical neighbour pair, barrier-like diagonals).

    Returns (plan, parts) where parts holds per-device stacked values:
      vals   (D, nnz_local)  local KKT values in plan COO order
      B      (D, nd, ns)     strip <-> separator coupling (dense)
      Kss    (ns, ns)        separator block (replicated)
      b      (D, nd)         local RHS;  bs (ns,) separator RHS
      x_ref  (n_tot,)        monolithic solution for residual checks
    """
    from ..linalg.supernodal_flat import flat_analyse

    C = D * w + (D - 1)
    rng = np.random.default_rng(seed)

    def vid(r, c):
        return c * R + r

    # global K: vars (R*C) then constraints ((R-1) per column)
    nv = R * C
    mrows = (R - 1) * C
    N = nv + mrows

    rows, cols, vals = [], [], []

    def add(i, j, v):
        rows.append(max(i, j))
        cols.append(min(i, j))
        vals.append(v)

    dx = rng.uniform(0.5, 2.0, nv)
    cd = rng.uniform(0.1, 1.0, mrows)
    for c in range(C):
        for r in range(R):
            v = vid(r, c)
            add(v, v, 4.0 + dx[v])
            if r + 1 < R:
                add(v, vid(r + 1, c), -1.0)
            if c + 1 < C:
                add(v, vid(r, c + 1), -1.0)
    for c in range(C):
        for r in range(R - 1):
            j = nv + c * (R - 1) + r
            add(j, j, -(0.1 + cd[j - nv]))
            add(j, vid(r, c), rng.uniform(0.8, 1.2))
            add(j, vid(r + 1, c), rng.uniform(0.8, 1.2))
    rows = np.asarray(rows)
    cols = np.asarray(cols)
    vals = np.asarray(vals)

    # --- partition: strip d owns grid columns [d*(w+1), d*(w+1)+w) ----
    sep_cols = [d * (w + 1) + w for d in range(D - 1)]
    strip_cols = [list(range(d * (w + 1), d * (w + 1) + w))
                  for d in range(D)]

    def col_indices(cs):
        vi = [vid(r, c) for c in cs for r in range(R)]
        ci = [nv + c * (R - 1) + r for c in cs for r in range(R - 1)]
        return np.asarray(vi + ci)

    interior = [col_indices(cs) for cs in strip_cols]
    sep = col_indices(sep_cols) if sep_cols else np.zeros(0, np.int64)
    nd = len(interior[0])
    ns = len(sep)

    # global -> (owner, local position); separators owner = -1
    owner = np.full(N, -1, np.int64)
    lpos = np.full(N, -1, np.int64)
    for d, I in enumerate(interior):
        owner[I] = d
        lpos[I] = np.arange(nd)
    spos = np.full(N, -1, np.int64)
    spos[sep] = np.arange(ns)

    # --- local pattern (same for every strip by construction) ---------
    o_r, o_c = owner[rows], owner[cols]
    local_sel = (o_r >= 0) & (o_r == o_c)
    lr_all = lpos[rows[local_sel]]
    lc_all = lpos[cols[local_sel]]
    ld_all = o_r[local_sel]
    lv_all = vals[local_sel]
    # canonical entry order from strip 0; all strips must match it
    order0 = np.lexsort((lc_all[ld_all == 0], lr_all[ld_all == 0]))
    nnz_local = int(np.sum(ld_all == 0))
    lrows = lr_all[ld_all == 0][order0]
    lcols = lc_all[ld_all == 0][order0]
    vstack = np.zeros((D, nnz_local))
    for d in range(D):
        seld = ld_all == d
        od = np.lexsort((lc_all[seld], lr_all[seld]))
        assert np.array_equal(lr_all[seld][od], lrows), \
            "strip patterns differ"
        vstack[d] = lv_all[seld][od]

    plan = flat_analyse(lrows, lcols, nd, order="amd", relax_cols=8)

    # --- coupling B_d (nd, ns) and separator block ---------------------
    B = np.zeros((D, nd, ns))
    cross = (o_r >= 0) & (o_c == -1) & (spos[cols] >= 0)
    for i in np.flatnonzero(cross):
        B[o_r[i], lpos[rows[i]], spos[cols[i]]] += vals[i]
    cross2 = (o_c >= 0) & (o_r == -1) & (spos[rows] >= 0)
    for i in np.flatnonzero(cross2):
        B[o_c[i], lpos[cols[i]], spos[rows[i]]] += vals[i]
    Kss = np.zeros((ns, ns))
    ss = (o_r == -1) & (o_c == -1)
    for i in np.flatnonzero(ss):
        a, bcol = spos[rows[i]], spos[cols[i]]
        Kss[a, bcol] += vals[i]
        if a != bcol:
            Kss[bcol, a] += vals[i]

    b_loc = rng.normal(size=(D, nd))
    b_sep = rng.normal(size=ns)

    # monolithic reference solution (host, for residual checks)
    import scipy.sparse as sp

    Kfull = sp.csr_matrix(
        (np.concatenate([vals, vals[rows != cols]]),
         (np.concatenate([rows, cols[rows != cols]]),
          np.concatenate([cols, rows[rows != cols]]))), shape=(N, N))
    rhs = np.zeros(N)
    for d, I in enumerate(interior):
        rhs[I] = b_loc[d]
    rhs[sep] = b_sep
    x_ref = sp.linalg.spsolve(Kfull.tocsc(), rhs)

    parts = dict(vals=jnp.asarray(vstack), B=jnp.asarray(B),
                 Kss=jnp.asarray(Kss), b=jnp.asarray(b_loc),
                 bs=jnp.asarray(b_sep), interior=interior, sep=sep,
                 Kfull=Kfull, rhs=rhs, x_ref=x_ref, nd=nd, ns=ns)
    return plan, parts


def sharded_kkt_solve(mesh, plan, vals, B, Kss, b, bs, axis="batch"):
    """One supernodal factorize + Schur solve, sharded over the mesh:
    local LDL^T per device (the flat supernodal kernels traced inside
    shard_map), ONE psum for the separator Schur complement and reduced
    RHS, replicated dense solve of the separator system, local
    back-substitution.  Returns (x_local (D, nd), x_sep (ns,))."""
    from jax.experimental.shard_map import shard_map

    from ..linalg.supernodal_flat import _factorize_body, _solve_body

    def body(vals_d, B_d, b_d):
        vals_1, B_1, b_1 = vals_d[0], B_d[0], b_d[0]
        fac = _factorize_body(plan, vals_1)
        solve = lambda r: _solve_body(plan, fac.store, r)
        W = jax.vmap(solve, in_axes=1, out_axes=1)(B_1)     # K_d^-1 B_d
        S_d = B_1.T @ W                                     # B' K^-1 B
        r_d = B_1.T @ solve(b_1)
        S = jax.lax.psum(S_d, axis)          # the ONE collective
        r = jax.lax.psum(r_d, axis)
        x_s = jnp.linalg.solve(Kss - S, bs - r)             # replicated
        x_d = solve(b_1 - B_1 @ x_s)
        return x_d[None], x_s[None]

    xs, xsep = shard_map(
        body, mesh=mesh,
        in_specs=(P(axis), P(axis), P(axis)),
        out_specs=(P(axis), P(axis)),
    )(vals, B, b)
    return xs, xsep[0]


def sharded_kkt_residual(parts, xs, xsep) -> float:
    """Relative residual of the sharded solve against the monolithic
    sparse K (host check)."""
    x = np.zeros(parts["Kfull"].shape[0])
    for d, I in enumerate(parts["interior"]):
        x[I] = np.asarray(xs[d], np.float64)
    x[parts["sep"]] = np.asarray(xsep, np.float64)
    r = parts["Kfull"] @ x - parts["rhs"]
    return float(np.linalg.norm(r) / np.linalg.norm(parts["rhs"]))
