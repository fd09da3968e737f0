"""Supernodal multifrontal Cholesky on TPU (SSIDS-class).

TPU-native re-design of the reference's bundled SPRAL SSIDS
(reference src/ssids/ssids.f90: analyse :503, factor :736, solve :1114;
CPU kernels src/ssids/ldlt_app.cxx, cholesky.cxx; GPU kernels
assemble.cu / dense_factor.cu / syrk.cu — SURVEY §3.4), restructured for
XLA instead of translated:

  * ANALYSE (host, numpy + native C++): fill-reducing order (AMD/RCM,
    native/symbolic.cpp), elimination tree, symbolic factorization,
    fundamental supernodes with relaxed amalgamation, and a bottom-up
    LEVEL SCHEDULE of the assembly tree.
  * FACTOR (device, one jitted program): levels run sequentially; all
    supernodes within a level factor as ONE batched dense partial
    Cholesky on fronts padded to the level's maximum size — vmapped
    potrf/trsm/syrk, i.e. MXU work (this replaces the OpenMP task-DAG /
    CUDA-subtree parallelism of the reference with batch parallelism,
    SURVEY §5.7).  Frontal assembly and child extended-add are
    precomputed scatter indices.
  * Pivoting: none at numeric time (TPU kernels cannot reorder
    dynamically) — the analyse-time ordering plus an optional diagonal
    shift and iterative refinement replace threshold pivoting
    (SURVEY §7.3); intended for SPD / quasi-definite systems, which is
    what every IPM/TR KKT matrix here is.
  * SOLVE (device): per-level batched gather -> triangular solves ->
    scatter, forward then backward.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


# ---------------------------------------------------------------------------
# Symbolic analysis (host)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class SupernodalSymbolic:
    """Static factorization plan (all numpy, consumed at trace time)."""

    n: int
    perm: np.ndarray              # new <- old column index
    iperm: np.ndarray
    levels: list                  # list of dicts, one per level (below)
    snode_of_level: list          # supernode ids per level
    a_entries: tuple              # (rows, cols) of the A-lower pattern
    nnz_L: int
    flops: float


def _symbolic_cholesky(n, adj_lower):
    """Column structures of L (python sets; host-side).  adj_lower[j] =
    sorted rows i > j with A[i, j] != 0."""
    parent = np.full(n, -1, np.int64)
    struct = [None] * n
    # up-looking with child merging via first-parent rule
    children = [[] for _ in range(n)]
    for j in range(n):
        s = set(adj_lower[j])
        for c in children[j]:
            s |= struct[c] - {j}
        s.discard(j)
        struct[j] = s
        if s:
            p = min(s)
            parent[j] = p
            children[p].append(j)
    return struct, parent


def supernodal_analyse(rows, cols, n, order: str = "amd",
                       relax_cols: int = 4) -> SupernodalSymbolic:
    """Analyse a symmetric sparsity pattern given in coordinate form
    (either triangle; duplicates fine).  Host-side."""
    from ..native import (
        amd_order,
        rcm_order,
        supernode_partition,
        tree_levels,
    )

    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    # full symmetric adjacency (CSR) for ordering
    import scipy.sparse as sp

    ones = np.ones(len(rows))
    A = sp.csr_matrix((ones, (rows, cols)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.int8).tocsr()
    if order == "amd":
        perm = amd_order(A.indptr, A.indices)
    elif order == "rcm":
        perm = rcm_order(A.indptr, A.indices)
    else:
        perm = np.arange(n, dtype=np.int32)
    perm = perm.astype(np.int64)
    iperm = np.zeros(n, np.int64)
    iperm[perm] = np.arange(n)

    Ap = A[perm][:, perm].tocsc()
    adj_lower = [Ap.indices[Ap.indptr[j]:Ap.indptr[j + 1]] for j in range(n)]
    adj_lower = [sorted(int(i) for i in a if i > j)
                 for j, a in enumerate(adj_lower)]

    struct, parent = _symbolic_cholesky(n, adj_lower)
    colcount = np.array([len(s) + 1 for s in struct], np.int32)
    snode, ns = supernode_partition(parent.astype(np.int32), colcount,
                                    relax_cols=relax_cols)

    # supernode meta
    sn_cols = [[] for _ in range(ns)]
    for j in range(n):
        sn_cols[snode[j]].append(j)
    sn_first = [c[0] for c in sn_cols]
    sn_struct = []
    for s in range(ns):
        cset = set(sn_cols[s])
        r = set()
        for j in sn_cols[s]:
            r |= struct[j]
        sn_struct.append(sorted(r - cset))
    sparent = np.full(ns, -1, np.int32)
    for s in range(ns):
        if sn_struct[s]:
            sparent[s] = snode[sn_struct[s][0]]
    level_of, nlev = tree_levels(sparent)

    # per-level plans
    # lower-triangle convention in the PERMUTED ordering: row >= col
    a_rows = np.maximum(iperm[rows], iperm[cols])
    a_cols = np.minimum(iperm[rows], iperm[cols])
    # deduplicate COO (sum duplicates at numeric time is fine: keep all)
    lev_nodes = [
        [s for s in range(ns) if level_of[s] == l] for l in range(nlev)
    ]
    # global position of each column inside its supernode front
    front_rows_of = {}
    for s in range(ns):
        front_rows_of[s] = sn_cols[s] + sn_struct[s]

    levels = []
    nnz_L = 0
    flops = 0.0
    sn_level_idx = {}
    for l, nodes in enumerate(lev_nodes):
        if not nodes:
            levels.append(None)
            continue
        Fmax = max(len(front_rows_of[s]) for s in nodes)
        Cmax = max(len(sn_cols[s]) for s in nodes)
        nb = len(nodes)
        frows = np.full((nb, Fmax), -1, np.int64)
        ncols = np.zeros(nb, np.int64)
        nrows = np.zeros(nb, np.int64)
        for k, s in enumerate(nodes):
            fr = front_rows_of[s]
            frows[k, :len(fr)] = fr
            ncols[k] = len(sn_cols[s])
            nrows[k] = len(fr)
            sn_level_idx[s] = (l, k)
            nnz_L += len(sn_cols[s]) * len(fr) - len(sn_cols[s]) * (
                len(sn_cols[s]) - 1) // 2
            nc, nf = len(sn_cols[s]), len(fr)
            flops += nc**3 / 3 + nc**2 * (nf - nc) + nc * (nf - nc) ** 2
        # A-entry scatter: entries (i, j) with snode[j] == s -> front pos
        pos_in_front = [
            {g: i for i, g in enumerate(front_rows_of[s])} for s in nodes
        ]
        node_of = {s: k for k, s in enumerate(nodes)}
        sel = [t for t in range(len(a_rows))
               if snode[a_cols[t]] in node_of]
        a_node = np.array([node_of[snode[a_cols[t]]] for t in sel], np.int64)
        a_fi = np.array([pos_in_front[node_of[snode[a_cols[t]]]][a_rows[t]]
                         for t in sel], np.int64)
        a_fj = np.array(
            [pos_in_front[node_of[snode[a_cols[t]]]][a_cols[t]]
             for t in sel], np.int64)
        a_src = np.array(sel, np.int64)
        # NOTE: a_rows >= a_cols (lower), and a_cols is in the supernode's
        # leading columns, so fj < ncols — valid partial-factor layout.
        levels.append(dict(
            nodes=nodes, Fmax=Fmax, Cmax=Cmax,
            frows=frows, ncols=ncols, nrows=nrows,
            a_node=a_node, a_fi=a_fi, a_fj=a_fj, a_src=a_src,
            child_maps=[],       # filled below
        ))

    # child extended-add maps: child s (level lc) update goes to parent
    # p (level lp > lc): positions of child's non-eliminated rows in the
    # parent's front
    for s in range(ns):
        p = sparent[s]
        if p < 0:
            continue
        lc, kc = sn_level_idx[s]
        lp, kp = sn_level_idx[p]
        child_up_rows = sn_struct[s]                # global rows of update
        ppos = {g: i for i, g in enumerate(front_rows_of[p])}
        # update matrix is square over child_up_rows (local child idx
        # offset by ncols_child)
        nupd = len(child_up_rows)
        if nupd == 0:
            continue
        ci, cj, pi, pj = [], [], [], []
        for a in range(nupd):
            for b in range(nupd):
                ga, gb = child_up_rows[a], child_up_rows[b]
                if ga in ppos and gb in ppos:
                    ci.append(a)
                    cj.append(b)
                    pi.append(ppos[ga])
                    pj.append(ppos[gb])
        levels[lp]["child_maps"].append(dict(
            src_level=lc, src_node=kc, dst_node=kp,
            ci=np.array(ci, np.int64), cj=np.array(cj, np.int64),
            pi=np.array(pi, np.int64), pj=np.array(pj, np.int64),
            child_ncols=len(sn_cols[s]),
        ))

    return SupernodalSymbolic(
        n=n, perm=perm, iperm=iperm, levels=levels,
        snode_of_level=lev_nodes,
        a_entries=(rows, cols), nnz_L=nnz_L, flops=flops,
    )


# ---------------------------------------------------------------------------
# Numeric factorization + solve (device)
# ---------------------------------------------------------------------------


def supernodal_factorize(sym: SupernodalSymbolic, vals, shift=0.0):
    """Numeric Cholesky.  ``vals`` aligns with the coordinate entries
    passed to analyse (duplicates are summed).  Returns a list of
    per-level factor blocks (padded (nb, Fmax, Fmax) arrays: L11 lower
    in the leading ncols columns, L21 below) for use by
    supernodal_solve."""
    vals = jnp.asarray(vals)
    dt = vals.dtype
    factors = []
    updates = []                      # per level: (nb, Fmax, Fmax) Schur
    for l, plan in enumerate(sym.levels):
        if plan is None:
            factors.append(None)
            updates.append(None)
            continue
        nb, Fmax = plan["frows"].shape
        F = jnp.zeros((nb, Fmax, Fmax), dt)
        # scatter A entries (lower triangle incl. diagonal)
        if len(plan["a_src"]):
            v = vals[plan["a_src"]]
            # off-diagonal (i > j): also mirror for the factor panel? No:
            # partial Cholesky only reads the lower triangle.
            F = F.at[plan["a_node"], plan["a_fi"], plan["a_fj"]].add(v)
        # extended-add child updates
        for cm in plan["child_maps"]:
            U = updates[cm["src_level"]][cm["src_node"]]
            off = cm["child_ncols"]
            F = F.at[cm["dst_node"], cm["pi"], cm["pj"]].add(
                U[cm["ci"] + off, cm["cj"] + off]
            )
        # batched partial Cholesky of the leading ncols columns, with
        # per-node column masking (pad to Cmax loop)
        ncols = jnp.asarray(plan["ncols"])
        nrows = jnp.asarray(plan["nrows"])
        if shift:
            eye_mask = (jnp.arange(Fmax)[None, :, None]
                        == jnp.arange(Fmax)[None, None, :])
            in_front = jnp.arange(Fmax)[None, :, None] < nrows[:, None, None]
            F = F + jnp.where(eye_mask & in_front,
                              jnp.asarray(shift, dt), 0.0)
        F = _batched_partial_cholesky(F, ncols, nrows, plan["Cmax"])
        factors.append(F)
        updates.append(F)             # trailing block holds the Schur
    return factors


def _batched_partial_cholesky(F, ncols, nrows, cmax):
    """Eliminate the leading ncols columns of each front (masked,
    column-by-column up to the static bound cmax); the trailing block
    becomes the Schur update.  Column loop is sequential (dependency),
    everything inside is batched over fronts — the nodes of a level."""
    nb, Fmax, _ = F.shape
    dt = F.dtype
    eps = jnp.finfo(dt).tiny

    idx = jnp.arange(Fmax)

    def col_step(j, F):
        active = j < ncols                     # (nb,)
        d = F[:, j, j]
        d = jnp.where(active & (d > 0), d, 1.0)
        piv = jnp.sqrt(d)
        colj = F[:, :, j] / piv[:, None]       # (nb, Fmax)
        rows_ok = idx[None, :] >= j            # at/below diagonal
        in_front = idx[None, :] < nrows[:, None]
        colj = jnp.where(rows_ok & in_front, colj, 0.0)
        colj = colj.at[:, j].set(piv)
        # rank-1 Schur update of the trailing submatrix (cols > j)
        upd = colj[:, :, None] * colj[:, None, :]
        cols_after = idx[None, None, :] > j
        rows_after = idx[None, :, None] > j
        Fnew = F - jnp.where(cols_after & rows_after, upd, 0.0)
        # write the factor column
        Fnew = Fnew.at[:, :, j].set(colj)
        return jnp.where(active[:, None, None], Fnew, F)

    return lax.fori_loop(0, cmax, col_step, F)


def supernodal_solve(sym: SupernodalSymbolic, factors, b):
    """Solve A x = b with the factors (forward/backward level sweeps)."""
    b = jnp.asarray(b)
    dt = b.dtype
    # permute
    y = b[jnp.asarray(sym.perm)]

    # forward: for levels bottom-up, for each node: y_F -= L_col * y_j
    for l, plan in enumerate(sym.levels):
        if plan is None:
            continue
        F = factors[l]
        nb, Fmax = plan["frows"].shape
        frows = jnp.asarray(np.maximum(plan["frows"], 0))
        mask = jnp.asarray(plan["frows"] >= 0)
        ncols = jnp.asarray(plan["ncols"])
        yF = jnp.where(mask, y[frows], 0.0)      # (nb, Fmax)

        def fwd_col(j, yF):
            active = j < ncols
            piv = F[:, j, j]
            piv = jnp.where(active & (jnp.abs(piv) > 0), piv, 1.0)
            yj = yF[:, j] / piv
            colj = F[:, :, j]
            below = jnp.arange(Fmax)[None, :] > j
            yF = yF - jnp.where(below & active[:, None], colj * yj[:, None],
                                0.0)
            return yF.at[:, j].set(jnp.where(active, yj, yF[:, j]))

        yF = lax.fori_loop(0, plan["Cmax"], fwd_col, yF)
        # scatter back only the eliminated entries and ACCUMULATED
        # contributions to ancestor rows
        elim = jnp.arange(Fmax)[None, :] < ncols[:, None]
        # eliminated values replace; others accumulate the delta
        delta = jnp.where(mask & ~elim, yF - jnp.where(mask, y[frows], 0.0),
                          0.0)
        y = y.at[frows.reshape(-1)].add(
            jnp.where(mask, delta, 0.0).reshape(-1))
        y = y.at[jnp.where(elim & mask, frows, sym.n)
                 .reshape(-1)].set(
            jnp.where(elim & mask, yF, 0.0).reshape(-1), mode="drop")

    # backward: top-down
    for l in reversed(range(len(sym.levels))):
        plan = sym.levels[l]
        if plan is None:
            continue
        F = factors[l]
        nb, Fmax = plan["frows"].shape
        frows = jnp.asarray(np.maximum(plan["frows"], 0))
        mask = jnp.asarray(plan["frows"] >= 0)
        ncols = jnp.asarray(plan["ncols"])
        yF = jnp.where(mask, y[frows], 0.0)

        def bwd_col(jj, yF):
            j = plan["Cmax"] - 1 - jj
            active = (j < ncols) & (j >= 0)
            colj = F[:, :, j]
            below = jnp.arange(Fmax)[None, :] > j
            dot = jnp.sum(jnp.where(below, colj * yF, 0.0), axis=1)
            piv = F[:, j, j]
            piv = jnp.where(active & (jnp.abs(piv) > 0), piv, 1.0)
            xj = (yF[:, j] - dot) / piv
            return yF.at[:, j].set(jnp.where(active, xj, yF[:, j]))

        yF = lax.fori_loop(0, plan["Cmax"], bwd_col, yF)
        elim = jnp.arange(Fmax)[None, :] < ncols[:, None]
        y = y.at[jnp.where(elim & mask, frows, sym.n).reshape(-1)].set(
            jnp.where(elim & mask, yF, 0.0).reshape(-1), mode="drop")

    return y[jnp.asarray(sym.iperm)]
