"""Supernodal multifrontal LDL^T / Cholesky on TPU (SSIDS-class).

TPU-native re-design of the reference's bundled SPRAL SSIDS
(reference src/ssids/ssids.f90: analyse :503, factor :736, solve :1114;
CPU kernels src/ssids/ldlt_app.cxx, cholesky.cxx; GPU kernels
assemble.cu / dense_factor.cu / syrk.cu — SURVEY §3.4), restructured for
XLA instead of translated:

  * ANALYSE (host, native C++ + numpy): fill-reducing order (quotient-
    graph approximate minimum degree / RCM, native/symbolic.cpp),
    elimination tree + column counts + full L pattern by the row-walk
    algorithm (native symbolic_factor), fundamental supernodes with
    relaxed amalgamation, and a bottom-up LEVEL SCHEDULE of the
    assembly tree.  All index maps (A-entry scatter, child extend-add
    row maps) are precomputed as flat numpy arrays.
  * FACTOR (device, one jitted program): levels run sequentially; all
    supernodes within a level factor as ONE batched dense partial
    LDL^T on fronts padded to the level's maximum size.  The partial
    factorization is right-looking and blocked: a rank-1 column loop
    inside each width-B panel, then one batched SYRK/GEMM trailing
    update per panel — MXU work (this replaces the OpenMP task-DAG /
    CUDA-subtree parallelism of the reference with batch parallelism,
    SURVEY §5.7).  Child extend-add is one gather + one scatter-add
    per (level, child-level) pair.
  * LDL^T everywhere: the diagonal D carries signs, so symmetric
    QUASI-DEFINITE systems (every IPM / TR KKT matrix here) factor
    without pivoting, and the INERTIA is the sign count of D
    (SLS_enquire role; reference src/ssids/ldlt_app.cxx pivoting is
    replaced by analyse-time ordering + caller-supplied regularization
    + iterative refinement + a-posteriori |d|_min monitoring,
    SURVEY §7.3).
  * SOLVE (device): per-level batched gather -> blocked unit-triangular
    solves (lax.linalg.triangular_solve) + panel matmuls -> scatter,
    forward then backward, with the diagonal scaling between sweeps.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax


def _round_up(x: int, m: int) -> int:
    return -(-int(x) // m) * m


# ---------------------------------------------------------------------------
# Symbolic analysis (host)
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class LevelPlan:
    """Static per-level factorization plan (numpy, consumed at trace time)."""

    frows: np.ndarray        # (nb, Fpad) global rows of each front, -1 pad
    ncols: np.ndarray        # (nb,) eliminated columns per front
    nrows: np.ndarray        # (nb,) true front size
    Cmax: int                # max ncols in level
    Fpad: int                # padded front size (multiple of 8, >= nblocks*B)
    B: int                   # panel width
    a_node: np.ndarray       # A-entry scatter: local node index
    a_fi: np.ndarray         #   row position in front
    a_fj: np.ndarray         #   col position in front
    a_src: np.ndarray        #   index into the user's value array
    ea: list                 # extend-add groups: dicts with
    #   src_level, src_nodes (nc,), dst_nodes (nc,),
    #   cpos (nc, Umax) child-front positions of update rows,
    #   ppos (nc, Umax) parent-front positions (pad -> Fpad, dropped),
    #   uvalid (nc, Umax)


@dataclasses.dataclass
class SupernodalSymbolic:
    """Static factorization plan (host side; hashed by identity so one
    plan traces once under jit)."""

    n: int
    perm: np.ndarray              # new <- old column index
    iperm: np.ndarray
    levels: list                  # list[LevelPlan], bottom-up
    nnz_L: int
    flops: float
    ns: int

    def __hash__(self):
        return id(self)

    def __eq__(self, other):
        return self is other


def supernodal_analyse(rows, cols, n, order: str = "amd",
                       relax_cols: int = 4) -> SupernodalSymbolic:
    """Analyse a symmetric sparsity pattern given in coordinate form
    (either triangle; duplicate entries are summed at numeric time).
    Host-side; heavy graph work runs in native C++
    (native/symbolic.cpp — the SSIDS analyse role, src/ssids/anal.f90)."""
    import scipy.sparse as sp

    from ..native import (
        amd_order,
        nd_order,
        rcm_order,
        supernode_partition,
        symbolic_factor,
        tree_levels,
    )

    rows = np.asarray(rows, np.int64)
    cols = np.asarray(cols, np.int64)
    ones = np.ones(len(rows), np.int8)
    A = sp.csr_matrix((ones, (rows, cols)), shape=(n, n))
    A = ((A + A.T) > 0).astype(np.int8).tocsr()
    if order == "amd":
        perm = amd_order(A.indptr, A.indices)
    elif order == "rcm":
        perm = rcm_order(A.indptr, A.indices)
    elif order == "nd":
        perm = nd_order(A.indptr, A.indices)
    elif order == "best":
        # fill-minimizing pick: run the candidate orderings through the
        # (cheap) symbolic count and keep the sparsest factor — the
        # reference's ordering menu with an automatic choice
        # (sls.f90 ordering control; SSIDS tries METIS then falls back)
        from ..native import symbolic_count

        best_perm, best_nnz = None, None
        for cand in (amd_order(A.indptr, A.indices),
                     nd_order(A.indptr, A.indices)):
            c64 = cand.astype(np.int64)
            Alc = sp.tril(A[c64][:, c64]).tocsc()
            nnz = symbolic_count(Alc.indptr.astype(np.int64),
                                 Alc.indices.astype(np.int32), n)
            if best_nnz is None or nnz < best_nnz:
                best_perm, best_nnz = cand, nnz
        perm = best_perm
    else:
        perm = np.arange(n, dtype=np.int32)
    perm = perm.astype(np.int64)
    iperm = np.zeros(n, np.int64)
    iperm[perm] = np.arange(n)

    Al = sp.tril(A[perm][:, perm]).tocsc()
    parent, colcount, Lp, Li = symbolic_factor(
        Al.indptr.astype(np.int64), Al.indices.astype(np.int32), n)
    snode, ns = supernode_partition(parent, colcount, relax_cols=relax_cols)
    snode = snode.astype(np.int64)

    # supernode column ranges (snode ids ascend with columns)
    sn_first = np.searchsorted(snode, np.arange(ns))
    sn_end = np.searchsorted(snode, np.arange(ns), side="right")

    # per-supernode struct rows (below the supernode's columns)
    sn_struct = []
    for s in range(ns):
        j0, j1 = int(sn_first[s]), int(sn_end[s])
        seg = Li[Lp[j0]:Lp[j1]]
        if len(seg):
            u = np.unique(seg)
            u = u[u >= j1]
        else:
            u = np.zeros(0, np.int32)
        sn_struct.append(u.astype(np.int64))
    struct_len = np.array([len(u) for u in sn_struct], np.int64)

    sparent = np.full(ns, -1, np.int32)
    for s in range(ns):
        if struct_len[s]:
            sparent[s] = snode[sn_struct[s][0]]
    level_of, nlev = tree_levels(sparent)

    nc_all = sn_end - sn_first
    nf_all = nc_all + struct_len
    nnz_L = int(np.sum(nc_all * nf_all - nc_all * (nc_all - 1) // 2))
    flops = float(np.sum(nc_all.astype(float) ** 3 / 3
                         + nc_all.astype(float) ** 2 * struct_len
                         + nc_all * struct_len.astype(float) ** 2))

    # Split every tree level into FRONT-SIZE BUCKETS (pow-2 on both the
    # front size and the eliminated-column count): fronts inside a batch
    # are padded to the bucket bound, so padding waste is bounded ~2x
    # instead of each level paying its largest front (the role the
    # task-DAG's per-node granularity plays in the reference).  Groups
    # stay level-ordered, so children always factor in earlier groups.
    def _p2(x):
        x = np.maximum(np.asarray(x, np.int64), 1)
        return 2 ** np.ceil(np.log2(x)).astype(np.int64)

    groups: list = []
    for l in range(nlev):
        nodes = np.flatnonzero(level_of == l)
        key = (_p2(np.maximum(nf_all[nodes], 8)) * (10 ** 6)
               + _p2(nc_all[nodes]))
        for u in np.unique(key):
            groups.append(nodes[key == u])
    node_pos = np.zeros(ns, np.int64)
    group_of = np.zeros(ns, np.int64)
    for gi, nd in enumerate(groups):
        node_pos[nd] = np.arange(len(nd))
        group_of[nd] = gi

    def pos_in_front(s: int, g: np.ndarray) -> np.ndarray:
        """Positions of global rows g (sorted or not) in front of s."""
        incol = g < sn_end[s]
        p_col = g - sn_first[s]
        p_str = nc_all[s] + np.searchsorted(sn_struct[s], g)
        return np.where(incol, p_col, p_str)

    # --- A-entry scatter maps, grouped by owning supernode -> level ----
    a_r = np.maximum(iperm[rows], iperm[cols])
    a_c = np.minimum(iperm[rows], iperm[cols])
    s_of = snode[a_c]
    ordr = np.argsort(s_of, kind="stable")
    e_node = np.zeros(len(a_r), np.int32)
    e_fi = np.zeros(len(a_r), np.int32)
    e_fj = np.zeros(len(a_r), np.int32)
    uniq, starts = np.unique(s_of[ordr], return_index=True)
    bounds = np.append(starts, len(ordr))
    for k, s in enumerate(uniq):
        sel = ordr[bounds[k]:bounds[k + 1]]
        e_node[sel] = node_pos[s]
        e_fi[sel] = pos_in_front(int(s), a_r[sel])
        e_fj[sel] = a_c[sel] - sn_first[s]
    e_group = group_of[s_of]

    # --- extend-add maps, grouped by (dst group, src group) ------------
    ea_groups: dict = {}
    for s in range(ns):
        p = sparent[s]
        if p < 0 or struct_len[s] == 0:
            continue
        key = (int(group_of[p]), int(group_of[s]))
        g = ea_groups.setdefault(key, dict(src=[], dst=[], cpos=[], ppos=[]))
        g["src"].append(node_pos[s])
        g["dst"].append(node_pos[p])
        g["cpos"].append(nc_all[s] + np.arange(struct_len[s]))
        g["ppos"].append(pos_in_front(int(p), sn_struct[s]))

    levels: list = []
    for gi, nodes in enumerate(groups):
        nb = len(nodes)
        ncols = nc_all[nodes]
        nrows = nf_all[nodes]
        Cmax = int(ncols.max()) if nb else 1
        Fmax = int(nrows.max()) if nb else 1
        B = min(32, _round_up(Cmax, 8))
        Fpad = _round_up(max(Fmax, _round_up(Cmax, B)), 8)
        frows = np.full((nb, Fpad), -1, np.int32)
        for k, s in enumerate(nodes):
            fr = np.concatenate(
                [np.arange(sn_first[s], sn_end[s]), sn_struct[s]])
            frows[k, :len(fr)] = fr
        sel = np.flatnonzero(e_group == gi)
        ea = []
        for (dl, sl), g in sorted(ea_groups.items()):
            if dl != gi:
                continue
            Umax = max(len(c) for c in g["cpos"])
            nc = len(g["src"])
            cpos = np.zeros((nc, Umax), np.int32)
            ppos = np.full((nc, Umax), Fpad, np.int32)   # pad -> dropped
            uvalid = np.zeros((nc, Umax), bool)
            for k in range(nc):
                u = len(g["cpos"][k])
                cpos[k, :u] = g["cpos"][k]
                ppos[k, :u] = g["ppos"][k]
                uvalid[k, :u] = True
            ea.append(dict(
                src_level=sl,
                src_nodes=np.asarray(g["src"], np.int32),
                dst_nodes=np.asarray(g["dst"], np.int32),
                cpos=cpos, ppos=ppos, uvalid=uvalid,
            ))
        levels.append(LevelPlan(
            frows=frows, ncols=ncols.astype(np.int32),
            nrows=nrows.astype(np.int32),
            Cmax=Cmax, Fpad=Fpad, B=B,
            a_node=e_node[sel], a_fi=e_fi[sel], a_fj=e_fj[sel],
            a_src=sel.astype(np.int32), ea=ea,
        ))

    return SupernodalSymbolic(
        n=n, perm=perm, iperm=iperm, levels=levels,
        nnz_L=nnz_L, flops=flops, ns=ns,
    )


# ---------------------------------------------------------------------------
# Numeric factorization (device)
# ---------------------------------------------------------------------------


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["levels", "dmin", "inertia"],
    meta_fields=[],
)
@dataclasses.dataclass
class SupernodalFactors:
    """LDL^T factors: per level (nb, Fpad, Fpad) fronts — eliminated
    columns hold unit-lower L with d_j stored on the diagonal; the
    trailing square holds that front's Schur update.

    dmin    = min |d_j| over all eliminated columns (a-posteriori pivot
              monitor; the SSIDS threshold-pivot check analogue).
    inertia = (#pos, #neg, #zero) of D — SLS_enquire equivalent
              (reference src/sls/sls.f90:68-76)."""

    levels: list
    dmin: Any
    inertia: Any


def supernodal_factorize(sym: SupernodalSymbolic, vals, shift=0.0
                         ) -> SupernodalFactors:
    """Numeric LDL^T.  ``vals`` aligns with the coordinate entries passed
    to analyse (duplicates summed).  ``shift`` is added to the diagonal:
    a scalar, or an (n,)-vector in the ORIGINAL (unpermuted) ordering —
    the signed-regularization hook for quasi-definite KKT systems."""
    vals = jnp.asarray(vals)
    dt = vals.dtype
    shift_vec = None
    if isinstance(shift, (jnp.ndarray, np.ndarray)) and np.ndim(shift) == 1:
        shift_vec = jnp.asarray(shift, dt)[jnp.asarray(sym.perm)]
    levels_out: list = []
    dmin = jnp.asarray(jnp.inf, dt)
    npos = jnp.array(0, jnp.int32)
    nneg = jnp.array(0, jnp.int32)
    nzero = jnp.array(0, jnp.int32)
    for plan in sym.levels:
        nb, Fpad = plan.frows.shape
        F = jnp.zeros((nb, Fpad, Fpad), dt)
        if len(plan.a_src):
            an = jnp.asarray(plan.a_node)
            afi = jnp.asarray(plan.a_fi)
            afj = jnp.asarray(plan.a_fj)
            v = vals[jnp.asarray(plan.a_src)]
            F = F.at[an, afi, afj].add(v)
            # mirror the strict-lower entries: fronts stay SYMMETRIC
            # through the elimination (extend-add contributions already
            # are), which lets the Pallas kernel read a column's row
            # twin instead of dynamically slicing lanes
            F = F.at[an, afj, afi].add(jnp.where(afi != afj, v, 0.0))
        ncols = jnp.asarray(plan.ncols)
        ii = jnp.arange(Fpad)
        # diagonal shift on the eliminated columns only (each global
        # column is eliminated in exactly one front)
        elim = ii[None, :] < ncols[:, None]
        if shift_vec is not None:
            sv = shift_vec[jnp.clip(jnp.asarray(plan.frows), 0, sym.n - 1)]
            F = F.at[:, ii, ii].add(jnp.where(elim, sv, 0.0))
        elif shift:
            F = F.at[:, ii, ii].add(
                jnp.where(elim, jnp.asarray(shift, dt), 0.0))
        # child extend-add: one gather + one scatter-add per source level
        for g in plan.ea:
            U = levels_out[g["src_level"]]
            src = jnp.asarray(g["src_nodes"])
            cpos = jnp.asarray(g["cpos"])
            ppos = jnp.asarray(g["ppos"])
            valid = jnp.asarray(g["uvalid"])
            Gm = U[src[:, None, None], cpos[:, :, None], cpos[:, None, :]]
            Gm = jnp.where(valid[:, :, None] & valid[:, None, :], Gm, 0.0)
            F = F.at[jnp.asarray(g["dst_nodes"])[:, None, None],
                     ppos[:, :, None], ppos[:, None, :]].add(
                Gm, mode="drop")
        F = _partial_ldlt_dispatch(F, ncols, plan.Cmax, plan.B, plan.Fpad)
        # a-posteriori pivot stats from the stored diagonal (the SSIDS
        # threshold-check analogue): eliminated columns hold d_j there
        dvec = jnp.diagonal(F, axis1=1, axis2=2)
        dmin = jnp.minimum(
            dmin, jnp.min(jnp.where(elim, jnp.abs(dvec), jnp.inf),
                          initial=jnp.inf))
        npos = npos + jnp.sum(elim & (dvec > 0)).astype(jnp.int32)
        nneg = nneg + jnp.sum(elim & (dvec < 0)).astype(jnp.int32)
        nzero = nzero + jnp.sum(elim & (dvec == 0)).astype(jnp.int32)
        levels_out.append(F)
    return SupernodalFactors(
        levels=levels_out, dmin=dmin,
        inertia=jnp.stack([npos, nneg, nzero]),
    )


def _partial_ldlt_dispatch(F, ncols, cmax, B, Fpad):
    """Pick the numeric partial-factor backend: the Pallas VMEM-resident
    kernel on TPU for fronts that fit on-chip, else the XLA blocked
    path (SURVEY §2.6 native checklist items 1-2)."""
    from .pallas_kernels import MAX_PALLAS_FRONT

    # MEASURED FINDING (v5e, 2026-08): for this workload — thousands of
    # small fronts per level with a sequential column dependency — the
    # XLA blocked path beats the VMEM-resident Pallas kernel ~7x
    # (2.1 ms vs 15.2 ms at nb=2048/Fpad=64/cmax=32, 260 vs 35 GFLOP/s):
    # XLA amortizes op latency across the WHOLE level per op, while a
    # grid-sequential per-tile kernel is latency-bound (VMEM temporaries
    # cap the fronts-per-program at ~8).  The kernel (pallas_kernels.py)
    # is kept opt-in for future revisit: GALAHAD_TPU_PALLAS=1.
    if (jax.default_backend() == "tpu" and F.dtype == jnp.float32
            and Fpad <= MAX_PALLAS_FRONT
            and bool(int(__import__("os").environ.get(
                "GALAHAD_TPU_PALLAS", "0")))):
        from .pallas_kernels import partial_ldlt_pallas

        return partial_ldlt_pallas(F, ncols, cmax, B)
    return _blocked_partial_ldlt(F, ncols, cmax, B)


def _blocked_partial_ldlt(F, ncols, cmax, B):
    """Eliminate the leading ncols columns of each front, batched over
    the level's fronts.  Right-looking blocked: per width-B panel a
    rank-1 column loop (on the (nb, Fpad, B) panel), then ONE batched
    SYRK/GEMM trailing update — the MXU-shaped replacement for the
    reference's blocked app-style LDL^T (src/ssids/ldlt_app.cxx:40) and
    CUDA partial factor (src/spral/dense_factor.cu:22-35)."""
    nb, Fpad, _ = F.shape
    dt = F.dtype
    tiny = jnp.asarray(np.finfo(np.dtype(dt.name)).tiny * 16, dt)
    nblocks = -(-cmax // B)
    ii = jnp.arange(Fpad)
    jB = jnp.arange(B)

    def block_step(bi, F):
        b = bi * B
        P = lax.dynamic_slice(F, (0, 0, b), (nb, Fpad, B))

        def col_step(j, P):
            gcol = b + j
            active = gcol < ncols                          # (nb,)
            col = lax.dynamic_slice(P, (0, 0, j), (nb, Fpad, 1))[..., 0]
            d = jnp.sum(jnp.where((ii == gcol)[None, :], col, 0.0), axis=1)
            dn = jnp.where(active & (jnp.abs(d) > tiny), d, 1.0)
            below = ii[None, :] > gcol
            l = jnp.where(below & active[:, None], col / dn[:, None], 0.0)
            # rank-1 update of the remaining panel columns
            lrows = lax.dynamic_slice(l, (0, b), (nb, B))
            upd = l[:, :, None] * (dn[:, None] * lrows)[:, None, :]
            P = P - jnp.where((jB > j)[None, None, :], upd, 0.0)
            # store column j: zeros above, d on diag, l below (active);
            # inactive (struct/pad) columns keep their updated values
            newcol = jnp.where((ii == gcol)[None, :],
                               jnp.where(active, d, 1.0)[:, None], l)
            newcol = jnp.where(active[:, None], newcol, col)
            P = lax.dynamic_update_slice(P, newcol[:, :, None], (0, 0, j))
            return P

        P = lax.fori_loop(0, B, col_step, P)

        # batched SYRK trailing update: T = (L * d) L^T onto cols >= b+B
        gcols = b + jB
        amask = gcols[None, None, :] < ncols[:, None, None]  # active cols
        diagmask = ii[:, None] == gcols[None, :]             # (Fpad, B)
        dvec = jnp.sum(P * diagmask[None, :, :], axis=1)     # (nb, B)
        dsafe = jnp.where(jnp.abs(dvec) > tiny, dvec, 1.0)
        Lb = jnp.where(amask & ~diagmask[None, :, :], P, 0.0)
        T = (Lb * dsafe[:, None, :]) @ jnp.swapaxes(Lb, -1, -2)
        F = F - jnp.where((ii >= b + B)[None, None, :], T, 0.0)
        F = lax.dynamic_update_slice(F, P, (0, 0, b))
        return F

    return lax.fori_loop(0, nblocks, block_step, F)


def supernodal_inertia(fac: SupernodalFactors):
    """(#pos, #neg, #zero) eigenvalue counts from the LDL^T diagonal
    (Sylvester) — the SLS_enquire/TRS interval-update hook
    (reference src/trs/trs.f90:2260-2337)."""
    return fac.inertia


# ---------------------------------------------------------------------------
# Solve (device)
# ---------------------------------------------------------------------------


def supernodal_solve(sym: SupernodalSymbolic, fac: SupernodalFactors, b):
    """Solve A x = b with the LDL^T factors: forward (L w = b), scale
    (v = w / d), backward (L^T x = v), as blocked per-level sweeps."""
    b = jnp.asarray(b)
    dt = b.dtype
    y = b[jnp.asarray(sym.perm)]
    n = sym.n

    prepared = []
    for l, plan in enumerate(sym.levels):
        F = fac.levels[l].astype(dt)
        nb, Fpad = plan.frows.shape
        ii = jnp.arange(Fpad)
        ncols = jnp.asarray(plan.ncols)
        elim = ii[None, :] < ncols[:, None]
        # columns >= ncols hold the Schur block — zero them for the
        # triangular solves (active columns already have zeros above
        # the diagonal)
        Ls = jnp.where(elim[:, None, :], F, 0.0)
        dvec = jnp.sum(Ls * (ii[:, None] == ii[None, :])[None], axis=1)
        tiny = jnp.asarray(np.finfo(np.dtype(dt.name)).tiny * 16, dt)
        dsafe = jnp.where(jnp.abs(dvec) > tiny, dvec, 1.0)
        frows = jnp.asarray(np.maximum(plan.frows, 0))
        mask = jnp.asarray(plan.frows >= 0)
        prepared.append((Ls, dsafe, frows, mask, elim, ncols))

    # ---- forward: bottom-up ----
    for l, plan in enumerate(sym.levels):
        Ls, dsafe, frows, mask, elim, ncols = prepared[l]
        nb, Fpad = plan.frows.shape
        B = plan.B
        nblocks = -(-plan.Cmax // B)
        yF = jnp.where(mask, y[frows], 0.0)
        yF0 = yF

        def fwd_block(bi, yF, Ls=Ls, nb=nb, Fpad=Fpad, B=B):
            bs = bi * B
            L11 = lax.dynamic_slice(Ls, (0, bs, bs), (nb, B, B))
            y1 = lax.dynamic_slice(yF, (0, bs), (nb, B))
            y1 = lax.linalg.triangular_solve(
                L11, y1[..., None], left_side=True, lower=True,
                unit_diagonal=True)[..., 0]
            panel = lax.dynamic_slice(Ls, (0, 0, bs), (nb, Fpad, B))
            upd = (panel @ y1[..., None])[..., 0]
            below = jnp.arange(Fpad)[None, :] >= bs + B
            yF = jnp.where(below, yF - upd, yF)
            return lax.dynamic_update_slice(yF, y1, (0, bs))

        yF = lax.fori_loop(0, nblocks, fwd_block, yF)
        yF = jnp.where(elim, yF / dsafe, yF)
        # scatter: eliminated entries replace, struct rows accumulate
        delta = jnp.where(mask & ~elim, yF - yF0, 0.0)
        y = y.at[frows.reshape(-1)].add(delta.reshape(-1))
        y = y.at[jnp.where(elim & mask, frows, n).reshape(-1)].set(
            jnp.where(elim & mask, yF, 0.0).reshape(-1), mode="drop")

    # ---- backward: top-down ----
    for l in reversed(range(len(sym.levels))):
        plan = sym.levels[l]
        Ls, dsafe, frows, mask, elim, ncols = prepared[l]
        nb, Fpad = plan.frows.shape
        B = plan.B
        nblocks = -(-plan.Cmax // B)
        yF = jnp.where(mask, y[frows], 0.0)

        def bwd_block(k, yF, Ls=Ls, nb=nb, Fpad=Fpad, B=B, nblocks=nblocks):
            bs = (nblocks - 1 - k) * B
            panel = lax.dynamic_slice(Ls, (0, 0, bs), (nb, Fpad, B))
            below = jnp.arange(Fpad)[None, :, None] >= bs + B
            panel_b = jnp.where(below, panel, 0.0)
            rhs = (lax.dynamic_slice(yF, (0, bs), (nb, B))
                   - (jnp.swapaxes(panel_b, -1, -2) @ yF[..., None])[..., 0])
            L11 = lax.dynamic_slice(Ls, (0, bs, bs), (nb, B, B))
            x1 = lax.linalg.triangular_solve(
                L11, rhs[..., None], left_side=True, lower=True,
                transpose_a=True, unit_diagonal=True)[..., 0]
            return lax.dynamic_update_slice(yF, x1, (0, bs))

        yF = lax.fori_loop(0, nblocks, bwd_block, yF)
        y = y.at[jnp.where(elim & mask, frows, n).reshape(-1)].set(
            jnp.where(elim & mask, yF, 0.0).reshape(-1), mode="drop")

    return y[jnp.asarray(sym.iperm)]
