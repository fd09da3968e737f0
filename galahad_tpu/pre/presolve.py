"""QP presolver.

TPU-native re-design of GALAHAD's PRESOLVE (reference
src/presolve/presolve.f90: PRESOLVE_apply :2836, analyze :4017 —
a 22k-line engine of redundancy elimination, bound tightening, variable
fixing and dual tests with exact solution restoration).

Two cooperating layers:

1. ``presolve_apply`` — *shape-preserving* transforms (masking, never
   deletion — SURVEY §7.3): interval bound tightening from constraint
   activity ranges, forcing-constraint detection, free-row relaxation,
   infeasibility detection.  One compiled program stays valid across
   presolve outcomes; restoration is the identity.

2. ``presolve_reduce`` / ``presolve_restore`` — *reducing* transforms
   (the reference's main win, presolve.f90:393): run on the host, they
   ELIMINATE fixed variables, monotone (dual-test) columns, vacuous and
   singleton rows, returning a genuinely smaller QP plus a transform
   record that restores (x, y, z) of the ORIGINAL problem exactly —
   including multiplier attribution for bounds that moved between rows
   and variables (PRESOLVE's restoration contract, presolve.f90:2836).
   The reduced problem has new static shapes, so the solver retraces
   once per reduced structure — a host-side preprocessing cost, exactly
   like the reference's.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Any

import jax
import jax.numpy as jnp
from jax import lax

from ..core.config import control as control_dc
from ..core.problem import INFINITY, QP


@control_dc
class PresolveControl:
    sweeps: int = 3
    infinity: float = INFINITY
    feas_tol: float = 1.0e-9


@partial(
    jax.tree_util.register_dataclass,
    data_fields=["qp", "infeasible", "n_tightened", "n_forced_rows"],
    meta_fields=[],
)
@dataclasses.dataclass
class PresolveInfo:
    qp: Any
    infeasible: Any
    n_tightened: Any
    n_forced_rows: Any


def presolve_apply(qp: QP, ctl: PresolveControl = PresolveControl()
                   ) -> PresolveInfo:
    inf = ctl.infinity
    dt = qp.g.dtype
    n, m = qp.n, qp.m
    big = jnp.asarray(2.0 * inf, dt)

    x_l0 = jnp.where(qp.x_l > -inf, qp.x_l, -big)
    x_u0 = jnp.where(qp.x_u < inf, qp.x_u, big)

    if m == 0:
        infeas = jnp.any(x_l0 > x_u0 + ctl.feas_tol)
        return PresolveInfo(
            qp=qp, infeasible=infeas,
            n_tightened=jnp.array(0, jnp.int32),
            n_forced_rows=jnp.array(0, jnp.int32),
        )

    A = qp.A
    Ap = jnp.maximum(A, 0.0)
    An = jnp.minimum(A, 0.0)
    c_l = jnp.where(qp.c_l > -inf, qp.c_l, -big)
    c_u = jnp.where(qp.c_u < inf, qp.c_u, big)

    def clampinf(v):
        return jnp.clip(v, -big, big)

    def sweep(i, carry):
        x_l, x_u, tightened = carry
        # activity range of each row given current bounds
        act_lo = clampinf(Ap @ x_l + An @ x_u)
        act_hi = clampinf(Ap @ x_u + An @ x_l)
        # implied bound on x_j from row i:
        #   a_ij x_j in [c_l_i - (act_hi_i - contrib_hi), ...]
        # contribution of j at the extremes:
        lo_wo = act_lo[:, None] - jnp.where(A > 0, A * x_l[None, :],
                                            A * x_u[None, :])
        hi_wo = act_hi[:, None] - jnp.where(A > 0, A * x_u[None, :],
                                            A * x_l[None, :])
        # a_ij x_j >= c_l_i - hi_wo  and  a_ij x_j <= c_u_i - lo_wo
        lhs = c_l[:, None] - hi_wo
        rhs = c_u[:, None] - lo_wo
        pos = A > 0
        neg = A < 0
        new_lo = jnp.where(pos, lhs / jnp.where(pos, A, 1.0), -big)
        new_lo = jnp.where(neg, rhs / jnp.where(neg, A, 1.0), new_lo)
        new_hi = jnp.where(pos, rhs / jnp.where(pos, A, 1.0), big)
        new_hi = jnp.where(neg, lhs / jnp.where(neg, A, 1.0), new_hi)
        # only rows with finite relevant data tighten
        new_lo = jnp.where(jnp.abs(new_lo) < inf, new_lo, -big)
        new_hi = jnp.where(jnp.abs(new_hi) < inf, new_hi, big)
        cand_lo = jnp.max(new_lo, axis=0)
        cand_hi = jnp.min(new_hi, axis=0)
        x_l_new = jnp.maximum(x_l, cand_lo)
        x_u_new = jnp.minimum(x_u, cand_hi)
        tightened = tightened + jnp.sum(
            (x_l_new > x_l + 1e-12) | (x_u_new < x_u - 1e-12)
        ).astype(jnp.int32)
        return x_l_new, x_u_new, tightened

    x_l, x_u, n_tight = lax.fori_loop(
        0, ctl.sweeps, sweep, (x_l0, x_u0, jnp.array(0, jnp.int32))
    )

    act_lo = clampinf(Ap @ x_l + An @ x_u)
    act_hi = clampinf(Ap @ x_u + An @ x_l)
    # forcing rows: activity range degenerate against a bound -> every
    # variable in the row is forced to the extreme that attains it
    force_lo = act_hi <= c_l + ctl.feas_tol   # must sit at act_hi
    force_hi = act_lo >= c_u - ctl.feas_tol   # must sit at act_lo
    n_forced = jnp.sum(force_lo | force_hi)

    def apply_forcing(x_l, x_u):
        # row forces x_j to x_u_j where a_ij > 0 (for force_lo), etc.
        fl = force_lo[:, None] & (A != 0)
        fh = force_hi[:, None] & (A != 0)
        to_hi = jnp.any(fl & (A > 0), axis=0) | jnp.any(fh & (A < 0), axis=0)
        to_lo = jnp.any(fl & (A < 0), axis=0) | jnp.any(fh & (A > 0), axis=0)
        x_l = jnp.where(to_hi, x_u, x_l)
        x_u = jnp.where(to_lo, x_l, x_u)
        return x_l, x_u

    x_l, x_u = apply_forcing(x_l, x_u)

    # vacuous rows: activity range within [c_l, c_u] -> relax to free
    vacuous = (act_lo >= c_l - ctl.feas_tol) & (act_hi <= c_u + ctl.feas_tol)
    c_l_new = jnp.where(vacuous, -big, qp.c_l)
    c_u_new = jnp.where(vacuous, big, qp.c_u)

    infeasible = (
        jnp.any(x_l > x_u + ctl.feas_tol)
        | jnp.any(act_lo > c_u + ctl.feas_tol)
        | jnp.any(act_hi < c_l - ctl.feas_tol)
    )

    qp_out = dataclasses.replace(
        qp,
        x_l=jnp.where(jnp.abs(x_l) < inf, x_l, qp.x_l),
        x_u=jnp.where(jnp.abs(x_u) < inf, x_u, qp.x_u),
        c_l=c_l_new, c_u=c_u_new,
    )
    return PresolveInfo(
        qp=qp_out, infeasible=infeasible,
        n_tightened=n_tight, n_forced_rows=n_forced.astype(jnp.int32),
    )


# ---------------------------------------------------------------------------
# Reducing presolve (host-side elimination with exact restoration)
# ---------------------------------------------------------------------------

import numpy as np  # noqa: E402


@dataclasses.dataclass
class PresolveTransform:
    """Record of the eliminations; restores solutions exactly
    (PRESOLVE_restore contract, reference src/presolve/presolve.f90)."""

    n: int                     # original sizes
    m: int
    keep_x: np.ndarray         # indices of kept variables
    keep_c: np.ndarray         # indices of kept rows
    x_fixed_val: np.ndarray    # (n,) values for eliminated variables (0 if kept)
    x_fixed: np.ndarray        # (n,) bool: variable eliminated
    # singleton-row bound transfers: for each (side: 0=lower, 1=upper) and
    # each variable, the row that now carries the binding bound (-1: none)
    # and its coefficient.
    transfer_row: np.ndarray   # (2, n) int
    transfer_coef: np.ndarray  # (2, n) float
    # original variable bounds (to decide dual attribution on restore)
    x_l0: np.ndarray
    x_u0: np.ndarray
    infinity: float
    c_l0: Any = None           # original row bounds (merged-row restore)
    c_u0: Any = None
    merged_rows: Any = None    # [(kept_i, dropped_k, scale)] duplicates
    H: Any = None              # original problem data for dual recovery
    g: Any = None
    A: Any = None
    h_kind: str = "dense"
    n_fixed: int = 0
    n_rows_dropped: int = 0
    n_dual_fixed: int = 0
    infeasible: bool = False
    unbounded: bool = False


def _np_qp(qp: QP):
    # np.asarray of a jax array is a read-only view: copy for in-place math
    H = np.array(qp.H_dense(), np.float64)
    g = np.array(qp.g, np.float64)
    A = np.array(qp.A, np.float64) if qp.m else np.zeros((0, qp.n))
    return H, g, A


def presolve_reduce(qp: QP, ctl: PresolveControl = PresolveControl()):
    """Eliminate what can be eliminated; return (reduced QP, transform).

    Transforms (each with exact restoration):
      * fixed variables x_l == x_u substituted out
        (g += H[:, j] v, c bounds -= A[:, j] v, f += ...);
      * dual test on empty columns: A[:, j] == 0, H[:, j] == 0 off-diag
        -> x_j solves a separable 1-D problem; fixed at its bound /
        analytic minimum (presolve.f90 dual fixing);
      * singleton rows -> variable bounds (the row is dropped; on
        restore the bound dual is attributed back to the row when the
        ORIGINAL variable bound was looser);
      * vacuous rows (activity range inside [c_l, c_u]) and empty rows
        dropped with y = 0.
    """
    inf = ctl.infinity
    n, m = qp.n, qp.m
    H, g, A = _np_qp(qp)
    f = float(qp.f)
    x_l = np.asarray(qp.x_l, np.float64).copy()
    x_u = np.asarray(qp.x_u, np.float64).copy()
    c_l = np.asarray(qp.c_l, np.float64).copy() if m else np.zeros(0)
    c_u = np.asarray(qp.c_u, np.float64).copy() if m else np.zeros(0)

    tr = PresolveTransform(
        n=n, m=m, keep_x=np.arange(n), keep_c=np.arange(m),
        x_fixed_val=np.zeros(n), x_fixed=np.zeros(n, bool),
        transfer_row=np.full((2, n), -1, np.int64),
        transfer_coef=np.zeros((2, n)),
        x_l0=x_l.copy(), x_u0=x_u.copy(), infinity=inf,
        c_l0=c_l.copy(), c_u0=c_u.copy(), merged_rows=[],
        H=H.copy(), g=g.copy(), A=A.copy(), h_kind=qp.h_kind,
    )

    feas = ctl.feas_tol
    drop_row = np.zeros(m, bool)
    for _ in range(max(ctl.sweeps, 1)):
        changed = False

        # ---- fixed variables -------------------------------------------
        newly = (~tr.x_fixed) & (x_u - x_l <= feas) & (x_l > -inf) & (x_u < inf)
        if newly.any():
            v = 0.5 * (x_l + x_u)
            for j in np.flatnonzero(newly):
                vj = v[j]
                f += g[j] * vj + 0.5 * H[j, j] * vj * vj
                g += H[:, j] * vj
                g[j] -= H[j, j] * vj        # no self-contribution
                if m:
                    act = A[:, j] * vj
                    c_l -= np.where(np.abs(c_l) < inf, act, 0.0)
                    c_u -= np.where(np.abs(c_u) < inf, act, 0.0)
                    A[:, j] = 0.0
                H[:, j] = 0.0
                H[j, :] = 0.0
                tr.x_fixed[j] = True
                tr.x_fixed_val[j] = vj
                g[j] = 0.0
                x_l[j] = x_u[j] = 0.0
            changed = True

        # ---- dual test: empty columns ----------------------------------
        active = ~tr.x_fixed
        col_empty = active & (np.abs(A).sum(axis=0) == 0.0 if m else True)
        offdiag = np.abs(H).sum(axis=0) - np.abs(np.diag(H))
        sep = col_empty & (offdiag == 0.0)
        for j in np.flatnonzero(sep):
            hj, gj = H[j, j], g[j]
            lo = x_l[j] if x_l[j] > -inf else -np.inf
            hi = x_u[j] if x_u[j] < inf else np.inf
            if hj > 0:
                vj = np.clip(-gj / hj, lo, hi)
            elif gj > 0:
                vj = lo
            elif gj < 0:
                vj = hi
            elif hj == 0:
                vj = np.clip(0.0, lo, hi)
            else:  # hj < 0: pick the better end
                ends = [e for e in (lo, hi) if np.isfinite(e)]
                if not ends:
                    tr.unbounded = True
                    break
                vj = min(ends, key=lambda e: 0.5 * hj * e * e + gj * e)
            if not np.isfinite(vj):
                tr.unbounded = True
                break
            f += gj * vj + 0.5 * hj * vj * vj
            tr.x_fixed[j] = True
            tr.x_fixed_val[j] = vj
            tr.n_dual_fixed += 1
            H[j, j] = 0.0
            g[j] = 0.0
            x_l[j] = x_u[j] = 0.0
            changed = True
        if tr.unbounded:
            break

        # ---- dual test: DOMINATED COLUMNS (LP columns) ------------------
        # For a column with no Hessian entries, stationarity gives
        #   z_j = g_j - sum_i a_ij y_i
        # with KNOWN multiplier sign ranges per row (y_i >= 0 when only
        # c_l is finite, y_i <= 0 when only c_u, free otherwise).  If
        # the range of z_j is provably >= 0 the variable sits at its
        # LOWER bound at every optimum (and the restored z_j from
        # stationarity is correctly signed by construction); provably
        # <= 0 -> upper bound.  (The reference's dual tests,
        # src/presolve/presolve.f90:4017.)
        if m:
            y_lo = np.where(c_l > -inf,
                            np.where(c_u < inf, -np.inf, 0.0), -np.inf)
            y_hi = np.where(c_u < inf,
                            np.where(c_l > -inf, np.inf, 0.0), np.inf)
            # equality rows (c_l == c_u) are free in both directions
            eqr = (c_l > -inf) & (c_u < inf) & (c_u - c_l <= feas)
            y_lo = np.where(eqr, -np.inf, y_lo)
            y_hi = np.where(eqr, np.inf, y_hi)
            hcol = np.abs(H).sum(axis=0)
            for j in np.flatnonzero((~tr.x_fixed) & (hcol == 0.0)):
                col = A[:, j]
                nzr = np.flatnonzero((np.abs(col) > 0) & (~drop_row))
                if len(nzr) == 0:
                    continue            # handled by the separable test
                hi_terms = np.where(col[nzr] > 0, col[nzr] * y_hi[nzr],
                                    col[nzr] * y_lo[nzr])
                lo_terms = np.where(col[nzr] > 0, col[nzr] * y_lo[nzr],
                                    col[nzr] * y_hi[nzr])
                z_min = g[j] - np.sum(hi_terms)
                z_max = g[j] - np.sum(lo_terms)
                vj = None
                if np.isfinite(z_min) and z_min >= -feas:
                    if x_l[j] > -inf:
                        vj = x_l[j]
                    elif z_min > feas:
                        tr.unbounded = True
                        break
                elif np.isfinite(z_max) and z_max <= feas:
                    if x_u[j] < inf:
                        vj = x_u[j]
                    elif z_max < -feas:
                        tr.unbounded = True
                        break
                if vj is None:
                    continue
                f += g[j] * vj
                g += H[:, j] * vj
                act = A[:, j] * vj
                c_l -= np.where(np.abs(c_l) < inf, act, 0.0)
                c_u -= np.where(np.abs(c_u) < inf, act, 0.0)
                A[:, j] = 0.0
                tr.x_fixed[j] = True
                tr.x_fixed_val[j] = vj
                tr.n_dual_fixed += 1
                g[j] = 0.0
                x_l[j] = x_u[j] = 0.0
                changed = True
            if tr.unbounded:
                break

            # ---- duplicate (parallel) rows ------------------------------
            # row k = s * row i (s != 0): the pair is one constraint with
            # intersected bounds; the dropped row restores with y_k = 0
            # (all of the multiplier lives on the kept row — the two KKT
            # systems are identical).
            live = np.flatnonzero(~drop_row)
            if len(live) > 1:
                nzl = np.abs(A[live]) > 0
                # group rows by support pattern hash to limit pair scans
                sig = {}
                for ridx, i in enumerate(live):
                    key = hash(nzl[ridx].tobytes())
                    sig.setdefault(key, []).append(i)
                for rows_same in sig.values():
                    for a_i in range(len(rows_same)):
                        i = rows_same[a_i]
                        if drop_row[i] or not np.any(np.abs(A[i]) > 0):
                            continue
                        jref = int(np.argmax(np.abs(A[i])))
                        for k in rows_same[a_i + 1:]:
                            if drop_row[k] or A[k, jref] == 0:
                                continue
                            s = A[k, jref] / A[i, jref]
                            if not np.allclose(A[k], s * A[i],
                                               rtol=1e-12, atol=1e-12):
                                continue
                            # row k bounds in units of row i
                            lo_k = c_l[k] if c_l[k] > -inf else -np.inf
                            hi_k = c_u[k] if c_u[k] < inf else np.inf
                            nlo, nhi = ((lo_k / s, hi_k / s) if s > 0
                                        else (hi_k / s, lo_k / s))
                            if np.isfinite(nlo) and nlo > c_l[i]:
                                c_l[i] = nlo
                            if np.isfinite(nhi) and nhi < c_u[i]:
                                c_u[i] = nhi
                            if c_l[i] > c_u[i] + feas:
                                tr.infeasible = True
                            drop_row[k] = True
                            A[k, :] = 0.0
                            tr.merged_rows.append((int(i), int(k),
                                                   float(s)))
                            changed = True
                    if tr.infeasible:
                        break
                if tr.infeasible:
                    break

        if m:
            # ---- singleton rows -> variable bounds ---------------------
            nz = np.abs(A) > 0
            rownnz = nz.sum(axis=1)
            for i in np.flatnonzero((~drop_row) & (rownnz == 1)):
                j = int(np.flatnonzero(nz[i])[0])
                a = A[i, j]
                lo_i = c_l[i] if c_l[i] > -inf else -np.inf
                hi_i = c_u[i] if c_u[i] < inf else np.inf
                new_lo = lo_i / a if a > 0 else hi_i / a
                new_hi = hi_i / a if a > 0 else lo_i / a
                if new_lo > x_l[j] + feas or x_l[j] <= -inf:
                    if np.isfinite(new_lo) and new_lo > x_l[j]:
                        x_l[j] = new_lo
                        tr.transfer_row[0, j] = i
                        tr.transfer_coef[0, j] = a
                if new_hi < x_u[j] - feas or x_u[j] >= inf:
                    if np.isfinite(new_hi) and new_hi < x_u[j]:
                        x_u[j] = new_hi
                        tr.transfer_row[1, j] = i
                        tr.transfer_coef[1, j] = a
                drop_row[i] = True
                changed = True

            # ---- vacuous / empty rows ----------------------------------
            Ap, An = np.maximum(A, 0), np.minimum(A, 0)
            lo_b = np.where(x_l > -inf, x_l, -1e30)
            hi_b = np.where(x_u < inf, x_u, 1e30)
            act_lo = Ap @ lo_b + An @ hi_b
            act_hi = Ap @ hi_b + An @ lo_b
            ok_lo = (c_l <= -inf) | (act_lo >= c_l - feas)
            ok_hi = (c_u >= inf) | (act_hi <= c_u + feas)
            vac = (~drop_row) & ok_lo & ok_hi & np.isfinite(act_lo) & np.isfinite(act_hi)
            empty = (~drop_row) & (np.abs(A).sum(axis=1) == 0.0)
            bad = empty & (((c_l > feas) & (c_l > -inf)) | ((c_u < -feas) & (c_u < inf)))
            if bad.any():
                tr.infeasible = True
                break
            if (vac | empty).any():
                drop_row |= vac | empty
                changed = True

        if np.any((x_l > x_u + feas) & (x_l > -inf) & (x_u < inf)):
            tr.infeasible = True
            break
        if not changed:
            break

    tr.keep_x = np.flatnonzero(~tr.x_fixed)
    tr.keep_c = np.flatnonzero(~drop_row)
    tr.n_fixed = int(tr.x_fixed.sum())
    tr.n_rows_dropped = int(drop_row.sum())

    kx, kc = tr.keep_x, tr.keep_c
    dt = qp.g.dtype
    if len(kx) == 0:
        # everything eliminated: the reduced problem is empty; synthesize
        # a 1-variable trivial QP so downstream shapes stay valid
        red = QP(H=jnp.zeros((1, 1), dt), g=jnp.zeros(1, dt), f=f,
                 A=jnp.zeros((0, 1), dt),
                 c_l=jnp.zeros(0, dt), c_u=jnp.zeros(0, dt),
                 x_l=jnp.zeros(1, dt), x_u=jnp.zeros(1, dt),
                 name=qp.name, h_kind="dense")
        tr.empty = True
        return red, tr
    tr.empty = False
    red = QP(
        H=jnp.asarray(H[np.ix_(kx, kx)], dt),
        g=jnp.asarray(g[kx], dt), f=f,
        A=jnp.asarray(A[np.ix_(kc, kx)], dt),
        c_l=jnp.asarray(c_l[kc], dt), c_u=jnp.asarray(c_u[kc], dt),
        x_l=jnp.asarray(x_l[kx], dt), x_u=jnp.asarray(x_u[kx], dt),
        x=jnp.asarray(np.asarray(qp.x)[kx], dt) if qp.x is not None else None,
        y=jnp.asarray(np.asarray(qp.y)[kc], dt) if qp.y is not None else None,
        z=jnp.asarray(np.asarray(qp.z)[kx], dt) if qp.z is not None else None,
        name=qp.name, h_kind="dense",
    )
    return red, tr


def presolve_restore(tr: PresolveTransform, x_r, y_r, z_r):
    """Map a reduced-problem solution back to the original problem,
    with exact dual recovery:

      * eliminated variables: z_j = (H x + g - A' y)_j (stationarity);
      * dropped rows: y_i = 0, except singleton rows whose transferred
        variable bound is ACTIVE and strictly tighter than the original
        bound — there the bound dual moves back to the row:
        y_i = z_j / a_ij, z_j = 0 (both KKT systems are equivalent;
        the reference's restoration makes the same attribution).
    """
    x = np.zeros(tr.n)
    x[tr.keep_x] = np.asarray(x_r, np.float64)[: len(tr.keep_x)] \
        if not getattr(tr, "empty", False) else 0.0
    x[tr.x_fixed] = tr.x_fixed_val[tr.x_fixed]
    y = np.zeros(tr.m)
    if len(tr.keep_c):
        y[tr.keep_c] = np.asarray(y_r, np.float64)
    z = np.zeros(tr.n)
    if len(tr.keep_x):
        z[tr.keep_x] = np.asarray(z_r, np.float64)

    # dual attribution for transferred singleton-row bounds: transfers
    # are recorded only when STRICTLY tighter than the original bound,
    # so a dual resting on the transferred side must move back to the
    # row for original-problem complementarity to hold
    for side in (0, 1):
        for j in np.flatnonzero(tr.transfer_row[side] >= 0):
            i = int(tr.transfer_row[side, j])
            a = tr.transfer_coef[side, j]
            zj = z[j]
            active = zj > 0 if side == 0 else zj < 0
            if active:
                y[i] += zj / a
                z[j] = 0.0

    # merged duplicate rows: move the multiplier to whichever ORIGINAL
    # row's bound is actually attained (complementarity on the original
    # problem; the constraint rows are parallel so stationarity is
    # preserved by y_k = y_i / s).  Candidates are the kept row AND all
    # duplicates merged into it; the winner is the row with the smallest
    # NORMALIZED gap to its sign-consistent bound (y > 0 <-> lower bound
    # active), which needs no absolute tolerance and so cannot misfire
    # on f32-accuracy iterates (advisor r4 finding).  Groups sharing a
    # kept row are processed together, in reverse merge order so chained
    # merges (k -> i -> i2) propagate the multiplier outward.
    if getattr(tr, "merged_rows", None):
        Ax = tr.A @ x if tr.m else np.zeros(0)
        groups: dict = {}
        order = []
        for i, k, sc in tr.merged_rows:
            if i not in groups:
                groups[i] = []
                order.append(i)
            groups[i].append((k, sc))

        def gap(row, ax_row, y_row):
            """Normalized distance from ax_row to the bound on the side
            complementarity pairs with sign(y_row)."""
            b = tr.c_l0[row] if y_row > 0 else tr.c_u0[row]
            if abs(b) >= tr.infinity:
                return np.inf
            return abs(ax_row - b) / (1.0 + abs(ax_row))

        for i in reversed(order):
            yi = y[i]
            if yi == 0.0:
                continue
            best_row, best_sc, best_gap = i, 1.0, gap(i, Ax[i], yi)
            for k, sc in groups[i]:
                gk = gap(k, sc * Ax[i], yi / sc)
                if gk < best_gap:
                    best_row, best_sc, best_gap = k, sc, gk
            if best_row != i:
                y[best_row] += yi / best_sc
                y[i] = 0.0

    # stationarity dual for eliminated variables
    r = tr.H @ x + tr.g
    if tr.m:
        r -= tr.A.T @ y
    z[tr.x_fixed] = r[tr.x_fixed]
    return x, y, z
