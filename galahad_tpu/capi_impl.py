"""Python side of the C interface (see interfaces/c/capi.c).

Receives raw pointers (as integers) from the embedding shim, wraps them
zero-copy with numpy, runs the requested solver, writes results back
into the caller's buffers, and returns the inform scalars.  Mirrors the
role of the reference's per-package *_ciface.f90 modules
(src/cqp/C/cqp_ciface.f90:14-80).
"""
from __future__ import annotations

import ctypes

import numpy as np


def _view(addr: int, shape, writeable: bool = False):
    if addr == 0:
        return None
    n = int(np.prod(shape))
    buf = (ctypes.c_double * n).from_address(addr)
    a = np.ctypeslib.as_array(buf).reshape(shape)
    if not writeable:
        a = a.copy()
    return a


def qp_solve_raw(solver, n, m, H, g, f, A, c_l, c_u, x_l, x_u,
                 x_out, y_out, z_out):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .core.problem import QP
    from .core.residuals import kkt_residuals
    from .qp.frontend import QPControl, qp_solve

    g_v = _view(g, (n,))
    H_v = _view(H, (n, n))
    A_v = _view(A, (m, n)) if m else np.zeros((0, n))
    qp = QP(
        H=None if H_v is None else jnp.asarray(H_v),
        h_kind="zero" if H_v is None else "dense",
        g=jnp.asarray(g_v),
        A=jnp.asarray(A_v),
        c_l=jnp.asarray(_view(c_l, (m,)) if m else np.zeros(0)),
        c_u=jnp.asarray(_view(c_u, (m,)) if m else np.zeros(0)),
        x_l=jnp.asarray(_view(x_l, (n,))),
        x_u=jnp.asarray(_view(x_u, (n,))),
        f=float(f),
    )
    x, y, z, info = qp_solve(
        qp, QPControl(quadratic_programming_solver=solver))
    rp, rd, rc = kkt_residuals(qp, x, y, z)
    _view(x_out, (n,), writeable=True)[:] = np.asarray(x)
    if m:
        _view(y_out, (m,), writeable=True)[:] = np.asarray(y)
    if z_out:
        _view(z_out, (n,), writeable=True)[:] = np.asarray(z)
    status = getattr(info, "status", 0)
    try:
        status = int(status)
    except TypeError:
        status = 0
    it = getattr(info, "iter", -1)
    obj = float(0.5 * x @ qp.Hx(x) + qp.g @ x + qp.f)
    return (status, int(it) if it is not None else -1, obj,
            float(rp), float(rd), float(rc))


# ---------------------------------------------------------------------------
# per-package entries (the reference's per-package C interface role:
# src/<pkg>/C/<pkg>_ciface.f90 mirrors each control/inform type; here each
# raw entry takes that package's control fields explicitly)
# ---------------------------------------------------------------------------

_ARCS = ("mehrotra", "taylor", "puiseux", "zhao_sun")


def cqp_solve_raw(n, m, maxit, print_level, series_order, arc,
                  stop_abs_p, stop_abs_d, stop_abs_c,
                  H, g, f, A, c_l, c_u, x_l, x_u, x_out, y_out, z_out):
    """CQP with the full IPM control set (cqp_ciface role)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .core.problem import QP
    from .core.residuals import kkt_residuals
    from .qp.ipm import IPMControl, ipm_solve

    g_v = _view(g, (n,))
    H_v = _view(H, (n, n))
    A_v = _view(A, (m, n)) if m else np.zeros((0, n))
    qp = QP(
        H=None if H_v is None else jnp.asarray(H_v),
        h_kind="zero" if H_v is None else "dense",
        g=jnp.asarray(g_v), A=jnp.asarray(A_v),
        c_l=jnp.asarray(_view(c_l, (m,)) if m else np.zeros(0)),
        c_u=jnp.asarray(_view(c_u, (m,)) if m else np.zeros(0)),
        x_l=jnp.asarray(_view(x_l, (n,))),
        x_u=jnp.asarray(_view(x_u, (n,))),
        f=float(f),
    )
    ctl = IPMControl(
        maxit=int(maxit), series_order=int(series_order),
        arc=_ARCS[int(arc) % len(_ARCS)],
        stop_abs_p=float(stop_abs_p), stop_abs_d=float(stop_abs_d),
        stop_abs_c=float(stop_abs_c), print_level=int(print_level),
    )
    x, y, z, st = ipm_solve(qp, ctl)
    rp, rd, rc = kkt_residuals(qp, x, y, z)
    _view(x_out, (n,), writeable=True)[:] = np.asarray(x)
    if m:
        _view(y_out, (m,), writeable=True)[:] = np.asarray(y)
    if z_out:
        _view(z_out, (n,), writeable=True)[:] = np.asarray(z)
    obj = float(0.5 * x @ qp.Hx(x) + qp.g @ x + qp.f)
    return (int(st.status), int(st.iter), obj,
            float(rp), float(rd), float(rc))


def qpa_solve_raw(n, m, maxit, feas_tol, multiplier_tol,
                  H, g, f, A, c_l, c_u, x_l, x_u, x_out, y_out, z_out):
    """QPA active-set with its control set (qpa_ciface role)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .core.problem import QP
    from .core.residuals import kkt_residuals
    from .qp.qpa import QPAControl, qpa_solve

    g_v = _view(g, (n,))
    H_v = _view(H, (n, n))
    A_v = _view(A, (m, n)) if m else np.zeros((0, n))
    qp = QP(
        H=jnp.asarray(H_v), g=jnp.asarray(g_v), A=jnp.asarray(A_v),
        c_l=jnp.asarray(_view(c_l, (m,)) if m else np.zeros(0)),
        c_u=jnp.asarray(_view(c_u, (m,)) if m else np.zeros(0)),
        x_l=jnp.asarray(_view(x_l, (n,))),
        x_u=jnp.asarray(_view(x_u, (n,))),
        f=float(f),
    )
    info = qpa_solve(qp, ctl=QPAControl(
        maxit=int(maxit), feas_tol=float(feas_tol),
        multiplier_tol=float(multiplier_tol)))
    rp, rd, rc = kkt_residuals(qp, info.x, info.y, info.z)
    _view(x_out, (n,), writeable=True)[:] = np.asarray(info.x)
    if m:
        _view(y_out, (m,), writeable=True)[:] = np.asarray(info.y)
    if z_out:
        _view(z_out, (n,), writeable=True)[:] = np.asarray(info.z)
    return (int(info.status), int(info.iter), float(info.obj),
            float(rp), float(rd), float(rc))


def trs_solve_raw(n, H, g, radius, x_out):
    """TRS exact trust-region subproblem (trs_ciface role).  Returns
    (status, multiplier, obj, norm_x, hard_case)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .tr.trs import trs_solve

    info = trs_solve(jnp.asarray(_view(H, (n, n))),
                     jnp.asarray(_view(g, (n,))), float(radius))
    _view(x_out, (n,), writeable=True)[:] = np.asarray(info.x)
    return (0, float(info.multiplier), float(info.obj),
            float(info.norm_x), int(bool(info.hard_case)))


def rqs_solve_raw(n, H, g, sigma, power, x_out):
    """RQS regularized quadratic subproblem (rqs_ciface role)."""
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .tr.trs import rqs_solve

    info = rqs_solve(jnp.asarray(_view(H, (n, n))),
                     jnp.asarray(_view(g, (n,))), float(sigma),
                     p=float(power))
    _view(x_out, (n,), writeable=True)[:] = np.asarray(info.x)
    return (0, float(info.multiplier), float(info.obj),
            float(info.norm_x), int(bool(info.hard_case)))


# SLS handle registry (the reference's C interface keeps per-package
# opaque data pointers; sls_ciface import/analyse/factorize/solve)
_SLS_HANDLES = {}
_SLS_NEXT = [1]


def _iview(addr: int, shape):
    if addr == 0:
        return None
    nn = int(np.prod(shape))
    buf = (ctypes.c_int32 * nn).from_address(addr)
    return np.ctypeslib.as_array(buf).reshape(shape).copy()


def sls_analyse_raw(n, nnz, rows, cols, order):
    """Symbolic analysis of a symmetric COO pattern; returns handle."""
    from .linalg.supernodal import supernodal_analyse

    r = _iview(rows, (nnz,))
    c = _iview(cols, (nnz,))
    order_s = {0: "amd", 1: "rcm", 2: "nd", 3: "best",
               4: "natural"}.get(int(order), "amd")
    sym = supernodal_analyse(r, c, int(n), order=order_s)
    h = _SLS_NEXT[0]
    _SLS_NEXT[0] += 1
    _SLS_HANDLES[h] = dict(sym=sym, fac=None, n=int(n), nnz=int(nnz))
    return h


def sls_factorize_raw(handle, vals, shift):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .linalg.supernodal import supernodal_factorize

    ent = _SLS_HANDLES.get(int(handle))
    if ent is None:
        return -26
    v = _view(vals, (ent["nnz"],))
    ent["fac"] = supernodal_factorize(ent["sym"], jnp.asarray(v),
                                      shift=float(shift))
    return 0


def sls_solve_raw(handle, b, x_out):
    import jax

    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from .linalg.supernodal import supernodal_solve

    ent = _SLS_HANDLES.get(int(handle))
    if ent is None or ent["fac"] is None:
        return -26
    n = ent["n"]
    x = supernodal_solve(ent["sym"], ent["fac"],
                         jnp.asarray(_view(b, (n,))))
    _view(x_out, (n,), writeable=True)[:] = np.asarray(x)
    return 0


def sls_inertia_raw(handle, out3):
    ent = _SLS_HANDLES.get(int(handle))
    if ent is None or ent["fac"] is None:
        return -26
    buf = (ctypes.c_int32 * 3).from_address(out3)
    inert = np.asarray(ent["fac"].inertia)
    buf[0], buf[1], buf[2] = int(inert[0]), int(inert[1]), int(inert[2])
    return 0


def sls_free_raw(handle):
    _SLS_HANDLES.pop(int(handle), None)
    return 0
