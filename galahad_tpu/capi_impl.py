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
