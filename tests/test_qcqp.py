"""QCQP: quadratic constraints end-to-end (RPD 'Q'-constraint classes,
reference src/rpd/rpd.f90:20-45; solved via the AL route the reference
itself uses for nonlinear constraints, src/lancelot/lancelot.f90:499)."""
import textwrap

import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.io import qplib
from galahad_tpu.qp.qcqp import QCQP, QCQPControl, qcqp_solve


def _ball_qcqp(dtype=jnp.float64):
    # min x1 + x2  s.t.  1/2(x1^2 + x2^2) <= 1/2   ->  x* = -(1,1)/sqrt(2)
    n, m = 2, 1
    return QCQP(
        H=None, h_kind="zero",
        g=jnp.ones(n, dtype),
        A=jnp.zeros((m, n), dtype),
        Qc=jnp.stack([jnp.eye(n, dtype=dtype)]),
        c_l=jnp.full(m, -1e19, dtype),
        c_u=jnp.full(m, 0.5, dtype),
        x_l=jnp.full(n, -1e19, dtype),
        x_u=jnp.full(n, 1e19, dtype),
        x=jnp.zeros(n, dtype),
    )


def test_qcqp_ball():
    p = _ball_qcqp()
    out = qcqp_solve(p)
    assert bool(out.converged)
    x_star = -np.ones(2) / np.sqrt(2)
    np.testing.assert_allclose(np.asarray(out.x), x_star, atol=5e-5)
    np.testing.assert_allclose(float(out.obj), -np.sqrt(2), atol=1e-4)
    # KKT: g + y * Q x = 0 with y <= 0 for an upper-bounded constraint
    # (multiplier sign follows the c(x) <= c_u convention y_u >= 0,
    # lancelot returns y = (w - s)/mu < 0 at an upper bound? check residual)
    gL = np.ones(2) + float(out.y[0]) * np.asarray(out.x)
    np.testing.assert_allclose(gL, 0.0, atol=5e-4)


def test_qcqp_filter_path():
    p = _ball_qcqp()
    # badly infeasible start
    p = p.__class__(**{**{f.name: getattr(p, f.name)
                          for f in p.__dataclass_fields__.values()},
                       "x": jnp.array([30.0, 30.0])})
    out = qcqp_solve(p, QCQPControl(method="filter"))
    assert bool(out.converged)
    np.testing.assert_allclose(float(out.obj), -np.sqrt(2), atol=1e-3)


QCQP_FILE = textwrap.dedent("""\
    ! toy QCQP fixture (QPLIB grammar, examples/QPBAND.qplib:1-15)
    BALL2
    QCQ
    Minimize
    2        ! n
    1        ! m
    2        ! Hobj nnz
    1 1 0.2
    2 2 0.2
    1.0      ! g default
    0        ! g exceptions
    0.0      ! f
    2        ! constraint Hessian nnz
    1 1 1 1.0
    1 2 2 1.0
    0        ! A nnz
    1.0E+20  ! infinity
    -1.0E+20 ! c_l default
    0
    0.5      ! c_u default
    0
    -1.0E+20 ! x_l default
    0
    1.0E+20  ! x_u default
    0
    0.0      ! x0
    0
    0.0      ! y0
    0
    0.0      ! z0
    0
    0
    0
    """)


def test_qplib_qcqp_roundtrip(tmp_path):
    p = qplib.loads(QCQP_FILE)
    assert p.ptype == "QCQ"
    assert len(p.H_c) == 2
    # to_qp must refuse, to_qcqp must solve
    with pytest.raises(ValueError):
        p.to_qp()
    q = p.to_qcqp()
    out = qcqp_solve(q)
    assert bool(out.converged)
    # obj = min x1+x2+0.1(x1^2+x2^2) on the ball: still interiorish; just
    # check feasibility and KKT stationarity via the solver's own report
    assert float(out.infeas) <= 1e-6
    # writer round-trip preserves the quadratic constraint terms
    txt = qplib.dumps(p)
    p2 = qplib.loads(txt)
    assert p2.H_c == p.H_c
    out2 = qcqp_solve(p2.to_qcqp())
    np.testing.assert_allclose(float(out2.obj), float(out.obj), atol=1e-6)
