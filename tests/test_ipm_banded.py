"""Banded IPM path tests: BandedQP solves must match the dense IPM on
the same problems, and the path must handle LP (banded Schur), pure
bound-constrained (banded G), and banded-H QP (PCG) modes."""
import numpy as np
import jax.numpy as jnp
import pytest

from galahad_tpu.core.problem import INFINITY, QP
from galahad_tpu.core.residuals import kkt_residuals
from galahad_tpu.linalg.band_ops import BandMatrix
from galahad_tpu.qp.ipm import IPMControl, ipm_solve
from galahad_tpu.qp.ipm_banded import (
    BandedQP,
    ipm_solve_banded,
    ipm_solve_banded_compiled,
)


def make_banded_problem(n, lp=False, seed=0):
    """QPBAND-style problem at size n: tridiagonal H (2 on diag, -1 off),
    A rows i -> vars {i, i+2}, bounds [0, 2], c_l = 1 (QPBAND.qplib
    pattern scaled up)."""
    r = np.random.default_rng(seed)
    m = n - 2
    if lp:
        h_diags, h_kind = None, "zero"
    else:
        h_diags = jnp.asarray(np.stack([
            np.full(n, 2.0),
            np.concatenate([-np.ones(n - 1), [0.0]]),
        ]))
        h_kind = "banded"
    a0 = r.uniform(0.8, 1.2, m)
    a2 = r.uniform(0.8, 1.2, m)
    A_band = BandMatrix(val=jnp.asarray(np.stack([a0, a2])),
                        offsets=(0, 2), m=m, n=n)
    g = jnp.asarray(-0.2 - 0.2 * (np.arange(n) % 5))
    return BandedQP(
        g=g, A_band=A_band,
        c_l=jnp.ones(m), c_u=jnp.full(m, INFINITY),
        x_l=jnp.zeros(n), x_u=jnp.full(n, 2.0),
        h_diags=h_diags, h_kind=h_kind, block=4,
    )


def to_dense_qp(bqp: BandedQP) -> QP:
    if bqp.h_kind == "zero":
        H, kind = None, "zero"
    else:
        n = bqp.n
        H = np.zeros((n, n))
        d = np.asarray(bqp.h_diags)
        for s in range(d.shape[0]):
            for i in range(n - s):
                H[i + s, i] = d[s, i]
                H[i, i + s] = d[s, i]
        H, kind = jnp.asarray(H), "dense"
    return QP(H=H, h_kind=kind, g=bqp.g, A=bqp.A_band.to_dense(),
              c_l=bqp.c_l, c_u=bqp.c_u, x_l=bqp.x_l, x_u=bqp.x_u)


class TestBandedIPM:
    def test_lp_matches_dense(self):
        bqp = make_banded_problem(24, lp=True)
        x, y, z, st = ipm_solve_banded(bqp)
        assert bool(st.converged)
        qp = to_dense_qp(bqp)
        rp, rd, rc = kkt_residuals(qp, x, y, z)
        assert float(rp) < 1e-6 and float(rd) < 1e-6 and float(rc) < 1e-5
        x_ref, _, _, _ = ipm_solve(qp)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   atol=1e-4)

    def test_banded_qp_matches_dense(self):
        bqp = make_banded_problem(24, lp=False)
        x, y, z, st = ipm_solve_banded(bqp)
        assert bool(st.converged)
        qp = to_dense_qp(bqp)
        rp, rd, rc = kkt_residuals(qp, x, y, z)
        assert float(rp) < 1e-6 and float(rd) < 1e-6 and float(rc) < 1e-5

    def test_bound_constrained_banded_h(self):
        """m = 0: banded G Cholesky path."""
        n = 30
        h_diags = jnp.asarray(np.stack([
            np.full(n, 2.0),
            np.concatenate([-np.ones(n - 1), [0.0]]),
        ]))
        bqp = BandedQP(
            g=jnp.full(n, -1.0), A_band=None,
            c_l=jnp.zeros(0), c_u=jnp.zeros(0),
            x_l=jnp.zeros(n), x_u=jnp.full(n, 2.0),
            h_diags=h_diags, h_kind="banded", block=4,
        )
        x, y, z, st = ipm_solve_banded(bqp)
        assert bool(st.converged)
        qp = to_dense_qp(dataclasses_replace_dense(bqp))
        rp, rd, rc = kkt_residuals(qp, x, y, z)
        assert float(rd) < 1e-6 and float(rc) < 1e-5

    def test_compiled_matches_host(self):
        bqp = make_banded_problem(20, lp=True)
        x1, _, _, st1 = ipm_solve_banded(bqp)
        x2, _, _, st2 = ipm_solve_banded_compiled(bqp)
        assert bool(st2.converged)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x2), atol=1e-7)

    def test_larger_scale(self):
        """n = 400 banded LP: solves fast and to tolerance (the dense
        path at this size would already be 160k-entry matrices)."""
        bqp = make_banded_problem(400, lp=True, seed=3)
        x, y, z, st = ipm_solve_banded(bqp)
        assert bool(st.converged)
        assert float(st.res_p) < 1e-6 and float(st.res_d) < 1e-6


def dataclasses_replace_dense(bqp):
    """helper: bound-constrained BandedQP -> object to_dense_qp accepts
    (A_band None -> empty dense A)."""
    import dataclasses as _dc

    class _Empty:
        m = 0

        def to_dense(self):
            return jnp.zeros((0, bqp.n))

    return _dc.replace(bqp, A_band=_Empty()) if bqp.A_band is None else bqp


def test_f32_conv_never_above_tolerance():
    """Regression (VERDICT r3 weak-7): BENCH_r01 once recorded
    conv=True with kkt=6.25e-5 on an f32 banded LP at stop=1e-6.  The
    stop test must never report convergence above the stated tolerance:
    whenever status == OK, every residual in the state obeys its stop."""
    import numpy as np

    from galahad_tpu.linalg.band_ops import BandMatrix
    from galahad_tpu.qp.ipm import IPMControl
    from galahad_tpu.qp.ipm_banded import BandedQP, ipm_solve_banded

    r = np.random.default_rng(3)
    n = 2000
    m = n - 2
    A = BandMatrix(
        val=jnp.asarray(np.stack([r.uniform(0.8, 1.2, m),
                                  r.uniform(0.8, 1.2, m)]), jnp.float32),
        offsets=(0, 2), m=m, n=n,
    )
    qp = BandedQP(
        g=jnp.asarray(-0.2 - 0.2 * (np.arange(n) % 5), jnp.float32),
        A_band=A,
        c_l=jnp.ones(m, jnp.float32), c_u=jnp.full(m, 1e20, jnp.float32),
        x_l=jnp.zeros(n, jnp.float32), x_u=jnp.full(n, 2.0, jnp.float32),
        h_kind="zero", block=8,
    )
    tol = 1e-6
    ctl = IPMControl(maxit=60, stop_abs_p=tol, stop_abs_d=tol,
                     stop_abs_c=tol, dtype="float32")
    x, y, z, st = ipm_solve_banded(qp, ctl)
    if int(st.status) == 0:
        assert float(st.res_p) <= tol
        assert float(st.res_d) <= tol
        assert float(st.res_c) <= tol
    else:
        # not converged must never be reported as OK
        assert not bool(st.converged)
