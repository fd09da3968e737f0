"""Problem-transform layer tests (SCALE / FDC / PRESOLVE equivalents)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.core.problem import INFINITY, QP
from galahad_tpu.core.residuals import kkt_residuals
from galahad_tpu.pre import (
    FDCControl,
    PresolveControl,
    ScaleControl,
    Scaling,
    fdc_find_dependent,
    presolve_apply,
    scale_apply,
    scale_get,
    scale_recover,
)
from galahad_tpu.qp.ipm import ipm_solve

from test_ipm import random_convex_qp


class TestScale:
    @pytest.mark.parametrize("method", ["sinkhorn", "norm", "curtis_reid"])
    def test_solution_roundtrip(self, method):
        """Solve scaled problem, recover solution, check original KKT."""
        qp = random_convex_qp(8, 4, 400)
        s = scale_get(qp, ScaleControl(method=method))
        qps = scale_apply(qp, s)
        x_s, y_s, z_s, st = ipm_solve(qps)
        assert bool(st.converged)
        x, y, z = scale_recover(s, x_s, y_s, z_s)
        rp, rd, rc = kkt_residuals(qp, x, y, z)
        assert float(rp) < 1e-5 and float(rd) < 1e-5 and float(rc) < 1e-5
        x_ref, _, _, _ = ipm_solve(qp)
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref), atol=1e-4)

    def test_badly_scaled_matrix_improves(self):
        """Equilibration must reduce the dynamic range of A."""
        r = np.random.default_rng(1)
        A = r.normal(size=(5, 6)) * (10.0 ** r.integers(-4, 4, size=(5, 6)))
        qp = QP(
            H=jnp.eye(6), g=jnp.zeros(6), A=jnp.asarray(A),
            c_l=-jnp.ones(5), c_u=jnp.ones(5),
            x_l=jnp.zeros(6), x_u=jnp.ones(6),
        )
        s = scale_get(qp, ScaleControl(method="sinkhorn", sweeps=20))
        As = np.asarray(qp.A) * np.asarray(s.row)[:, None] * np.asarray(s.col)
        nz = np.abs(As[np.abs(As) > 0])
        nz0 = np.abs(A[np.abs(A) > 0])
        assert nz.max() / nz.min() < nz0.max() / nz0.min()

    def test_infinite_bounds_preserved(self):
        qp = random_convex_qp(6, 3, 402)
        qp = dataclasses.replace(qp, x_u=jnp.full(6, INFINITY))
        s = scale_get(qp)
        qps = scale_apply(qp, s)
        assert bool(jnp.all(qps.x_u >= INFINITY))


class TestFDC:
    def test_detects_duplicate_row(self):
        r = np.random.default_rng(2)
        A0 = r.normal(size=(3, 6))
        A = np.vstack([A0, 2.0 * A0[1]])        # row 3 = 2 * row 1
        b = np.array([1.0, 2.0, 3.0, 4.0])      # consistent (2*2=4)
        info = fdc_find_dependent(jnp.asarray(A), jnp.asarray(b))
        assert int(info.n_dependent) == 1
        assert not bool(info.independent[3])
        assert not bool(info.inconsistent)

    def test_detects_inconsistent_rhs(self):
        r = np.random.default_rng(3)
        A0 = r.normal(size=(2, 5))
        A = np.vstack([A0, A0[0]])
        b = np.array([1.0, 2.0, 5.0])           # inconsistent copy
        info = fdc_find_dependent(jnp.asarray(A), jnp.asarray(b))
        assert int(info.n_dependent) == 1
        assert bool(info.inconsistent)

    def test_full_rank(self):
        r = np.random.default_rng(4)
        A = r.normal(size=(4, 7))
        info = fdc_find_dependent(jnp.asarray(A), jnp.zeros(4))
        assert int(info.n_dependent) == 0


class TestPresolve:
    def test_bound_tightening(self):
        """x0 + x1 <= 1, x >= 0 implies x <= 1 componentwise."""
        qp = QP(
            H=jnp.eye(2), g=jnp.zeros(2),
            A=jnp.ones((1, 2)),
            c_l=jnp.array([-INFINITY]), c_u=jnp.array([1.0]),
            x_l=jnp.zeros(2), x_u=jnp.full(2, INFINITY),
        )
        info = presolve_apply(qp)
        assert not bool(info.infeasible)
        np.testing.assert_allclose(np.asarray(info.qp.x_u), [1.0, 1.0],
                                   atol=1e-9)

    def test_forcing_constraint(self):
        """x0 + x1 >= 2 with x in [0,1]^2 forces x = (1,1)."""
        qp = QP(
            H=jnp.eye(2), g=jnp.zeros(2),
            A=jnp.ones((1, 2)),
            c_l=jnp.array([2.0]), c_u=jnp.array([INFINITY]),
            x_l=jnp.zeros(2), x_u=jnp.ones(2),
        )
        info = presolve_apply(qp)
        assert not bool(info.infeasible)
        assert int(info.n_forced_rows) == 1
        np.testing.assert_allclose(np.asarray(info.qp.x_l), [1.0, 1.0],
                                   atol=1e-9)

    def test_infeasible_detected(self):
        qp = QP(
            H=jnp.eye(2), g=jnp.zeros(2),
            A=jnp.ones((1, 2)),
            c_l=jnp.array([5.0]), c_u=jnp.array([INFINITY]),
            x_l=jnp.zeros(2), x_u=jnp.ones(2),
        )
        info = presolve_apply(qp)
        assert bool(info.infeasible)

    def test_vacuous_row_freed(self):
        """Row whose activity range sits inside its bounds is relaxed."""
        qp = QP(
            H=jnp.eye(2), g=jnp.zeros(2),
            A=jnp.ones((1, 2)),
            c_l=jnp.array([-100.0]), c_u=jnp.array([100.0]),
            x_l=jnp.zeros(2), x_u=jnp.ones(2),
        )
        info = presolve_apply(qp)
        assert float(info.qp.c_u[0]) >= INFINITY

    def test_solution_unchanged(self):
        """Presolve must not change the solution of a well-posed QP."""
        qp = random_convex_qp(8, 4, 410)
        info = presolve_apply(qp)
        assert not bool(info.infeasible)
        x0, _, _, _ = ipm_solve(qp)
        x1, _, _, st = ipm_solve(info.qp)
        assert bool(st.converged)
        np.testing.assert_allclose(np.asarray(x1), np.asarray(x0), atol=1e-5)
