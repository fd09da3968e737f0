"""EQP / BQP / BLLS / DQP / CCQP solver tests.

Contract: KKT optimality on random and structured instances, agreement
with the IPM solver and closed forms, warm-start behavior.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.core.problem import INFINITY, QP
from galahad_tpu.core.residuals import kkt_residuals
from galahad_tpu.qp.bqp import BLLSControl, BQPControl, blls_solve, bqp_solve
from galahad_tpu.qp.dqp import DQPControl, ccqp_solve, dqp_solve
from galahad_tpu.qp.eqp import EQPControl, eqp_solve
from galahad_tpu.qp.ipm import ipm_solve

from test_ipm import random_convex_qp


class TestEQP:
    def test_matches_kkt_solution(self):
        r = np.random.default_rng(0)
        n, m = 8, 3
        B = r.normal(size=(n, n))
        H = B @ B.T + np.eye(n)
        g = r.normal(size=n)
        A = r.normal(size=(m, n))
        c = r.normal(size=m)
        info = eqp_solve(jnp.asarray(H), jnp.asarray(g), jnp.asarray(A),
                         jnp.asarray(c))
        # dense KKT reference
        K = np.block([[H, A.T], [A, np.zeros((m, m))]])
        sol = np.linalg.solve(K, np.concatenate([-g, c]))
        np.testing.assert_allclose(np.asarray(info.x), sol[:n], atol=1e-7)
        np.testing.assert_allclose(np.asarray(info.y), -sol[n:], atol=1e-6)

    def test_constraint_satisfied(self):
        r = np.random.default_rng(1)
        n, m = 10, 4
        H = np.diag(r.uniform(0.5, 2.0, n))
        A = r.normal(size=(m, n))
        c = r.normal(size=m)
        info = eqp_solve(jnp.asarray(H), jnp.asarray(r.normal(size=n)),
                         jnp.asarray(A), jnp.asarray(c))
        np.testing.assert_allclose(np.asarray(A @ np.asarray(info.x)), c,
                                   atol=1e-8)

    def test_trust_region_active(self):
        """Small radius: ||s|| = radius with s the nullspace step."""
        r = np.random.default_rng(2)
        n, m = 6, 2
        B = r.normal(size=(n, n))
        H = B @ B.T
        A = r.normal(size=(m, n))
        info = eqp_solve(jnp.asarray(H), jnp.asarray(5.0 * r.normal(size=n)),
                         jnp.asarray(A), jnp.zeros(2),
                         ctl=EQPControl(radius=0.1))
        assert float(info.norm_x) == pytest.approx(0.1, rel=1e-6)
        np.testing.assert_allclose(np.asarray(A @ np.asarray(info.x)),
                                   np.zeros(m), atol=1e-9)

    def test_indefinite_with_radius(self):
        """Indefinite H on the nullspace: TR keeps it well-posed."""
        r = np.random.default_rng(3)
        n, m = 6, 2
        B = r.normal(size=(n, n))
        H = (B + B.T) / 2  # indefinite
        A = r.normal(size=(m, n))
        info = eqp_solve(jnp.asarray(H), jnp.asarray(r.normal(size=n)),
                         jnp.asarray(A), jnp.zeros(2),
                         ctl=EQPControl(radius=1.0))
        assert float(info.norm_x) <= 1.0 + 1e-8
        np.testing.assert_allclose(np.asarray(A @ np.asarray(info.x)),
                                   np.zeros(m), atol=1e-8)


class TestBQP:
    def test_matches_ipm(self):
        r = np.random.default_rng(4)
        n = 8
        B = r.normal(size=(n, n))
        H = B @ B.T + np.eye(n)
        g = r.normal(size=n) * 3.0
        info = bqp_solve(jnp.asarray(H), jnp.asarray(g),
                         jnp.zeros(n), jnp.ones(n))
        assert bool(info.converged)
        qp = QP(H=jnp.asarray(H), g=jnp.asarray(g),
                A=jnp.zeros((0, n)), c_l=jnp.zeros(0), c_u=jnp.zeros(0),
                x_l=jnp.zeros(n), x_u=jnp.ones(n))
        x_ref, _, _, _ = ipm_solve(qp)
        np.testing.assert_allclose(np.asarray(info.x), np.asarray(x_ref),
                                   atol=1e-5)

    def test_dual_signs(self):
        """z <= 0 at upper-active, z >= 0 at lower-active, ~0 on free."""
        r = np.random.default_rng(5)
        n = 6
        H = np.diag(r.uniform(1.0, 2.0, n))
        g = np.array([3.0, -3.0, 0.1, -0.1, 2.0, -2.0])
        info = bqp_solve(jnp.asarray(H), jnp.asarray(g),
                         -jnp.ones(n), jnp.ones(n))
        x = np.asarray(info.x)
        z = np.asarray(info.z)
        for i in range(n):
            if x[i] <= -1 + 1e-8:
                assert z[i] >= -1e-7        # lower bound active
            elif x[i] >= 1 - 1e-8:
                assert z[i] <= 1e-7         # upper bound active
            else:
                assert abs(z[i]) < 1e-6


class TestBLLS:
    def test_interior_matches_lstsq(self):
        r = np.random.default_rng(6)
        A = r.normal(size=(12, 5))
        x_true = r.uniform(0.3, 0.7, 5)
        b = A @ x_true
        info = blls_solve(jnp.asarray(A), jnp.asarray(b),
                          jnp.zeros(5), jnp.ones(5))
        np.testing.assert_allclose(np.asarray(info.x), x_true, atol=1e-6)
        assert float(info.obj) < 1e-12

    def test_bounds_active(self):
        r = np.random.default_rng(7)
        A = r.normal(size=(10, 4))
        x_out = np.array([2.0, -1.0, 0.5, 3.0])   # outside [0,1]
        b = A @ x_out
        info = blls_solve(jnp.asarray(A), jnp.asarray(b),
                          jnp.zeros(4), jnp.ones(4))
        assert bool(info.converged)
        x = np.asarray(info.x)
        assert np.all(x >= -1e-10) and np.all(x <= 1 + 1e-10)
        # KKT: projected gradient vanishes
        assert float(info.norm_pg) < 1e-6

    def test_ridge_weight(self):
        r = np.random.default_rng(8)
        A = r.normal(size=(8, 4))
        b = r.normal(size=8)
        w = 0.5
        info = blls_solve(jnp.asarray(A), jnp.asarray(b),
                          jnp.full(4, -10.0), jnp.full(4, 10.0),
                          ctl=BLLSControl(weight=w))
        xstar = np.linalg.solve(A.T @ A + w * np.eye(4), A.T @ b)
        np.testing.assert_allclose(np.asarray(info.x), xstar, atol=1e-6)


class TestDQP:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_ipm(self, seed):
        qp = random_convex_qp(8, 4, 300 + seed)
        info = dqp_solve(qp)
        assert bool(info.converged)
        x_ref, _, _, _ = ipm_solve(qp)
        np.testing.assert_allclose(np.asarray(info.x), np.asarray(x_ref),
                                   atol=1e-4)
        rp, rd, rc = kkt_residuals(qp, info.x, info.y, info.z)
        assert float(rp) < 1e-6 and float(rd) < 1e-6 and float(rc) < 1e-5

    def test_with_equalities(self):
        qp = random_convex_qp(8, 4, 310, equalities=2)
        info = dqp_solve(qp)
        assert bool(info.converged)
        rp, rd, rc = kkt_residuals(qp, info.x, info.y, info.z)
        assert float(rp) < 1e-6 and float(rd) < 1e-6 and float(rc) < 1e-5

    def test_warm_start_fewer_iterations(self):
        qp = random_convex_qp(10, 5, 320)
        cold = dqp_solve(qp)
        x, y, z, st = ipm_solve(qp)
        warm = dqp_solve(qp, y0=y, z0=z)
        assert bool(warm.converged)
        assert int(warm.iter) <= int(cold.iter)

    def test_diagonal_h(self):
        n = 5
        qp = QP(
            H=jnp.arange(1.0, n + 1.0), h_kind="diagonal",
            g=-jnp.ones(n),
            A=jnp.ones((1, n)), c_l=jnp.array([-INFINITY]),
            c_u=jnp.array([1.0]),
            x_l=jnp.zeros(n), x_u=jnp.full(n, 10.0),
        )
        info = dqp_solve(qp)
        assert bool(info.converged)
        rp, rd, rc = kkt_residuals(qp, info.x, info.y, info.z)
        assert float(rp) < 1e-6 and float(rd) < 1e-6


class TestCCQP:
    def test_crossover_quality(self):
        qp = random_convex_qp(8, 4, 330)
        info = ccqp_solve(qp)
        assert bool(info.converged)
        rp, rd, rc = kkt_residuals(qp, info.x, info.y, info.z)
        # crossover should reach tighter complementarity than plain IPM
        assert float(rp) < 1e-6 and float(rd) < 1e-6 and float(rc) < 1e-7
