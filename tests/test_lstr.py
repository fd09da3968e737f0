"""Golub-Kahan least-squares Krylov solver tests (LSTR/LSRT/L2RT).

Contracts: optimality conditions of each regularized/constrained LS
problem, agreement with dense reference solves, batching.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.tr import (
    L2RTControl,
    LSRTControl,
    LSTRControl,
    l2rt_solve,
    lsrt_solve,
    lstr_solve,
)


def ops(A):
    A = jnp.asarray(A)
    return (lambda v: A @ v), (lambda u: A.T @ u)


class TestLSTR:
    def test_interior_matches_lstsq(self):
        r = np.random.default_rng(0)
        A = r.normal(size=(12, 6))
        b = r.normal(size=12)
        mv, rmv = ops(A)
        info = lstr_solve(mv, rmv, jnp.asarray(b), 100.0)
        xstar, *_ = np.linalg.lstsq(A, b, rcond=None)
        np.testing.assert_allclose(np.asarray(info.x), xstar, atol=1e-8)
        assert float(info.r_norm) == pytest.approx(
            np.linalg.norm(A @ xstar - b), abs=1e-8
        )

    def test_boundary_kkt(self):
        """||x|| = radius and (A'A + lam I) x = A'b with lam >= 0."""
        r = np.random.default_rng(1)
        A = r.normal(size=(10, 8))
        b = r.normal(size=10) * 5.0
        mv, rmv = ops(A)
        rad = 0.3
        info = lstr_solve(mv, rmv, jnp.asarray(b), rad)
        x = np.asarray(info.x)
        lam = float(info.multiplier)
        assert np.linalg.norm(x) == pytest.approx(rad, rel=1e-7)
        assert lam > 0
        res = A.T @ (A @ x - b) + lam * x
        assert np.linalg.norm(res) < 1e-7 * np.linalg.norm(A.T @ b)

    def test_underdetermined(self):
        r = np.random.default_rng(2)
        A = r.normal(size=(4, 9))
        b = r.normal(size=4)
        mv, rmv = ops(A)
        info = lstr_solve(mv, rmv, jnp.asarray(b), 50.0)
        # residual should vanish (system consistent)
        assert float(info.r_norm) < 1e-8

    def test_batched(self):
        r = np.random.default_rng(3)
        As = jnp.asarray(r.normal(size=(5, 8, 4)))
        bs = jnp.asarray(r.normal(size=(5, 8)))

        def solve(A, b):
            return lstr_solve(lambda v: A @ v, lambda u: A.T @ u, b, 0.5).x

        xs = jax.jit(jax.vmap(solve))(As, bs)
        for i in range(5):
            x1 = lstr_solve(lambda v: As[i] @ v, lambda u: As[i].T @ u,
                            bs[i], 0.5).x
            np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x1),
                                       atol=1e-9)


class TestLSRT:
    def test_tikhonov_p2(self):
        """p=2: x = (A'A + sigma I)^-1 A'b exactly."""
        r = np.random.default_rng(4)
        A = r.normal(size=(9, 5))
        b = r.normal(size=9)
        sigma = 0.7
        mv, rmv = ops(A)
        info = lsrt_solve(mv, rmv, jnp.asarray(b), sigma, p=2.0)
        xstar = np.linalg.solve(A.T @ A + sigma * np.eye(5), A.T @ b)
        np.testing.assert_allclose(np.asarray(info.x), xstar, atol=1e-9)

    def test_p3_optimality(self):
        """(A'A + s I) x = A'b with s = sigma ||x||."""
        r = np.random.default_rng(5)
        A = r.normal(size=(10, 6))
        b = r.normal(size=10) * 3.0
        sigma = 0.5
        mv, rmv = ops(A)
        info = lsrt_solve(mv, rmv, jnp.asarray(b), sigma, p=3.0)
        x = np.asarray(info.x)
        s = sigma * np.linalg.norm(x)
        res = A.T @ (A @ x - b) + s * x
        assert np.linalg.norm(res) < 1e-7 * max(1.0, np.linalg.norm(A.T @ b))


class TestL2RT:
    def test_optimality(self):
        """gradient of ||Ax-b|| + (sigma/p)||x||^p vanishes."""
        r = np.random.default_rng(6)
        A = r.normal(size=(12, 5))
        b = r.normal(size=12) * 2.0
        sigma, p = 0.8, 3.0
        mv, rmv = ops(A)
        info = l2rt_solve(mv, rmv, jnp.asarray(b), sigma, p=p)
        x = np.asarray(info.x)
        rvec = A @ x - b
        rn = np.linalg.norm(rvec)
        grad = A.T @ rvec / rn + sigma * np.linalg.norm(x) * x
        assert np.linalg.norm(grad) < 1e-5

    def test_with_mu(self):
        r = np.random.default_rng(7)
        A = r.normal(size=(8, 4))
        b = r.normal(size=8)
        sigma, p, mu = 0.3, 3.0, 0.2
        mv, rmv = ops(A)
        info = l2rt_solve(mv, rmv, jnp.asarray(b), sigma, p=p, mu=mu)
        x = np.asarray(info.x)
        rvec = A @ x - b
        rn = np.linalg.norm(rvec)
        grad = A.T @ rvec / rn + mu * x + sigma * np.linalg.norm(x) * x
        assert np.linalg.norm(grad) < 1e-5
