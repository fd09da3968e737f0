"""LLST / LLS / LQR / LQT and CHECK / FDH tests (reference src/llst,
src/lls, src/lqr, src/lqt, src/check, src/fdh test programs)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.nlp import (
    CheckControl,
    check_derivatives,
    fdh_analyse,
    fdh_estimate,
    lancelot_simple,
)
from galahad_tpu.tr import (
    LLSTControl,
    LQRControl,
    llst_solve,
    lls_solve,
    lqr_solve,
    lqt_solve,
    trs_solve,
    rqs_solve,
)


def _lsq_problem(m=10, n=6, seed=0):
    r = np.random.default_rng(seed)
    A = jnp.asarray(r.normal(size=(m, n)))
    b = jnp.asarray(r.normal(size=m))
    return A, b


class TestLLST:
    def test_interior(self):
        A, b = _lsq_problem()
        x_ls = jnp.linalg.lstsq(A, b)[0]
        info = llst_solve(A, b, radius=10.0 * float(jnp.linalg.norm(x_ls)))
        np.testing.assert_allclose(np.asarray(info.x), np.asarray(x_ls),
                                   atol=1e-8)
        assert float(info.multiplier) == 0.0

    def test_boundary(self):
        A, b = _lsq_problem()
        x_ls = jnp.linalg.lstsq(A, b)[0]
        radius = 0.3 * float(jnp.linalg.norm(x_ls))
        info = llst_solve(A, b, radius=radius)
        assert float(info.x_norm) == pytest.approx(radius, rel=1e-6)
        assert float(info.multiplier) > 0
        # optimality: (A'A + lam I) x = A'b
        res = A.T @ (A @ info.x) + info.multiplier * info.x - A.T @ b
        assert float(jnp.max(jnp.abs(res))) < 1e-8

    def test_scaled_norm(self):
        A, b = _lsq_problem(seed=1)
        S = jnp.asarray(np.random.default_rng(2).uniform(0.5, 2.0, size=6))
        info = llst_solve(A, b, radius=0.2, S=S)
        assert float(jnp.linalg.norm(S * info.x)) == pytest.approx(0.2, rel=1e-6)

    def test_batched(self):
        r = np.random.default_rng(3)
        A = jnp.asarray(r.normal(size=(5, 8, 4)))
        b = jnp.asarray(r.normal(size=(5, 8)))
        radii = jnp.asarray(r.uniform(0.05, 0.2, size=5))
        infos = jax.vmap(lambda Ai, bi, ri: llst_solve(Ai, bi, ri))(A, b, radii)
        assert infos.x.shape == (5, 4)
        np.testing.assert_allclose(np.asarray(infos.x_norm),
                                   np.asarray(radii), rtol=1e-5)

    def test_lls_matches_llst(self):
        A, b = _lsq_problem(seed=4)
        exact = llst_solve(A, b, radius=0.25)
        it = lls_solve(A, b, radius=0.25)
        np.testing.assert_allclose(np.asarray(it.x), np.asarray(exact.x),
                                   atol=1e-6)


class TestLQR:
    def _problem(self, seed=0, n=12):
        r = np.random.default_rng(seed)
        B = r.normal(size=(n, n))
        H = jnp.asarray((B + B.T) / 2)
        c = jnp.asarray(r.normal(size=n))
        return H, c

    def test_matches_trs(self):
        H, c = self._problem()
        radius = 0.7
        exact = trs_solve(H, c, radius)
        info = lqr_solve(lambda v: H @ v, c, radius,
                         ctl=LQRControl(itmax=12))
        assert float(info.obj) == pytest.approx(float(exact.obj), abs=1e-6)
        # the *point* must match too, not just obj (obj is invariant
        # under the c -> -c mirror, which once hid a sign bug)
        np.testing.assert_allclose(np.asarray(info.x), np.asarray(exact.x),
                                   atol=1e-5)
        model = 0.5 * info.x @ (H @ info.x) + c @ info.x
        assert float(model) == pytest.approx(float(exact.obj), abs=1e-6)

    def test_lqt_point_matches_rqs(self):
        H, c = self._problem(seed=5)
        exact = rqs_solve(H, c, 2.0)
        info = lqt_solve(lambda v: H @ v, c, 2.0, ctl=LQRControl(itmax=12))
        np.testing.assert_allclose(np.asarray(info.x), np.asarray(exact.x),
                                   atol=1e-5)

    def test_lqt_matches_rqs(self):
        H, c = self._problem(seed=1)
        sigma = 2.0
        exact = rqs_solve(H, c, sigma)
        info = lqt_solve(lambda v: H @ v, c, sigma,
                         ctl=LQRControl(itmax=12))
        assert float(info.obj + (sigma / 3) * info.norm_x ** 3) == pytest.approx(
            float(exact.obj), abs=1e-5)

    def test_early_truncation_descends(self):
        H, c = self._problem(seed=2, n=30)
        info = lqr_solve(lambda v: H @ v, c, 1.0, ctl=LQRControl(itmax=8))
        assert float(info.obj) < 0  # beats x = 0


class TestCheck:
    def test_correct_gradient_passes(self):
        f = lambda x: jnp.sum(x ** 3) + x[0] * x[1]
        info = check_derivatives(f, jnp.array([1.0, 2.0, 0.5]))
        assert info.ok

    def test_wrong_gradient_flagged(self):
        f = lambda x: jnp.sum(x ** 2)
        bad_grad = lambda x: 2 * x + jnp.eye(3, dtype=x.dtype)[0]  # off by e0
        info = check_derivatives(f, jnp.ones(3), grad=bad_grad)
        assert not info.grad_ok
        assert 0 in list(info.grad_bad_indices)

    def test_wrong_hessian_flagged(self):
        f = lambda x: jnp.sum(x ** 2)
        bad_hess = lambda x: 2 * jnp.eye(2, dtype=x.dtype) + 0.5
        info = check_derivatives(f, jnp.ones(2), hess=bad_hess)
        assert not info.hess_ok


class TestFDH:
    def test_tridiagonal_recovery(self):
        n = 8
        # tridiagonal Hessian pattern
        rows, cols = [], []
        for i in range(n):
            rows.append(i); cols.append(i)
            if i + 1 < n:
                rows.append(i + 1); cols.append(i)
        pat = fdh_analyse(n, rows, cols)
        assert pat.ngroups <= 3   # classic CPR result for tridiagonal

        def f(x):
            return jnp.sum(x ** 2) + jnp.sum(x[1:] * x[:-1]) + jnp.sum(x ** 3)

        x = jnp.asarray(np.random.default_rng(0).normal(size=n))
        vals = fdh_estimate(pat, jax.grad(f), x, h=1e-5)
        H = jax.hessian(f)(x)
        expect = np.asarray(H)[pat.rows, pat.cols]
        np.testing.assert_allclose(np.asarray(vals), expect, atol=1e-4)

    def test_diagonal_pattern_one_group(self):
        pat = fdh_analyse(5, np.arange(5), np.arange(5))
        assert pat.ngroups == 1


class TestLancelotSimple:
    def test_unconstrained_rosenbrock(self):
        f = lambda x: (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2
        info = lancelot_simple(f, jnp.zeros(2), maxit=200)
        np.testing.assert_allclose(np.asarray(info.x), [1.0, 1.0], atol=1e-4)

    def test_constrained(self):
        # min x0^2 + x1^2 s.t. x0 + x1 - 1 = 0
        f = lambda x: jnp.sum(x ** 2)
        cons = lambda x: jnp.array([x[0] + x[1] - 1.0])
        info = lancelot_simple(f, jnp.zeros(2), constraints=cons, c_eq=1)
        np.testing.assert_allclose(np.asarray(info.x), [0.5, 0.5], atol=1e-4)
