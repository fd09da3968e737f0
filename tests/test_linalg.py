"""Linear-algebra layer tests: shifted Cholesky, tridiagonal LDL',
Schur-complement KKT solves (SBLS equivalent)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.linalg import (
    chol_factor, chol_factor_shifted, chol_ok, chol_solve,
    sbls_factorize, sbls_solve, sbls_residual,
    tridiag_factor, tridiag_solve,
)


def rng(seed=0):
    return np.random.default_rng(seed)


class TestCholesky:
    def test_solve(self):
        r = rng()
        A = r.normal(size=(8, 8))
        M = A @ A.T + 8 * np.eye(8)
        b = r.normal(size=8)
        L = chol_factor(jnp.asarray(M))
        assert bool(chol_ok(L))
        x = chol_solve(L, jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(M @ x), b, rtol=1e-10)

    def test_matrix_rhs(self):
        r = rng(1)
        A = r.normal(size=(6, 6))
        M = A @ A.T + 6 * np.eye(6)
        B = r.normal(size=(6, 3))
        L = chol_factor(jnp.asarray(M))
        X = chol_solve(L, jnp.asarray(B))
        np.testing.assert_allclose(np.asarray(M @ X), B, rtol=1e-10)

    def test_indefinite_detected(self):
        M = jnp.diag(jnp.array([1.0, -1.0, 2.0]))
        assert not bool(chol_ok(chol_factor(M)))

    def test_shifted_escalation(self):
        # indefinite matrix gets a positive shift until SPD
        M = jnp.diag(jnp.array([1.0, -2.0, 3.0]))
        L, shift, ok = chol_factor_shifted(M)
        assert bool(ok) and float(shift) > 2.0

    def test_shifted_noop_when_spd(self):
        M = jnp.eye(4) * 3.0
        L, shift, ok = chol_factor_shifted(M)
        assert bool(ok) and float(shift) == 0.0

    def test_batched_vmap(self):
        r = rng(2)
        A = r.normal(size=(5, 7, 7))
        M = jnp.asarray(A @ np.swapaxes(A, 1, 2) + 7 * np.eye(7))
        b = jnp.asarray(r.normal(size=(5, 7)))
        x = jax.vmap(lambda m, v: chol_solve(chol_factor(m), v))(M, b)
        np.testing.assert_allclose(
            np.einsum("bij,bj->bi", np.asarray(M), np.asarray(x)), b, rtol=1e-9
        )


class TestTridiag:
    def test_factor_solve(self):
        r = rng(3)
        k = 9
        d = jnp.asarray(r.uniform(2.0, 3.0, size=k))
        e = jnp.asarray(r.uniform(-0.5, 0.5, size=k - 1))
        T = np.diag(np.asarray(d)) + np.diag(np.asarray(e), 1) + np.diag(np.asarray(e), -1)
        b = jnp.asarray(r.normal(size=k))
        dhat, l = tridiag_factor(d, e)
        x = tridiag_solve(dhat, l, b)
        np.testing.assert_allclose(T @ np.asarray(x), np.asarray(b), rtol=1e-10)


def make_kkt(n, m, seed=0, c_zero_rows=0):
    r = rng(seed)
    B = r.normal(size=(n, n))
    G = B @ B.T + n * np.eye(n)
    A = r.normal(size=(m, n))
    C = r.uniform(0.5, 2.0, size=m)
    if c_zero_rows:
        C[:c_zero_rows] = 0.0
    K = np.block([[G, A.T], [A, -np.diag(C)]])
    return G, A, C, K


class TestSBLS:
    @pytest.mark.parametrize("c_zero_rows", [0, 2])
    def test_dense_g(self, c_zero_rows):
        n, m = 10, 5
        G, A, C, K = make_kkt(n, m, seed=4, c_zero_rows=c_zero_rows)
        b = rng(5).normal(size=n + m)
        f = sbls_factorize(jnp.asarray(G), jnp.asarray(A), jnp.asarray(C),
                           delta=1e-10)
        x, y = sbls_solve(
            f, jnp.asarray(b[:n]), jnp.asarray(b[n:]),
            apply_G=lambda v: jnp.asarray(G) @ v, refine=3,
        )
        sol = np.linalg.solve(K, b)
        np.testing.assert_allclose(np.asarray(x), sol[:n], rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(y), sol[n:], rtol=1e-8, atol=1e-8)

    def test_diag_g(self):
        n, m = 12, 4
        r = rng(6)
        g = r.uniform(1.0, 3.0, size=n)
        A = r.normal(size=(m, n))
        C = r.uniform(0.1, 1.0, size=m)
        K = np.block([[np.diag(g), A.T], [A, -np.diag(C)]])
        b = r.normal(size=n + m)
        f = sbls_factorize(jnp.asarray(g), jnp.asarray(A), jnp.asarray(C),
                           g_is_diag=True)
        x, y = sbls_solve(f, jnp.asarray(b[:n]), jnp.asarray(b[n:]),
                          apply_G=lambda v: jnp.asarray(g) * v, refine=2)
        sol = np.linalg.solve(K, b)
        np.testing.assert_allclose(np.asarray(x), sol[:n], rtol=1e-9, atol=1e-9)
        np.testing.assert_allclose(np.asarray(y), sol[n:], rtol=1e-9, atol=1e-9)

    def test_residual_measure(self):
        n, m = 6, 3
        G, A, C, K = make_kkt(n, m, seed=7)
        b = rng(8).normal(size=n + m)
        f = sbls_factorize(jnp.asarray(G), jnp.asarray(A), jnp.asarray(C))
        x, y = sbls_solve(f, jnp.asarray(b[:n]), jnp.asarray(b[n:]),
                          apply_G=lambda v: jnp.asarray(G) @ v, refine=2)
        res = sbls_residual(f, lambda v: jnp.asarray(G) @ v, x, y,
                            jnp.asarray(b[:n]), jnp.asarray(b[n:]))
        assert float(res) < 1e-9

    def test_vmapped_batch(self):
        n, m, batch = 6, 3, 4
        Gs, As, Cs, bs, sols = [], [], [], [], []
        for s in range(batch):
            G, A, C, K = make_kkt(n, m, seed=10 + s)
            b = rng(20 + s).normal(size=n + m)
            Gs.append(G); As.append(A); Cs.append(C); bs.append(b)
            sols.append(np.linalg.solve(K, b))
        Gs, As, Cs, bs = map(jnp.asarray, (np.array(Gs), np.array(As),
                                           np.array(Cs), np.array(bs)))

        def solve_one(G, A, C, b):
            f = sbls_factorize(G, A, C)
            return sbls_solve(f, b[:n], b[n:], apply_G=lambda v: G @ v, refine=2)

        xs, ys = jax.vmap(solve_one)(Gs, As, Cs, bs)
        sols = np.array(sols)
        np.testing.assert_allclose(np.asarray(xs), sols[:, :n], rtol=1e-8, atol=1e-8)
        np.testing.assert_allclose(np.asarray(ys), sols[:, n:], rtol=1e-8, atol=1e-8)
