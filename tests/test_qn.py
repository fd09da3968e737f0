"""Quasi-Newton kit tests (LMS / SEC / SHA equivalents).

Contracts: secant equations hold, compact-form applies match dense
reference updates, inverse apply is a true inverse, sparse recovery
reproduces a known sparse Hessian.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.qn import (
    LMSControl,
    bfgs_update,
    lms_apply,
    lms_apply_inverse,
    lms_setup,
    lms_update,
    sec_initial,
    sha_analyse,
    sha_estimate,
    sr1_update,
)


def dense_bfgs_reference(pairs, n, delta):
    """Textbook dense BFGS accumulation starting from B0 = delta I."""
    B = delta * np.eye(n)
    for s, y in pairs:
        Bs = B @ s
        B = B - np.outer(Bs, Bs) / (s @ Bs) + np.outer(y, y) / (s @ y)
    return B


class TestLMS:
    def make_pairs(self, n, k, seed=0):
        r = np.random.default_rng(seed)
        A = r.normal(size=(n, n))
        H = A @ A.T + n * np.eye(n)  # SPD model Hessian
        pairs = []
        for _ in range(k):
            s = r.normal(size=n)
            pairs.append((s, H @ s))
        return H, pairs

    def test_compact_matches_dense_bfgs(self):
        n, k = 7, 4
        H, pairs = self.make_pairs(n, k)
        data = lms_setup(n, LMSControl(memory=6))
        for s, y in pairs:
            data = lms_update(data, jnp.asarray(s), jnp.asarray(y))
        # reference dense accumulation from the SAME B0 = delta I
        delta = float(data.delta)
        B_ref = dense_bfgs_reference(pairs, n, delta)
        for t in range(3):
            v = np.random.default_rng(10 + t).normal(size=n)
            w = lms_apply(data, jnp.asarray(v))
            np.testing.assert_allclose(np.asarray(w), B_ref @ v,
                                       rtol=1e-9, atol=1e-9)

    def test_secant_equation(self):
        """B s_latest = y_latest exactly (BFGS secant property)."""
        n = 6
        H, pairs = self.make_pairs(n, 3, seed=2)
        data = lms_setup(n, LMSControl(memory=4))
        for s, y in pairs:
            data = lms_update(data, jnp.asarray(s), jnp.asarray(y))
        s, y = pairs[-1]
        np.testing.assert_allclose(
            np.asarray(lms_apply(data, jnp.asarray(s))), y, rtol=1e-8
        )

    def test_shifted_apply(self):
        n = 5
        _, pairs = self.make_pairs(n, 3, seed=3)
        data = lms_setup(n, LMSControl(memory=4))
        for s, y in pairs:
            data = lms_update(data, jnp.asarray(s), jnp.asarray(y))
        v = np.random.default_rng(4).normal(size=n)
        shift = 2.5
        w0 = np.asarray(lms_apply(data, jnp.asarray(v)))
        w1 = np.asarray(lms_apply(data, jnp.asarray(v), shift=shift))
        np.testing.assert_allclose(w1, w0 + shift * v, rtol=1e-10)

    def test_inverse_apply(self):
        n = 6
        _, pairs = self.make_pairs(n, 4, seed=5)
        data = lms_setup(n, LMSControl(memory=5))
        for s, y in pairs:
            data = lms_update(data, jnp.asarray(s), jnp.asarray(y))
        v = jnp.asarray(np.random.default_rng(6).normal(size=n))
        w = lms_apply_inverse(data, lms_apply(data, v))
        np.testing.assert_allclose(np.asarray(w), np.asarray(v), rtol=1e-7)

    def test_ring_buffer_overwrite(self):
        """More pairs than memory: oldest pair's secant no longer holds,
        newest does."""
        n, mem = 5, 2
        H, pairs = self.make_pairs(n, 4, seed=7)
        data = lms_setup(n, LMSControl(memory=mem))
        for s, y in pairs:
            data = lms_update(data, jnp.asarray(s), jnp.asarray(y))
        s, y = pairs[-1]
        np.testing.assert_allclose(
            np.asarray(lms_apply(data, jnp.asarray(s))), y, rtol=1e-8
        )
        assert int(jnp.sum(data.valid)) == mem

    def test_rejects_negative_curvature_pair(self):
        n = 4
        data = lms_setup(n, LMSControl(memory=3))
        s = jnp.ones(n)
        data = lms_update(data, s, -s)  # s'y < 0 -> rejected
        assert int(jnp.sum(data.valid)) == 0

    def test_sr1_secant(self):
        n = 6
        r = np.random.default_rng(8)
        A = r.normal(size=(n, n))
        H = (A + A.T) / 2  # indefinite is fine for SR1
        data = lms_setup(n, LMSControl(memory=4, method="sr1"))
        pairs = [(r.normal(size=n),) for _ in range(3)]
        pairs = [(s[0], H @ s[0]) for s in pairs]
        for s, y in pairs:
            data = lms_update(data, jnp.asarray(s), jnp.asarray(y))
        s, y = pairs[-1]
        np.testing.assert_allclose(
            np.asarray(lms_apply(data, jnp.asarray(s))), y,
            rtol=1e-6, atol=1e-8
        )

    def test_jittable_update_loop(self):
        n = 5
        data = lms_setup(n)
        H = jnp.eye(n) * 2.0

        @jax.jit
        def step(data, s):
            return lms_update(data, s, H @ s)

        r = np.random.default_rng(9)
        for _ in range(3):
            data = step(data, jnp.asarray(r.normal(size=n)))
        v = jnp.ones(n)
        np.testing.assert_allclose(np.asarray(lms_apply(data, v)),
                                   2.0 * np.ones(n), rtol=1e-8)


class TestSEC:
    def test_bfgs_secant_and_pd(self):
        n = 5
        r = np.random.default_rng(0)
        A = r.normal(size=(n, n))
        H = A @ A.T + n * np.eye(n)
        B = sec_initial(n)
        for _ in range(6):
            s = jnp.asarray(r.normal(size=n))
            y = jnp.asarray(np.asarray(H) @ np.asarray(s))
            B = bfgs_update(B, s, y)
            np.testing.assert_allclose(np.asarray(B @ s), np.asarray(y),
                                       rtol=1e-8)
        assert np.linalg.eigvalsh(np.asarray(B))[0] > 0

    def test_bfgs_damped_keeps_pd(self):
        """Negative-curvature pair: damping keeps B PD (Powell)."""
        n = 4
        B = sec_initial(n)
        s = jnp.ones(n)
        y = -jnp.ones(n)  # s'y < 0
        B = bfgs_update(B, s, y)
        assert np.linalg.eigvalsh(np.asarray(B))[0] > 0

    def test_sr1(self):
        n = 5
        r = np.random.default_rng(1)
        A = r.normal(size=(n, n))
        H = (A + A.T) / 2
        B = sec_initial(n)
        for _ in range(12):
            s = jnp.asarray(r.normal(size=n))
            y = jnp.asarray(np.asarray(H) @ np.asarray(s))
            B = sr1_update(B, s, y)
        # SR1 with exact pairs converges to H after enough updates
        np.testing.assert_allclose(np.asarray(B), np.asarray(H), atol=1e-6)


class TestSHA:
    def test_recover_tridiagonal(self):
        n = 8
        r = np.random.default_rng(2)
        main = r.uniform(2, 3, size=n)
        off = r.normal(size=n - 1)
        H = np.diag(main) + np.diag(off, 1) + np.diag(off, -1)
        rows, cols = np.nonzero(np.triu(H != 0))
        pat = sha_analyse(n, rows, cols)
        k = pat.max_deg + 1
        S = r.normal(size=(k, n))
        Y = S @ H.T
        H_est = sha_estimate(pat, jnp.asarray(S), jnp.asarray(Y))
        np.testing.assert_allclose(np.asarray(H_est), H, atol=1e-8)

    def test_recover_arrow(self):
        """Arrowhead sparsity (dense first row/col + diagonal)."""
        n = 6
        r = np.random.default_rng(3)
        H = np.diag(r.uniform(1, 2, size=n))
        H[0, :] = r.normal(size=n)
        H[:, 0] = H[0, :]
        H[0, 0] = 5.0
        rows, cols = np.nonzero(np.triu(H != 0))
        pat = sha_analyse(n, rows, cols)
        S = r.normal(size=(pat.max_deg + 2, n))
        Y = S @ H.T
        H_est = sha_estimate(pat, jnp.asarray(S), jnp.asarray(Y))
        np.testing.assert_allclose(np.asarray(H_est), H, atol=1e-8)
