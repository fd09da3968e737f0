"""Global optimization tests (UGO/BGO/DGO + LHS equivalents).

Contract: find the global minimum of standard multimodal test functions
(where local methods from the same start fail), LHS stratification
property, determinism of DGO.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.go import (
    BGOControl,
    DGOControl,
    UGOControl,
    bgo_solve,
    dgo_solve,
    lhs_sample,
    lhs_sample_box,
    ugo_solve,
)


class TestLHS:
    def test_stratification(self):
        """Exactly one sample per stratum per dimension."""
        pts = lhs_sample(jax.random.PRNGKey(0), 16, 3)
        assert pts.shape == (16, 3)
        for d in range(3):
            strata = np.floor(np.asarray(pts[:, d]) * 16).astype(int)
            assert sorted(strata.tolist()) == list(range(16))

    def test_box(self):
        lo = jnp.array([-2.0, 5.0])
        hi = jnp.array([-1.0, 9.0])
        pts = lhs_sample_box(jax.random.PRNGKey(1), 8, lo, hi)
        assert np.all(np.asarray(pts) >= np.asarray(lo))
        assert np.all(np.asarray(pts) <= np.asarray(hi))


class TestUGO:
    def test_multimodal(self):
        """f(x) = sin(x) + sin(10x/3): classic; global min ~ 5.1457 on
        [2.7, 7.5] with f* ~ -1.8996."""

        def f(x):
            return jnp.sin(x) + jnp.sin(10.0 * x / 3.0)

        info = ugo_solve(f, 2.7, 7.5)
        assert float(info.f) == pytest.approx(-1.8996, abs=1e-3)
        assert float(info.x) == pytest.approx(5.1457, abs=1e-2)

    def test_many_local_minima(self):
        """Griewank-ish 1-d: global min at 0 among many local ones."""

        def f(x):
            return x**2 / 50.0 - jnp.cos(x) + 1.0

        info = ugo_solve(f, -20.0, 20.0, UGOControl(maxit=200))
        assert float(info.f) == pytest.approx(0.0, abs=1e-6)

    def test_monotone(self):
        info = ugo_solve(lambda x: x, -1.0, 3.0)
        assert float(info.x) == pytest.approx(-1.0, abs=1e-8)


def camel6(v):
    """Six-hump camel (reference fixture CAMEL6.SIF): global min
    f* = -1.0316 at (+-0.0898, -+0.7126)."""
    x, y = v[0], v[1]
    return ((4.0 - 2.1 * x**2 + x**4 / 3.0) * x**2
            + x * y + (-4.0 + 4.0 * y**2) * y**2)


class TestBGO:
    def test_camel6(self):
        lo = jnp.array([-3.0, -2.0])
        hi = jnp.array([3.0, 2.0])
        info = bgo_solve(camel6, lo, hi, ctl=BGOControl(attempts=16))
        assert float(info.f) == pytest.approx(-1.0316, abs=1e-3)

    def test_rastrigin_2d(self):
        def f(v):
            return 20.0 + jnp.sum(v**2 - 10.0 * jnp.cos(2 * jnp.pi * v))

        lo = jnp.full(2, -5.12)
        hi = jnp.full(2, 5.12)
        info = bgo_solve(f, lo, hi, ctl=BGOControl(attempts=256))
        assert float(info.f) == pytest.approx(0.0, abs=1e-5)

    def test_given_start_kept(self):
        """If x0 is already the global min, the answer can't be worse."""
        lo = jnp.array([-3.0, -2.0])
        hi = jnp.array([3.0, 2.0])
        x0 = jnp.array([0.0898, -0.7126])
        info = bgo_solve(camel6, lo, hi, x0=x0, ctl=BGOControl(attempts=4))
        assert float(info.f) <= camel6(x0) + 1e-9


class TestDGO:
    def test_camel6(self):
        lo = jnp.array([-3.0, -2.0])
        hi = jnp.array([3.0, 2.0])
        info = dgo_solve(camel6, lo, hi, ctl=DGOControl(maxit=200))
        assert float(info.f) == pytest.approx(-1.0316, abs=1e-3)

    def test_deterministic(self):
        lo = jnp.array([-3.0, -2.0])
        hi = jnp.array([3.0, 2.0])
        f1 = dgo_solve(camel6, lo, hi).f
        f2 = dgo_solve(camel6, lo, hi).f
        assert float(f1) == float(f2)

    def test_1d_multimodal(self):
        def f(v):
            return jnp.sin(v[0]) + jnp.sin(10.0 * v[0] / 3.0)

        info = dgo_solve(f, jnp.array([2.7]), jnp.array([7.5]),
                         ctl=DGOControl(maxit=150))
        assert float(info.f) == pytest.approx(-1.8996, abs=1e-3)
