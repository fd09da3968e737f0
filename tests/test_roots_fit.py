"""ROOTS / FIT / CHECKPOINT foundations (reference src/roots, src/fit,
src/checkpoint test programs rootst.f90 / fitt.f90)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.core.checkpoint import checkpoint_init, checkpoint_update
from galahad_tpu.core.fit import (
    hermite_coefficients,
    hermite_interpolation,
    newton_eval,
    polyval,
    puiseux_coefficients,
    puiseux_eval,
)
from galahad_tpu.core.roots import (
    roots_cubic,
    roots_quadratic,
    roots_quartic,
    smallest_positive_root,
)


def _check(nroots, roots, expected):
    nroots = int(nroots)
    assert nroots == len(expected)
    np.testing.assert_allclose(
        np.asarray(roots)[:nroots], sorted(expected), rtol=1e-8, atol=1e-8)


class TestRootsQuadratic:
    def test_two_roots(self):
        n, r = roots_quadratic(2.0, -3.0, 1.0)   # (x-1)(x-2)
        _check(n, r, [1.0, 2.0])

    def test_no_real(self):
        n, r = roots_quadratic(1.0, 0.0, 1.0)
        assert int(n) == 0

    def test_linear_degenerate(self):
        n, r = roots_quadratic(-4.0, 2.0, 0.0)
        _check(n, r, [2.0])

    def test_cancellation_stability(self):
        # x^2 - 1e8 x + 1 : naive formula loses the small root
        n, r = roots_quadratic(1.0, -1.0e8, 1.0)
        assert int(n) == 2
        np.testing.assert_allclose(float(r[0]), 1.0e-8, rtol=1e-6)

    def test_batched(self):
        a0 = jnp.array([2.0, 1.0, -4.0])
        a1 = jnp.array([-3.0, 0.0, 2.0])
        a2 = jnp.array([1.0, 1.0, 0.0])
        n, r = jax.jit(roots_quadratic)(a0, a1, a2)
        assert n.shape == (3,) and r.shape == (3, 2)
        assert list(np.asarray(n)) == [2, 0, 1]


class TestRootsCubic:
    def test_three_real(self):
        # (x-1)(x-2)(x-3) = x^3 -6x^2 +11x -6
        n, r = roots_cubic(-6.0, 11.0, -6.0, 1.0)
        _check(n, r, [1.0, 2.0, 3.0])

    def test_one_real(self):
        # (x-1)(x^2+1) = x^3 - x^2 + x - 1
        n, r = roots_cubic(-1.0, 1.0, -1.0, 1.0)
        _check(n, r, [1.0])

    def test_degenerate_quadratic(self):
        n, r = roots_cubic(2.0, -3.0, 1.0, 0.0)
        _check(n, r, [1.0, 2.0])

    def test_triple_root(self):
        # (x-1)^3
        n, r = roots_cubic(-1.0, 3.0, -3.0, 1.0)
        assert int(n) >= 1
        np.testing.assert_allclose(np.asarray(r)[:int(n)], 1.0, atol=1e-4)


class TestRootsQuartic:
    def test_four_real(self):
        # (x-1)(x-2)(x-3)(x-4)
        n, r = roots_quartic(24.0, -50.0, 35.0, -10.0, 1.0)
        _check(n, r, [1.0, 2.0, 3.0, 4.0])

    def test_two_real(self):
        # (x^2+1)(x-1)(x+1) = x^4 - 1
        n, r = roots_quartic(-1.0, 0.0, 0.0, 0.0, 1.0)
        _check(n, r, [-1.0, 1.0])

    def test_none_real(self):
        # (x^2+1)(x^2+4)
        n, r = roots_quartic(4.0, 0.0, 5.0, 0.0, 1.0)
        assert int(n) == 0

    def test_smallest_positive(self):
        n, r = roots_quartic(24.0, -50.0, 35.0, -10.0, 1.0)
        assert float(smallest_positive_root(n, r)) == pytest.approx(1.0)


class TestFit:
    def test_hermite_single_point(self):
        # f = 1 + 2a + 3a^2 -> derivs (1, 2, 6)
        c = hermite_coefficients(jnp.array([1.0, 2.0, 6.0]))
        np.testing.assert_allclose(np.asarray(c), [1.0, 2.0, 3.0])
        assert float(polyval(c, 2.0)) == pytest.approx(1 + 4 + 12)

    def test_newton_interpolation(self):
        alphas = jnp.array([0.0, 1.0, 2.0, 3.0])
        f = lambda t: t ** 3 - 2 * t + 1
        coeffs = hermite_interpolation(alphas, f(alphas))
        t = jnp.array(1.7)
        assert float(newton_eval(alphas, coeffs, t)) == pytest.approx(float(f(t)))

    def test_puiseux(self):
        derivs = jnp.array([1.0, 2.0, 6.0])   # f = 1 + 2a + 3a^2
        c = puiseux_coefficients(derivs)
        for a in [0.0, 0.3, 1.5]:
            assert float(puiseux_eval(c, a)) == pytest.approx(
                1 + 2 * a + 3 * a * a, rel=1e-12)

    def test_batched_components(self):
        derivs = jnp.arange(12.0).reshape(4, 3)
        c = hermite_coefficients(derivs)
        assert c.shape == (4, 3)


class TestCheckpoint:
    def test_thresholds(self):
        cp = checkpoint_init()
        cp = checkpoint_update(cp, 0.05, 3, 1.0)    # crosses 1e-1
        cp = checkpoint_update(cp, 1e-3, 7, 2.0)    # crosses 1e-2, 1e-3
        it = np.asarray(cp.iters)
        assert it[0] == 3 and it[1] == 7 and it[2] == 7 and it[3] == -1

    def test_first_crossing_kept(self):
        cp = checkpoint_init()
        cp = checkpoint_update(cp, 1e-2, 2)
        cp = checkpoint_update(cp, 1e-2, 9)
        assert int(cp.iters[1]) == 2

    def test_jittable(self):
        cp = checkpoint_init()
        cp = jax.jit(checkpoint_update)(cp, 1e-4, 5, 0.1)
        assert int(cp.iters[3]) == 5
