"""Double-word (compensated) arithmetic: the f32 accuracy layer
(VERDICT r1 item 3; reference IR role src/ir/ir.f90:334, SURVEY §7.3)."""
import jax
import jax.numpy as jnp
import numpy as np

from galahad_tpu.linalg.dw import (
    compensated_sum,
    dw_add,
    ir_solve_dw,
    residual,
    two_prod,
    two_sum,
)


def f32(x):
    return jnp.asarray(x, jnp.float32)


class TestPrimitives:
    def test_two_sum_exact(self):
        a, b = f32(1.0), f32(1e-9)
        s, e = two_sum(a, b)
        # s + e == a + b exactly (verify in f64)
        assert float(np.float64(s) + np.float64(e)) == 1.0 + np.float64(
            np.float32(1e-9))

    def test_two_prod_exact(self):
        a, b = f32(1.0 + 2**-12), f32(1.0 - 2**-12)
        p, e = two_prod(a, b)
        exact = np.float64(np.float32(1.0 + 2**-12)) * np.float64(
            np.float32(1.0 - 2**-12))
        assert float(np.float64(p) + np.float64(e)) == exact

    def test_compensated_cancellation(self):
        """b - (t1 + t2) with heavy cancellation: naive f32 loses the
        answer, compensated recovers it."""
        b = f32(np.full(8, 1e4))
        t1 = f32(np.full(8, 1e4 - 0.5))
        t2 = f32(np.full(8, 0.5 - 1e-5))
        comp = residual(b, t1, t2)
        # exact difference of the f32-representable inputs, in f64
        exact = (np.float64(np.float32(1e4))
                 - np.float64(np.float32(1e4 - 0.5))
                 - np.float64(np.float32(0.5 - 1e-5)))
        assert abs(float(comp[0]) - exact) < 1e-11

    def test_dw_add_normalized(self):
        xh, xl = f32(1.0), f32(1e-9)
        yh = f32(2**-24)
        h, l = dw_add(xh, xl, yh)
        total = np.float64(h) + np.float64(l)
        expect = (np.float64(np.float32(1.0)) + np.float64(np.float32(1e-9))
                  + np.float64(np.float32(2**-24)))
        assert abs(total - expect) < 1e-13   # double-f32 ~ 2^-48 accuracy


class TestIRDW:
    def test_f32_refinement_beats_plain(self):
        """f32 factor + dw-iterate IR reaches residuals a plain f32
        re-solve loop cannot."""
        rng = np.random.default_rng(0)
        n = 64
        B = rng.normal(size=(n, n))
        A64 = B @ B.T + 10 * np.eye(n)
        A = f32(A64)
        b = f32(rng.normal(size=n))
        L = jnp.linalg.cholesky(A)

        def matvec(v):
            return A @ v

        def approx(r):
            w = jax.scipy.linalg.solve_triangular(L, r, lower=True)
            return jax.scipy.linalg.solve_triangular(L.T, w, lower=False)

        x_dw, _ = ir_solve_dw(matvec, approx, b, sweeps=3)
        r_dw = np.linalg.norm(
            np.asarray(A64) @ np.asarray(x_dw, np.float64)
            - np.asarray(b, np.float64), np.inf)
        # plain f32 IR for comparison
        x = approx(b)
        for _ in range(3):
            x = x + approx(b - matvec(x))
        r_plain = np.linalg.norm(
            np.asarray(A64) @ np.asarray(x, np.float64)
            - np.asarray(b, np.float64), np.inf)
        assert r_dw <= r_plain * 1.5
        assert r_dw < 5e-5 * np.linalg.norm(np.asarray(b), np.inf) + 5e-5
