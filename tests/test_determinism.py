"""Golden determinism + f32 numeric-envelope tests.

GALAHAD guarantees run-to-run reproducibility (SURVEY §5.2: pure
routines + explicit workspace; the reference's answer files
src/*/\*.output are byte-stable).  The TPU analogue is stronger:
everything under jit is a pure function of its inputs, so two
executions of the same compiled solver must agree BIT FOR BIT.  These
tests pin that contract, plus the f32 envelope the TPU benchmarks
actually run in (VERDICT r1 weak item 10).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.core.residuals import kkt_residuals
from galahad_tpu.io import qplib
from galahad_tpu.qp import IPMControl, ipm_solve, ipm_solve_compiled

QPBAND = "/root/reference/examples/QPBAND.qplib"


def bits(a):
    """Raw bit pattern of an array (exact comparison, NaN-safe)."""
    a = np.asarray(a)
    return a.view(np.uint64 if a.dtype == np.float64 else np.uint32)


class TestGoldenDeterminism:
    def test_ipm_bitwise_repeatable(self):
        qp = qplib.read_qp(QPBAND)
        r1 = ipm_solve_compiled(qp)
        r2 = ipm_solve_compiled(qp)
        x1, x2 = r1[0], r2[0]
        np.testing.assert_array_equal(bits(x1), bits(x2))
        # multipliers too
        np.testing.assert_array_equal(bits(r1[1]), bits(r2[1]))
        np.testing.assert_array_equal(bits(r1[2]), bits(r2[2]))

    def test_ipm_host_loop_repeatable(self):
        qp = qplib.read_qp(QPBAND)
        x1, *_ = ipm_solve(qp)
        x2, *_ = ipm_solve(qp)
        np.testing.assert_array_equal(bits(x1), bits(x2))

    def test_supernodal_bitwise_repeatable(self):
        import scipy.sparse as sp

        from galahad_tpu.linalg.supernodal import (
            supernodal_analyse,
            supernodal_factorize,
            supernodal_solve,
        )

        k = 12
        n = k * k
        G = sp.diags([4.0 * np.ones(n), -np.ones(n - 1), -np.ones(n - 1),
                      -np.ones(n - k), -np.ones(n - k)],
                     [0, 1, -1, k, -k]).tocsr()
        Gl = sp.tril(G).tocoo()
        sym = supernodal_analyse(Gl.row, Gl.col, n)
        b = jnp.asarray(np.random.default_rng(3).normal(size=n))
        vals = jnp.asarray(Gl.data)
        xs = [supernodal_solve(sym, supernodal_factorize(sym, vals), b)
              for _ in range(2)]
        np.testing.assert_array_equal(bits(xs[0]), bits(xs[1]))

    def test_batch_order_invariance(self):
        """vmap'd solves are per-lane independent: permuting the batch
        permutes the answers exactly."""
        rng = np.random.default_rng(7)
        nb, n = 4, 8
        M = rng.standard_normal((nb, n, n))
        H = jnp.asarray(M @ np.swapaxes(M, 1, 2) + 3 * np.eye(n))
        g = jnp.asarray(rng.standard_normal((nb, n)))

        from galahad_tpu.tr import trs_solve

        rad = jnp.full((nb,), 1.0)
        x = jax.vmap(lambda h, gg, r: trs_solve(h, gg, r).x)(H, g, rad)
        perm = np.array([2, 0, 3, 1])
        xp = jax.vmap(lambda h, gg, r: trs_solve(h, gg, r).x)(
            H[perm], g[perm], rad[perm])
        np.testing.assert_array_equal(bits(x[perm]), bits(xp))


class TestF32Envelope:
    """The benchmarks run in f32 on TPU; the 1e-6 KKT north-star must
    hold there via the double-word residual/refinement layer
    (SURVEY §7.3, reference src/ir/ir.f90:334)."""

    def test_qpband_f32_kkt(self):
        qp = qplib.read_qp(QPBAND, dtype=jnp.float32)
        ctl = IPMControl(dtype="float32", refine=3)
        x, y, z, st = ipm_solve(qp, ctl)
        assert int(st.status) == 0
        # measure the residuals in f64 against the f64 problem data
        qp64 = qplib.read_qp(QPBAND)
        rs = kkt_residuals(qp64, jnp.asarray(x, jnp.float64),
                           jnp.asarray(y, jnp.float64),
                           jnp.asarray(z, jnp.float64))
        for r in rs:
            assert float(r) < 5e-6

    def test_trs_f32_accuracy(self):
        from galahad_tpu.tr import trs_solve

        rng = np.random.default_rng(11)
        n = 24
        M = rng.standard_normal((n, n))
        H64 = M @ M.T - 2.0 * np.eye(n)
        g64 = rng.standard_normal(n)
        x64 = trs_solve(jnp.asarray(H64), jnp.asarray(g64), 1.5).x
        x32 = trs_solve(jnp.asarray(H64, jnp.float32),
                        jnp.asarray(g64, jnp.float32),
                        jnp.float32(1.5)).x
        # f32 solution within sqrt(eps_32)-ish of the f64 one
        err = np.linalg.norm(np.asarray(x32, np.float64) - np.asarray(x64))
        assert err / np.linalg.norm(np.asarray(x64)) < 5e-4
