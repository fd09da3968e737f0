"""Parity against the reference's COMMITTED regression records — the
only quantitative baselines in the GALAHAD tree (SURVEY §6,
BASELINE.md).  Each case reproduces a documented example program's
problem data and must match the committed *.output record.
"""
import jax.numpy as jnp
import numpy as np

from galahad_tpu.core.problem import QP
from galahad_tpu.qp.ipm import IPMControl, ipm_solve


class TestCQPExampleRecord:
    """reference src/cqp/cqps.f90 problem; committed record
    src/cqp/cqpds.output: '10 iterations, optimal objective 6.3462,
    x = (0.15385, 0.69231, 1.30769)'."""

    def _qp(self):
        inf = 1e20
        H = jnp.asarray([[1.0, 0.0, 0.0],
                         [0.0, 2.0, 1.0],
                         [0.0, 1.0, 3.0]])
        return QP(
            H=H, g=jnp.asarray([0.0, 2.0, 0.0]), f=1.0,
            A=jnp.asarray([[2.0, 1.0, 0.0], [0.0, 1.0, 1.0]]),
            c_l=jnp.asarray([1.0, 2.0]), c_u=jnp.asarray([2.0, 2.0]),
            x_l=jnp.asarray([-1.0, -inf, -inf]),
            x_u=jnp.asarray([1.0, inf, 2.0]),
        )

    def test_matches_committed_output(self):
        x, y, z, st = ipm_solve(self._qp())
        assert int(st.status) == 0
        obj = float(self._qp().objective(x))
        assert abs(obj - 6.3462) < 1e-3              # record: 6.3462E+00
        np.testing.assert_allclose(
            np.asarray(x), [0.15385, 0.69231, 1.30769], atol=2e-4)

    def test_iteration_count_competitive_with_record(self):
        """The committed record used 10 IPM iterations; ours must not
        be dramatically worse (it is typically fewer)."""
        _, _, _, st = ipm_solve(self._qp())
        assert int(st.iter) <= 15        # record: 10; same order


class TestTRUExampleRecord:
    """reference src/tru/trus.f90: min (x1+x3+4)^2 + (x2+x3)^2 + cos x1
    from x0 = 1; committed record src/tru/truds.output: '8 iterations,
    optimal objective value = -1.0, x = (-9.4248, -5.4248, 5.4248)'."""

    def test_matches_committed_output(self):
        from galahad_tpu.nlp.tru import tru_solve

        def f(x):
            return ((x[0] + x[2] + 4.0) ** 2 + (x[1] + x[2]) ** 2
                    + jnp.cos(x[0]))

        st = tru_solve(f, jnp.ones(3))
        assert bool(st.converged)
        assert abs(float(f(st.x)) + 1.0) < 1e-6      # record: -1.0000E+00
        # the record's solution is the -3*pi stationary point; any
        # cos-branch minimizer with f = -1 is acceptable: check
        # structure x1 = odd multiple of pi, x2 = -x3, x1+x3 = -4
        x = np.asarray(st.x)
        assert abs(abs(x[0]) % np.pi) < 1e-4 or \
            abs(abs(x[0]) % np.pi - np.pi) < 1e-4
        assert abs(x[1] + x[2]) < 1e-4
        assert abs(x[0] + x[2] + 4.0) < 1e-4


class TestTRSExampleRecord:
    """reference src/trs/trss.f90: n=10000 tridiagonal H (-2 diag, 1
    off), M = 2I, c = 1, radius 10; committed record
    src/trs/trsds.output: objective -7.0611E+02, multiplier 7.0712.
    Solved here at the same size through GLTR (M-norm Lanczos) — the
    matrix-free route, since the exact TRS path is dense."""

    def test_matches_committed_output(self):
        from galahad_tpu.tr.gltr import GLTRControl, gltr_solve

        n = 10000
        diag = jnp.full(n, -2.0)

        def hv(v):
            out = diag * v
            out = out.at[:-1].add(v[1:])
            out = out.at[1:].add(v[:-1])
            return out

        def minv(v):
            return v / 2.0

        c = jnp.ones(n)
        info = gltr_solve(hv, c, radius=10.0, prec=minv,
                          ctl=GLTRControl(itmax=300, stop_relative=1e-10))
        obj = float(info.obj) + 1.0                  # example adds f = 1
        assert abs(obj - (-7.0611e2)) < 0.05         # record: -7.0611E+02
        assert abs(float(info.multiplier) - 7.0712) < 1e-3
