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


class TestDQPExampleRecord:
    """reference src/dqp/dqps.f90 (same 3-var QP as the CQP example);
    committed record src/dqp/dqpds.output: 'optimal objective 6.3462,
    x = (0.15385, 0.69231, 1.30769)'."""

    def test_matches_committed_output(self):
        from galahad_tpu.qp.dqp import dqp_solve

        inf = 1e20
        qp = QP(
            H=jnp.asarray([[1.0, 0.0, 0.0],
                           [0.0, 2.0, 1.0],
                           [0.0, 1.0, 3.0]]),
            g=jnp.asarray([0.0, 2.0, 0.0]), f=1.0,
            A=jnp.asarray([[2.0, 1.0, 0.0], [0.0, 1.0, 1.0]]),
            c_l=jnp.asarray([1.0, 2.0]), c_u=jnp.asarray([2.0, 2.0]),
            x_l=jnp.asarray([-1.0, -inf, -inf]),
            x_u=jnp.asarray([1.0, inf, 2.0]),
        )
        info = dqp_solve(qp)
        assert bool(info.converged)
        assert abs(float(info.obj) - 6.3462) < 1e-3
        np.testing.assert_allclose(
            np.asarray(info.x), [0.15385, 0.69231, 1.30769], atol=2e-4)


class TestEQPExampleRecord:
    """reference src/eqp/eqps.f90: H coo (1,1)=1 (2,2)=2 (3,3)=3 (3,1)=4,
    g=(0,2,0), f=1, A x + c = 0 with c=(-2,-2); committed record
    src/eqp/eqpds.output: 'objective 7.0541, x=(0.32432,1.3514,0.64865)'."""

    def test_matches_committed_output(self):
        from galahad_tpu.qp.eqp import eqp_solve

        H = jnp.asarray([[1.0, 0.0, 4.0],
                         [0.0, 2.0, 0.0],
                         [4.0, 0.0, 3.0]])
        g = jnp.asarray([0.0, 2.0, 0.0])
        A = jnp.asarray([[2.0, 1.0, 0.0], [0.0, 1.0, 1.0]])
        info = eqp_solve(H, g, A, jnp.asarray([2.0, 2.0]), f=1.0)
        assert abs(float(info.obj) - 7.0541) < 1e-3
        np.testing.assert_allclose(
            np.asarray(info.x), [0.32432, 1.3514, 0.64865], atol=2e-4)


class TestBQPExampleRecord:
    """reference src/bqp/bqps.f90: H coo (1,1)=1 (2,2)=2 (2,1)=1 (3,3)=3,
    g=(0,2,1), f=1, x_l=(-1,-inf,0), x_u=(inf,1,2); committed record
    src/bqp/bqpds.output: 'objective -1.0, x=(2,-2,0)'."""

    def test_matches_committed_output(self):
        from galahad_tpu.qp.bqp import bqp_solve

        inf = 1e20
        H = jnp.asarray([[1.0, 1.0, 0.0],
                         [1.0, 2.0, 0.0],
                         [0.0, 0.0, 3.0]])
        info = bqp_solve(H, jnp.asarray([0.0, 2.0, 1.0]),
                         jnp.asarray([-1.0, -inf, 0.0]),
                         jnp.asarray([inf, 1.0, 2.0]), f=1.0)
        assert abs(float(info.obj) + 1.0) < 1e-4
        np.testing.assert_allclose(np.asarray(info.x), [2.0, -2.0, 0.0],
                                   atol=1e-4)


class TestBLLSExampleRecord:
    """reference src/blls/bllss.f90: A 4x3 coo, b=(0,2,1,2),
    x_l=(-1,-inf,0), x_u=(inf,1,2); committed record
    src/blls/bllsds.output: 'objective 0.5, x=(0.5,1.0,1.5)'."""

    def test_matches_committed_output(self):
        from galahad_tpu.qp.bqp import blls_solve

        inf = 1e20
        A = jnp.asarray([[1.0, 0.0, 0.0],
                         [1.0, 1.0, 0.0],
                         [0.0, 0.0, 1.0],
                         [0.0, 0.0, 1.0]])
        b = jnp.asarray([0.0, 2.0, 1.0, 2.0])
        info = blls_solve(A, b, jnp.asarray([-1.0, -inf, 0.0]),
                          jnp.asarray([inf, 1.0, 2.0]))
        assert abs(float(info.obj) - 0.5) < 1e-4
        np.testing.assert_allclose(np.asarray(info.x), [0.5, 1.0, 1.5],
                                   atol=1e-4)


class TestDPSExampleRecord:
    """reference src/dps/dpss.f90: n=10 tridiagonal H (-2 diag, 1 off),
    c=ones, delta=1 then re-solves; committed record src/dps/dpsds.output:
    f(delta=1) = -1.0988e1, f(c1=2) = -1.1496e1, f(delta=10) = -1.5996e2."""

    def _H(self):
        n = 10
        H = -2.0 * np.eye(n) + np.diag(np.ones(n - 1), 1) \
            + np.diag(np.ones(n - 1), -1)
        return jnp.asarray(H)

    def test_matches_committed_output(self):
        from galahad_tpu.tr.trs import dps_solve

        H = self._H()
        c = jnp.ones(10)
        info = dps_solve(H, c, radius=1.0)
        assert abs(float(info.obj) + 10.988) < 2e-2
        c2 = c.at[0].set(2.0)
        info2 = dps_solve(H, c2, radius=1.0)
        assert abs(float(info2.obj) + 11.496) < 2e-2
        info3 = dps_solve(H, c2, radius=10.0)
        assert abs(float(info3.obj) + 159.96) < 2e-1


class TestGLTRExampleRecord:
    """reference src/gltr/gltrs.f90: n=10000 tridiag(1,-2,1), M=2I,
    r=1e-4*ones, radius=10; committed record src/gltr/gltrds.output:
    'Solution and Lagrange multiplier = -1.0000E+02  2.0000E+00'."""

    def test_matches_committed_output(self):
        from galahad_tpu.tr.gltr import GLTRControl, gltr_solve

        n = 10000

        def matvec(v):
            hv = -2.0 * v
            hv = hv.at[:-1].add(v[1:])
            hv = hv.at[1:].add(v[:-1])
            return hv

        b = jnp.full(n, 1.0e-4)
        info = gltr_solve(matvec, b, 10.0, prec=lambda v: v / 2.0,
                          ctl=GLTRControl(itmax=256))
        assert abs(float(info.obj) + 100.0) < 1e-2
        assert abs(float(info.multiplier) - 2.0) < 1e-3


class TestLSTRExampleRecord:
    """reference src/lstr/lstrs.f90: A = [I; diag(1..n)] (m=100, n=50),
    b=ones, radius=1; committed record src/lstr/lstrds.output:
    '||x|| = 1.0, ||Ax-b|| = 6.57514081'."""

    def test_matches_committed_output(self):
        from galahad_tpu.tr.lstr import LSTRControl, lstr_solve

        n = 50
        d = jnp.arange(1.0, n + 1)

        def matvec(v):          # A @ v, A = [I; diag(1..n)]
            return jnp.concatenate([v, d * v])

        def rmatvec(u):         # A' @ u
            return u[:n] + d * u[n:]

        b = jnp.ones(2 * n)
        info = lstr_solve(matvec, rmatvec, b, 1.0,
                          ctl=LSTRControl(itmax=64))
        assert abs(float(info.norm_x) - 1.0) < 1e-6
        # the record ran with fraction_opt = 0.99 (99% of the best
        # decrease); full-accuracy LSTR must match or beat it
        assert float(info.r_norm) <= 6.57514081 + 1e-6
        assert float(info.r_norm) >= 6.5       # same problem, sane value


class TestARCExampleRecord:
    """reference src/arc/arcs.f90: f = (x1+x3+4)^2 + (x2+x3)^2 + cos x1
    from x0 = 1; committed record src/arc/arcds.output: '7 iterations,
    objective -1.0, x = (-3.1416, 0.85841, -0.85841)'."""

    def test_matches_committed_output(self):
        from galahad_tpu.nlp.arc import arc_solve

        def f(x):
            return ((x[0] + x[2] + 4.0) ** 2 + (x[1] + x[2]) ** 2
                    + jnp.cos(x[0]))

        st = arc_solve(f, jnp.ones(3))
        assert bool(st.converged)
        assert abs(float(st.f) + 1.0) < 1e-6
        np.testing.assert_allclose(
            np.asarray(st.x), [-3.1416, 0.85841, -0.85841], atol=1e-3)


class TestTRBExampleRecord:
    """reference src/trb/trbs.f90: same objective, x_l=(-inf,-inf,0),
    x_u=1.1, x0=1; committed record src/trb/trbds.output:
    'objective -0.75897, x = (-3.7247, 0, 0)'."""

    def test_matches_committed_output(self):
        from galahad_tpu.nlp.tru import trb_solve

        def f(x):
            return ((x[0] + x[2] + 4.0) ** 2 + (x[1] + x[2]) ** 2
                    + jnp.cos(x[0]))

        inf = 1e20
        st = trb_solve(f, jnp.ones(3),
                       jnp.asarray([-inf, -inf, 0.0]), jnp.full(3, 1.1))
        assert bool(st.converged)
        assert abs(float(st.f) + 0.75897) < 1e-3
        np.testing.assert_allclose(np.asarray(st.x), [-3.7247, 0.0, 0.0],
                                   atol=2e-3)


class TestNLSExampleRecord:
    """reference src/nls/nlss.f90: residuals c1 = x3 x1^2 + 4,
    c2 = x2^2 + x3 from x0 = 1 (record src/nls/nlsds.output: objective
    driven to ~0 — a root of the system; the root reached is
    method-dependent, so parity = zero residual)."""

    def test_matches_committed_output(self):
        from galahad_tpu.nlp.nls import nls_solve

        def r(x):
            return jnp.asarray([x[2] * x[0] ** 2 + 4.0,
                                x[1] ** 2 + x[2]])

        st = nls_solve(r, jnp.ones(3))
        assert float(st.f) < 1e-10     # record: 7.71e-18


class TestLPAExampleRecord:
    """reference src/lpa/lpas.f90: g=(1,2,0), f=1, A as in the QP trio,
    c in [1,2]x[2,2], x_l=(-1,3,-inf), x_u=(1,inf,2); committed records
    src/lpa/lpads.output AND src/lpb/lpbds.output: 'objective 6.0,
    x = (-1, 3, -1)'."""

    def _lp(self):
        inf = 1e20
        return QP(
            H=None, h_kind="zero",
            g=jnp.asarray([1.0, 2.0, 0.0]), f=1.0,
            A=jnp.asarray([[2.0, 1.0, 0.0], [0.0, 1.0, 1.0]]),
            c_l=jnp.asarray([1.0, 2.0]), c_u=jnp.asarray([2.0, 2.0]),
            x_l=jnp.asarray([-1.0, 3.0, -inf]),
            x_u=jnp.asarray([1.0, inf, 2.0]),
        )

    def test_lpa_matches_committed_output(self):
        from galahad_tpu.qp.lpa import lpa_solve

        info = lpa_solve(self._lp())
        assert int(info.status) == 0
        assert abs(float(info.obj) - 6.0) < 1e-6
        np.testing.assert_allclose(np.asarray(info.x), [-1.0, 3.0, -1.0],
                                   atol=1e-6)

    def test_lpb_matches_committed_output(self):
        x, y, z, st = ipm_solve(self._lp())
        assert int(st.status) == 0
        obj = float(self._lp().objective(x))
        assert abs(obj - 6.0) < 1e-5
        np.testing.assert_allclose(np.asarray(x), [-1.0, 3.0, -1.0],
                                   atol=1e-4)


class TestQPBExampleRecord:
    """reference src/qpb/qpbs.f90: NONCONVEX H coo (1,1)=1 (2,2)=2
    (3,3)=3 (3,1)=4, same constraint data as the CQP trio; committed
    record src/qpb/qpbds.output: 'objective 5.4459,
    x = (-0.054054, 1.1081, 0.89189)' (same values in qpads.output)."""

    def _qp(self):
        inf = 1e20
        return QP(
            H=jnp.asarray([[1.0, 0.0, 4.0],
                           [0.0, 2.0, 0.0],
                           [4.0, 0.0, 3.0]]),
            g=jnp.asarray([0.0, 2.0, 0.0]), f=1.0,
            A=jnp.asarray([[2.0, 1.0, 0.0], [0.0, 1.0, 1.0]]),
            c_l=jnp.asarray([1.0, 2.0]), c_u=jnp.asarray([2.0, 2.0]),
            x_l=jnp.asarray([-1.0, -inf, -inf]),
            x_u=jnp.asarray([1.0, inf, 2.0]),
        )

    def test_qpb_matches_committed_output(self):
        from galahad_tpu.qp.qpb import qpb_solve

        info = qpb_solve(self._qp())
        assert int(info.status) == 0
        assert abs(float(info.obj) - 5.4459) < 1e-3
        np.testing.assert_allclose(
            np.asarray(info.x), [-0.054054, 1.1081, 0.89189], atol=2e-3)


class TestBQPBExampleRecord:
    """reference src/bqpb/bqpbs.f90 (the BQP example through an IPM);
    committed record src/bqpb/bqpbds.output: 'objective -1.0,
    x = (2, -2, ~0)'."""

    def test_matches_committed_output(self):
        from galahad_tpu.qp.wrappers import bqpb_solve

        inf = 1e20
        H = jnp.asarray([[1.0, 1.0, 0.0],
                         [1.0, 2.0, 0.0],
                         [0.0, 0.0, 3.0]])
        g = jnp.asarray([0.0, 2.0, 1.0])
        x, y, z, st = bqpb_solve(H, g,
                                 jnp.asarray([-1.0, -inf, 0.0]),
                                 jnp.asarray([inf, 1.0, 2.0]), f=1.0)
        assert int(st.status) == 0
        obj = float(0.5 * x @ (H @ x) + g @ x + 1.0)
        assert abs(obj + 1.0) < 1e-4
        np.testing.assert_allclose(np.asarray(x), [2.0, -2.0, 0.0],
                                   atol=1e-4)


class TestUGOExampleRecord:
    """reference src/ugo/ugos.f90: f(x) = x^2 cos(10 x) on [-1, 2];
    committed record src/ugo/ugods.output: 'x* = 1.583361,
    f* = -2.487269'."""

    def test_matches_committed_output(self):
        from galahad_tpu.go.ugo import ugo_solve

        info = ugo_solve(lambda x: x * x * jnp.cos(10.0 * x), -1.0, 2.0)
        assert abs(float(info.x) - 1.583361) < 1e-4
        assert abs(float(info.f) + 2.487269) < 1e-5


class TestLSRTExampleRecord:
    """reference src/lsrt/lsrts.f90: same A = [I; diag(1..n)] data,
    p = 3, sigma = 1; committed record src/lsrt/lsrtds.output:
    'objective 21.9903278, ||x|| = 0.904718377, ||Ax-b|| = 6.59446524'
    (run at fraction_opt = 0.99 — we must match or beat)."""

    def test_matches_committed_output(self):
        from galahad_tpu.tr.lstr import LSRTControl, lsrt_solve

        n = 50
        d = jnp.arange(1.0, n + 1)
        info = lsrt_solve(lambda v: jnp.concatenate([v, d * v]),
                          lambda u: u[:n] + d * u[n:],
                          jnp.ones(2 * n), 1.0, p=3.0,
                          ctl=LSRTControl(itmax=64))
        # obj = 0.5||Ax-b||^2 + (sigma/p)||x||^p; the record ran at
        # fraction_opt = 0.99, so full accuracy matches or beats it
        assert float(info.obj) <= 21.9903278 + 1e-4
        assert float(info.obj) >= 21.5


class TestL2RTExampleRecord:
    """reference src/l2rt/l2rts.f90: same data, p = 3, sigma = 1,
    mu = 0; committed record src/l2rt/l2rtds.output:
    'objective 6.79093482, ||x|| = 0.655966193, ||Ax-b|| = 6.69684923'."""

    def test_matches_committed_output(self):
        from galahad_tpu.tr.lstr import L2RTControl, l2rt_solve

        n = 50
        d = jnp.arange(1.0, n + 1)
        info = l2rt_solve(lambda v: jnp.concatenate([v, d * v]),
                          lambda u: u[:n] + d * u[n:],
                          jnp.ones(2 * n), 1.0, p=3.0, mu=0.0,
                          ctl=L2RTControl(itmax=64))
        # obj = ||Ax-b|| + (sigma/p)||x||^p; record at fraction_opt=0.99
        assert float(info.obj) <= 6.79093482 + 1e-4
        assert float(info.obj) >= 6.5
