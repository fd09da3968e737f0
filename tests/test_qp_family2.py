"""QPA / QPB / QPC / LPA / CRO / LPQP / wrappers — the remainder of the
QP family (reference src/qpa/qpat.f90, src/qpb/qpbt.f90,
src/lpa/lpat.f90, src/cro/crot.f90 test programs)."""
import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.core.problem import INFINITY, QP
from galahad_tpu.core.residuals import kkt_residuals
from galahad_tpu.core.status import Status
from galahad_tpu.qp import (
    cro_crossover,
    dlp_solve,
    bqpb_solve,
    ipm_solve,
    lpa_solve,
    lpb_solve,
    lpqp_formulate,
    lpqp_restore,
    qp_solve,
    qpa_solve,
    qpb_solve,
    qpc_solve,
)
from galahad_tpu.qp.frontend import QPControl


BIG = 1.0e20


def simple_qp():
    """min 1/2 (x0^2 + x1^2) - x0 - 2 x1  s.t. x0 + x1 <= 1, x >= 0.
    Solution x = (0.25, 0.75) hits the general constraint... actually
    unconstrained opt (1,2) violates x0+x1<=1; KKT: x = (0, 1) with
    y = -1? verified numerically below against the IPM."""
    H = jnp.eye(2)
    g = jnp.array([-1.0, -2.0])
    A = jnp.array([[1.0, 1.0]])
    return QP(H=H, g=g, A=A,
              c_l=jnp.array([-BIG]), c_u=jnp.array([1.0]),
              x_l=jnp.zeros(2), x_u=jnp.full(2, BIG))


def simple_lp():
    """min -x0 - 2 x1, x0 + x1 <= 4, x0 <= 3, 0 <= x -> opt (0... )
    max x0+2x1: best puts x1 = 4 ... solution x = (0, 4), obj = -8."""
    g = jnp.array([-1.0, -2.0])
    A = jnp.array([[1.0, 1.0], [1.0, 0.0]])
    return QP(H=None, h_kind="zero", g=g, A=A,
              c_l=jnp.array([-BIG, -BIG]), c_u=jnp.array([4.0, 3.0]),
              x_l=jnp.zeros(2), x_u=jnp.full(2, BIG))


class TestQPA:
    def test_matches_ipm(self):
        qp = simple_qp()
        xi, yi, zi, _ = ipm_solve(qp)
        info = qpa_solve(qp)
        assert info.status == int(Status.OK)
        np.testing.assert_allclose(np.asarray(info.x), np.asarray(xi),
                                   atol=2e-3)

    def test_active_set_flags(self):
        qp = simple_qp()
        info = qpa_solve(qp)
        # the general constraint is active at the solution
        assert int(info.c_stat[0]) != 0

    def test_kkt(self):
        qp = simple_qp()
        info = qpa_solve(qp)
        rp, rd, rc = kkt_residuals(qp, info.x, info.y, info.z)
        assert float(rd) < 1e-6
        assert float(rp) < 1e-8

    def test_equality_constraint(self):
        # min ||x||^2 s.t. x0 + x1 = 1 -> x = (.5, .5)
        qp = QP(H=jnp.eye(2), g=jnp.zeros(2),
                A=jnp.array([[1.0, 1.0]]),
                c_l=jnp.ones(1), c_u=jnp.ones(1),
                x_l=jnp.full(2, -BIG), x_u=jnp.full(2, BIG))
        info = qpa_solve(qp, x0=jnp.array([1.0, 0.0]))
        np.testing.assert_allclose(np.asarray(info.x), [0.5, 0.5], atol=1e-6)


class TestQPB:
    def test_convex_agrees_with_ipm(self):
        qp = simple_qp()
        xi, *_ = ipm_solve(qp)
        info = qpb_solve(qp)
        np.testing.assert_allclose(np.asarray(info.x), np.asarray(xi),
                                   atol=1e-3)

    def test_nonconvex_bound_constrained(self):
        # min -x'x on [0,1]^2 (indefinite H): any vertex is a local min;
        # starting interior the TR method must reach a boundary point
        # with objective <= start.
        qp = QP(H=-2.0 * jnp.eye(2), g=jnp.zeros(2),
                A=jnp.zeros((0, 2)), c_l=jnp.zeros(0), c_u=jnp.zeros(0),
                x_l=jnp.zeros(2), x_u=jnp.ones(2),
                x=jnp.array([0.6, 0.7]))
        info = qpb_solve(qp)
        x = np.asarray(info.x)
        assert float(info.obj) <= -(0.6 ** 2 + 0.7 ** 2) + 1e-6
        assert np.all(x >= -1e-9) and np.all(x <= 1 + 1e-9)

    def test_nonconvex_saddle(self):
        # min x0^2 - x1^2, |x1| <= 1: solutions x1 = +-1, x0 = 0
        qp = QP(H=jnp.diag(jnp.array([2.0, -2.0])), g=jnp.zeros(2),
                A=jnp.zeros((0, 2)), c_l=jnp.zeros(0), c_u=jnp.zeros(0),
                x_l=jnp.array([-BIG, -1.0]), x_u=jnp.array([BIG, 1.0]),
                x=jnp.array([0.5, 0.1]))
        info = qpb_solve(qp)
        assert abs(float(info.obj) - (-1.0)) < 1e-4


class TestQPC:
    def test_crossover_composite(self):
        qp = simple_qp()
        info = qpc_solve(qp)
        assert info.status == int(Status.OK)
        rp, rd, rc = kkt_residuals(qp, info.x, info.y, info.z)
        assert float(rd) < 1e-6


class TestLPA:
    def test_vertex_solution(self):
        lp = simple_lp()
        info = lpa_solve(lp)
        assert info.status == int(Status.OK)
        np.testing.assert_allclose(np.asarray(info.x), [0.0, 4.0], atol=1e-9)
        assert info.obj == pytest.approx(-8.0)

    def test_matches_ipm(self):
        lp = simple_lp()
        xi, *_ = lpb_solve(lp)
        info = lpa_solve(lp)
        np.testing.assert_allclose(np.asarray(info.x), np.asarray(xi),
                                   atol=2e-3)

    def test_infeasible(self):
        lp = QP(H=None, h_kind="zero", g=jnp.ones(1),
                A=jnp.array([[1.0], [1.0]]),
                c_l=jnp.array([2.0, -BIG]), c_u=jnp.array([BIG, 1.0]),
                x_l=jnp.full(1, -BIG), x_u=jnp.full(1, BIG))
        info = lpa_solve(lp)
        assert info.status == int(Status.PRIMAL_INFEASIBLE)

    def test_unbounded(self):
        lp = QP(H=None, h_kind="zero", g=jnp.array([-1.0]),
                A=jnp.zeros((0, 1)), c_l=jnp.zeros(0), c_u=jnp.zeros(0),
                x_l=jnp.zeros(1), x_u=jnp.full(1, BIG))
        info = lpa_solve(lp)
        assert info.status in (int(Status.UNBOUNDED),)

    def test_equality(self):
        lp = QP(H=None, h_kind="zero", g=jnp.array([1.0, 2.0]),
                A=jnp.array([[1.0, 1.0]]),
                c_l=jnp.ones(1), c_u=jnp.ones(1),
                x_l=jnp.zeros(2), x_u=jnp.full(2, BIG))
        info = lpa_solve(lp)
        np.testing.assert_allclose(np.asarray(info.x), [1.0, 0.0], atol=1e-9)

    def test_random_lp_stress_vs_linprog(self):
        """Phase-2 must inherit phase-1 bound-flip state: random two-sided
        LPs cross-checked for feasibility + optimality against scipy."""
        from scipy.optimize import linprog
        rng = np.random.default_rng(7)
        for trial in range(12):
            n, m = 6, 4
            A = rng.normal(size=(m, n))
            g = rng.normal(size=n)
            x0 = rng.uniform(-1, 1, size=n)
            c0 = A @ x0
            cl = c0 - rng.uniform(0, 1, size=m)
            cu = c0 + rng.uniform(0, 1, size=m)
            xl = x0 - rng.uniform(0, 2, size=n)
            xu = x0 + rng.uniform(0, 2, size=n)
            lp = QP(H=None, h_kind="zero", g=jnp.asarray(g),
                    A=jnp.asarray(A), c_l=jnp.asarray(cl),
                    c_u=jnp.asarray(cu), x_l=jnp.asarray(xl),
                    x_u=jnp.asarray(xu))
            info = lpa_solve(lp)
            assert info.status == int(Status.OK), f"trial {trial}"
            x = np.asarray(info.x)
            assert np.all(x >= xl - 1e-7) and np.all(x <= xu + 1e-7)
            c = A @ x
            assert np.all(c >= cl - 1e-7) and np.all(c <= cu + 1e-7)
            ref = linprog(g, A_ub=np.vstack([A, -A]),
                          b_ub=np.concatenate([cu, -cl]),
                          bounds=list(zip(xl, xu)), method="highs")
            assert ref.success
            assert info.obj == pytest.approx(ref.fun, abs=1e-6)


class TestCRO:
    def test_purifies_ipm_solution(self):
        qp = simple_qp()
        x, y, z, _ = ipm_solve(qp)
        info = cro_crossover(qp, x, y, z)
        assert info.status == int(Status.OK)
        rp, rd, rc = kkt_residuals(qp, info.x, info.y, info.z)
        assert float(rd) < 1e-5
        # multipliers supported only on active constraints
        inactive = np.asarray(info.c_stat) == 0
        assert np.all(np.abs(np.asarray(info.y))[inactive] < 1e-12)

    def test_sign_convention(self):
        qp = simple_qp()
        x, y, z, _ = ipm_solve(qp)
        info = cro_crossover(qp, x, y, z)
        # upper-active constraint: y <= 0 for min with c <= c_u
        if int(info.c_stat[0]) == 1:
            assert float(info.y[0]) <= 1e-9


class TestLPQP:
    def test_elastic_absorbs_infeasibility(self):
        # infeasible QP: x = 1 and x = 2 simultaneously
        qp = QP(H=jnp.eye(1), g=jnp.zeros(1),
                A=jnp.array([[1.0], [1.0]]),
                c_l=jnp.array([1.0, 2.0]), c_u=jnp.array([1.0, 2.0]),
                x_l=jnp.full(1, -BIG), x_u=jnp.full(1, BIG))
        el = lpqp_formulate(qp, rho=10.0)
        x, y, z, st = ipm_solve(el)
        assert bool(st.converged)
        xx, u, v, *_ = lpqp_restore(qp, x, y, z)
        # elastics absorb |violation| = 1 between the two targets
        assert float(jnp.sum(u + v)) > 0.4

    def test_feasible_recovers_original(self):
        qp = simple_qp()
        el = lpqp_formulate(qp, rho=100.0)
        x, *_ = ipm_solve(el)
        xi, *_ = ipm_solve(qp)
        np.testing.assert_allclose(np.asarray(x[:2]), np.asarray(xi),
                                   atol=3e-3)


class TestWrappers:
    def test_lpb(self):
        lp = simple_lp()
        x, y, z, st = lpb_solve(lp)
        assert bool(st.converged)
        np.testing.assert_allclose(np.asarray(x), [0.0, 4.0], atol=1e-4)

    def test_dlp(self):
        lp = simple_lp()
        info = dlp_solve(lp, reg=1e-7)
        np.testing.assert_allclose(np.asarray(info.x), [0.0, 4.0], atol=1e-3)

    def test_bqpb(self):
        # min 1/2 x'x - x'1 on [0, 0.5]^3 -> x = 0.5 everywhere
        x, y, z, st = bqpb_solve(jnp.eye(3), -jnp.ones(3),
                                 jnp.zeros(3), jnp.full(3, 0.5))
        assert bool(st.converged)
        np.testing.assert_allclose(np.asarray(x), 0.5, atol=1e-6)


class TestFrontendDispatch:
    @pytest.mark.parametrize("solver", ["qpa", "qpb", "qpc"])
    def test_qp_solve_dispatch(self, solver):
        qp = simple_qp()
        xi, *_ = ipm_solve(qp)
        x, y, z, info = qp_solve(
            qp, QPControl(quadratic_programming_solver=solver))
        np.testing.assert_allclose(np.asarray(x), np.asarray(xi), atol=1e-3)

    @pytest.mark.parametrize("solver", ["lpa", "lpb"])
    def test_lp_dispatch(self, solver):
        lp = simple_lp()
        x, y, z, info = qp_solve(
            lp, QPControl(quadratic_programming_solver=solver))
        np.testing.assert_allclose(np.asarray(x), [0.0, 4.0], atol=1e-4)


class TestDQPExactArc:
    """Exact piecewise-linear arc search (reference dqp.f90:306)."""

    def test_matches_trb_path_and_ipm(self):
        from test_ipm import random_convex_qp
        from galahad_tpu.qp.dqp import DQPControl, dqp_solve
        from galahad_tpu.qp.ipm import ipm_solve

        qp = random_convex_qp(12, 6, 77)
        exact = dqp_solve(qp, ctl=DQPControl(exact_arc=True))
        trb = dqp_solve(qp, ctl=DQPControl(exact_arc=False))
        assert bool(exact.converged)
        np.testing.assert_allclose(np.asarray(exact.x), np.asarray(trb.x),
                                   atol=1e-6)
        x, y, z, st = ipm_solve(qp)
        np.testing.assert_allclose(float(exact.obj),
                                   float(qp.objective(x)), atol=1e-6)

    def test_exact_arc_first_iteration_progress(self):
        # one arc search + subspace step should land on the optimal face
        # for a problem whose dual has a single breakpoint structure
        from galahad_tpu.qp.dqp import DQPControl, dqp_solve

        n = 5
        qp = QP(
            H=jnp.arange(1.0, n + 1.0), h_kind="diagonal",
            g=-jnp.ones(n),
            A=jnp.ones((1, n)), c_l=jnp.array([-INFINITY]),
            c_u=jnp.array([1.0]),
            x_l=jnp.zeros(n), x_u=jnp.full(n, 10.0),
        )
        info = dqp_solve(qp, ctl=DQPControl(exact_arc=True))
        assert bool(info.converged)
        assert int(info.iter) <= 3
        rp, rd, rc = kkt_residuals(qp, info.x, info.y, info.z)
        assert float(rp) < 1e-8 and float(rd) < 1e-8

    def test_warm_start_exact_arc(self):
        from test_ipm import random_convex_qp
        from galahad_tpu.qp.dqp import DQPControl, dqp_solve
        from galahad_tpu.qp.ipm import ipm_solve

        qp = random_convex_qp(10, 5, 321)
        x, y, z, st = ipm_solve(qp)
        warm = dqp_solve(qp, y0=y, z0=z, ctl=DQPControl(exact_arc=True))
        assert bool(warm.converged)
        assert int(warm.iter) <= 2


def test_degenerate_stall_rescued_by_dqp_crossover():
    """VERDICT r4 item 5: IPM stalls on degenerate endgames (-13/-18)
    are rescued by the DQP dual crossover in qp_solve (the QPC
    cqp->qpa role, reference src/qpc/qpc.f90); both sweep fixtures
    reach status 0."""
    import numpy as np

    from galahad_tpu.io import qplib
    from galahad_tpu.core.residuals import kkt_residuals
    from galahad_tpu.qp.frontend import QPControl, qp_solve

    for name in ("QPDEGEN", "QPMIXB"):
        qp = qplib.read_qp(f"examples/sweep/{name}.qplib")
        x, y, z, info = qp_solve(qp, QPControl())
        assert int(info.status) == 0, (name, int(info.status))
        rp, rd, rc = kkt_residuals(qp, x, y, z)
        assert float(rp) <= 1e-6 and float(rd) <= 1e-5, (name, rp, rd)
        assert float(rc) <= 1e-4, (name, float(rc))
