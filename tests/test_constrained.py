"""Constrained-NLP solver tests: augmented Lagrangian (LANCELOT-class),
filter feasibility (FILTRANE), QP front-end / LSQP / WCP / L1QP."""
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.core.problem import INFINITY, QP, classify_bounds
from galahad_tpu.core.residuals import kkt_residuals
from galahad_tpu.core.status import Status
from galahad_tpu.nlp import filtrane_solve, lancelot_solve
from galahad_tpu.qp.frontend import (
    L1QPControl,
    QPControl,
    WCPControl,
    l1qp_solve,
    lsqp_solve,
    qp_solve,
    wcp_solve,
)

from test_ipm import random_convex_qp


class TestLancelot:
    def test_equality_constrained(self):
        """min x0^2 + x1^2 s.t. x0 + x1 = 1 -> x = (0.5, 0.5), y = -1."""

        def f(x):
            return jnp.sum(x**2)

        def c(x):
            return jnp.array([x[0] + x[1]])

        info = lancelot_solve(f, c, jnp.zeros(2),
                              jnp.array([1.0]), jnp.array([1.0]))
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(info.x), [0.5, 0.5], atol=1e-5)
        assert float(info.y[0]) == pytest.approx(-1.0, abs=1e-4)

    def test_inequality(self):
        """min (x0-2)^2 + (x1-2)^2 s.t. x0 + x1 <= 2 -> x = (1, 1)."""

        def f(x):
            return jnp.sum((x - 2.0) ** 2)

        def c(x):
            return jnp.array([x[0] + x[1]])

        info = lancelot_solve(f, c, jnp.zeros(2),
                              jnp.array([-INFINITY]), jnp.array([2.0]))
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(info.x), [1.0, 1.0], atol=1e-4)

    def test_inactive_inequality(self):
        def f(x):
            return jnp.sum((x - 0.2) ** 2)

        def c(x):
            return jnp.array([x[0] + x[1]])

        info = lancelot_solve(f, c, jnp.zeros(2),
                              jnp.array([-INFINITY]), jnp.array([2.0]))
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(info.x), [0.2, 0.2], atol=1e-5)
        assert abs(float(info.y[0])) < 1e-6

    def test_with_bounds(self):
        """Rosenbrock on a circle-ish constraint with bounds."""

        def f(x):
            return (1 - x[0]) ** 2 + 100 * (x[1] - x[0] ** 2) ** 2

        def c(x):
            return jnp.array([x[0] ** 2 + x[1] ** 2])

        # constrain to the unit disk; solution on the boundary near
        # (0.786, 0.618)
        info = lancelot_solve(f, c, jnp.array([0.5, 0.5]),
                              jnp.array([-INFINITY]), jnp.array([1.0]),
                              x_l=jnp.zeros(2), x_u=jnp.ones(2))
        assert bool(info.converged)
        x = np.asarray(info.x)
        assert x[0] ** 2 + x[1] ** 2 <= 1.0 + 1e-5
        assert float(info.f) < f(jnp.array([0.5, 0.5]))

    def test_nonlinear_equality(self):
        """min x0 + x1 s.t. x0^2 + x1^2 = 2 -> x = (-1, -1)."""

        def f(x):
            return x[0] + x[1]

        def c(x):
            return jnp.array([x[0] ** 2 + x[1] ** 2])

        info = lancelot_solve(f, c, jnp.array([0.1, -1.5]),
                              jnp.array([2.0]), jnp.array([2.0]))
        assert bool(info.converged)
        np.testing.assert_allclose(np.asarray(info.x), [-1.0, -1.0],
                                   atol=1e-4)

    def test_large_n_matrix_free(self):
        """n=400 constrained problem through the auto-selected "hvp"
        inner model: no dense (n, n) Hessian is ever materialized
        (LANCELOT's group-partial-separability role; SURVEY §3.3)."""
        from galahad_tpu.nlp.lancelot import LancelotControl

        n = 400

        def f(x):
            return jnp.sum((x - 1.0) ** 2) + 0.1 * jnp.sum(
                (x[1:] * x[:-1]) ** 2)

        def c(x):
            return jnp.array([jnp.sum(x) - 10.0])

        info = lancelot_solve(f, c, jnp.full(n, 0.5),
                              jnp.array([0.0]), jnp.array([0.0]),
                              ctl=LancelotControl(maxit=20))
        assert bool(info.converged)
        assert float(info.infeas) < 1e-5
        # KKT: grad f + y * grad c = 0 with c(x) = 0
        x = np.asarray(info.x)
        assert abs(x.sum() - 10.0) < 1e-4


class TestFiltrane:
    def test_nonlinear_system(self):
        """Solve the 2x2 system x0^2 + x1^2 = 1, x0 = x1^2 exactly."""

        def c(x):
            return jnp.array([x[0] ** 2 + x[1] ** 2, x[0] - x[1] ** 2])

        info = filtrane_solve(c, jnp.array([0.5, 0.5]),
                              jnp.array([1.0, 0.0]), jnp.array([1.0, 0.0]))
        assert bool(info.converged)
        x = np.asarray(info.x)
        assert abs(x[0] ** 2 + x[1] ** 2 - 1) < 1e-4
        assert abs(x[0] - x[1] ** 2) < 1e-4

    def test_inequality_feasibility(self):
        """Find a point in a polytope-ish nonlinear region."""

        def c(x):
            return jnp.array([x[0] + x[1], x[0] ** 2 + x[1] ** 2])

        info = filtrane_solve(c, jnp.array([5.0, 5.0]),
                              jnp.array([1.0, -INFINITY]),
                              jnp.array([INFINITY, 4.0]))
        assert bool(info.converged)
        x = np.asarray(info.x)
        assert x[0] + x[1] >= 1 - 1e-4
        assert x[0] ** 2 + x[1] ** 2 <= 4 + 1e-4

    def test_already_feasible(self):
        def c(x):
            return x

        info = filtrane_solve(c, jnp.array([0.5]),
                              jnp.array([0.0]), jnp.array([1.0]))
        assert bool(info.converged)
        assert int(info.iter) <= 1


class TestQPFrontend:
    def test_dispatch_all_solvers(self):
        qp = random_convex_qp(8, 4, 500)
        xs = {}
        for name in ("cqp", "dqp", "ccqp"):
            x, y, z, info = qp_solve(
                qp, QPControl(quadratic_programming_solver=name))
            rp, rd, rc = kkt_residuals(qp, x, y, z)
            assert float(rp) < 1e-5 and float(rd) < 1e-5, name
            xs[name] = np.asarray(x)
        np.testing.assert_allclose(xs["cqp"], xs["dqp"], atol=1e-4)

    def test_scaled_presolved(self):
        qp = random_convex_qp(8, 4, 501)
        x, y, z, info = qp_solve(
            qp, QPControl(scale=1, presolve_problem=True))
        rp, rd, rc = kkt_residuals(qp, x, y, z)
        assert float(rp) < 1e-5 and float(rd) < 1e-5

    def test_lsqp(self):
        qp = random_convex_qp(8, 5, 502, lp=True)
        x, y, z, st = lsqp_solve(qp)
        assert int(st.status) == int(Status.OK)
        with pytest.raises(ValueError):
            lsqp_solve(random_convex_qp(4, 2, 503))

    def test_wcp(self):
        """WCP point is strictly interior, feasible AND CENTERED: every
        active complementarity pair lies in the two-sided band
        [gamma_c mu, mu / gamma_c] (reference WCP_solve measures,
        src/wcp/wcp.f90:935 — VERDICT r1 item 10)."""
        from galahad_tpu.qp.frontend import WCPControl

        qp = random_convex_qp(8, 4, 504)
        ctl = WCPControl(mu_target=1.0, gamma_c=0.1)
        x, y, z, st = wcp_solve(qp, ctl)
        assert bool(st.converged)
        masks = classify_bounds(qp)
        assert float(jnp.max(jnp.abs(qp.A @ x - jnp.clip(
            qp.A @ x, qp.c_l, qp.c_u)))) < 1e-6
        gap_l = np.asarray(x - qp.x_l)
        gap_u = np.asarray(qp.x_u - x)
        assert gap_l.min() > 1e-8 and gap_u.min() > 1e-8
        # centrality of the bound pairs, from the state's internal
        # (z_l, z_u) split (two-sided bounds keep BOTH pairs centered)
        has_l = np.asarray(masks.has_xl)
        has_u = np.asarray(masks.has_xu)
        prods = np.concatenate([
            (gap_l * np.asarray(st.z_l))[has_l],
            (gap_u * np.asarray(st.z_u))[has_u],
        ])
        assert prods.size > 0
        assert prods.min() >= ctl.gamma_c * ctl.mu_target * 0.99
        assert prods.max() <= ctl.mu_target / ctl.gamma_c * 1.01

    def test_l1qp_feasible_case(self):
        """Feasible QP: l1 penalty with big rho reproduces the QP
        solution."""
        qp = random_convex_qp(6, 3, 505)
        from galahad_tpu.qp.ipm import ipm_solve

        x_ref, _, _, _ = ipm_solve(qp)
        x, y, z, st = l1qp_solve(qp, L1QPControl(rho=1e4))
        np.testing.assert_allclose(np.asarray(x), np.asarray(x_ref),
                                   atol=1e-3)

    def test_l1qp_infeasible_case(self):
        """Inconsistent constraints: l1QP still returns a minimizer of
        the penalized violation (the reference's l1 elastic mode)."""
        n = 4
        qp = QP(
            H=jnp.eye(n), g=jnp.zeros(n),
            A=jnp.ones((2, n)) * jnp.array([[1.0], [1.0]]),
            c_l=jnp.array([2.0, -INFINITY]),
            c_u=jnp.array([INFINITY, 1.0]),     # sum >= 2 AND sum <= 1
            x_l=jnp.zeros(n), x_u=jnp.ones(n),
        )
        x, y, z, st = l1qp_solve(qp, L1QPControl(rho=10.0))
        assert bool(st.converged)
        assert np.all(np.isfinite(np.asarray(x)))
