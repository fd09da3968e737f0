"""Per-solver error-status sweeps (VERDICT r4 item 9).

Mirrors the reference unit testers' error-exit sections, which force
every documented error status per package (e.g. src/cqp/cqpt.f90:45-70:
tests = -3, -4, -5, -7, ...).  One parametrized sweep per solver
family: QP/LP (cqp/dqp/qpa/qpb/lpa), linear algebra (SLS), and the
iteration/time limits of the IPM driver.
"""
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.core.problem import INFINITY, QP
from galahad_tpu.core.status import Status

INF = 2 * INFINITY


def _qp(n=4, m=2, **over):
    rng = np.random.default_rng(0)
    B = rng.normal(size=(n, n))
    base = dict(
        H=jnp.asarray(B @ B.T + np.eye(n)),
        g=jnp.asarray(rng.normal(size=n)),
        A=jnp.asarray(rng.normal(size=(m, n))),
        c_l=jnp.full(m, -1.0), c_u=jnp.full(m, 1.0),
        x_l=jnp.zeros(n), x_u=jnp.ones(n),
    )
    base.update(over)
    return QP(**base)


def _bad_bounds_x():
    return _qp(x_l=jnp.ones(4), x_u=jnp.zeros(4))           # x_l > x_u


def _bad_bounds_c():
    return _qp(c_l=jnp.ones(2), c_u=jnp.full(2, -1.0))       # c_l > c_u


def _bad_dims():
    # A with the wrong number of columns -> RESTRICTIONS
    return _qp(A=jnp.ones((2, 3)))


QP_SOLVERS = ["cqp", "dqp", "qpa", "qpb", "lpa"]


def _solve_with(solver, qp):
    if solver == "cqp":
        from galahad_tpu.qp import IPMControl, ipm_solve

        return ipm_solve(qp, IPMControl())[3]
    if solver == "dqp":
        from galahad_tpu.qp.dqp import dqp_solve

        return dqp_solve(qp)
    if solver == "qpa":
        from galahad_tpu.qp.qpa import qpa_solve

        return qpa_solve(qp)
    if solver == "qpb":
        from galahad_tpu.qp.qpb import qpb_solve

        return qpb_solve(qp)
    from galahad_tpu.qp.lpa import lpa_solve

    return lpa_solve(qp)


@pytest.mark.parametrize("solver", QP_SOLVERS)
def test_bad_bounds_minus4(solver):
    for qp in (_bad_bounds_x(), _bad_bounds_c()):
        info = _solve_with(solver, qp)
        assert int(info.status) == int(Status.BAD_BOUNDS), solver


@pytest.mark.parametrize("solver", QP_SOLVERS)
def test_bad_dimensions_minus3(solver):
    info = _solve_with(solver, _bad_dims())
    assert int(info.status) == int(Status.RESTRICTIONS), solver


def test_primal_infeasible_minus5():
    """Contradictory linear constraints: x0 + x1 <= -1 with x >= 0."""
    from galahad_tpu.qp import IPMControl, ipm_solve

    qp = _qp(m=1,
             A=jnp.ones((1, 4)),
             c_l=jnp.full(1, -INF), c_u=jnp.full(1, -1.0),
             x_l=jnp.zeros(4), x_u=jnp.full(4, INF))
    st = ipm_solve(qp, IPMControl())[3]
    assert int(st.status) in (int(Status.PRIMAL_INFEASIBLE),
                              int(Status.ILL_CONDITIONED)), int(st.status)


def test_unbounded_lp_detected():
    """min -sum(x), x >= 0, no upper bounds: unbounded below.  The
    simplex (LPA) certifies unboundedness (-7); the IPM diagnoses its
    divergence honestly (dual infeasible / unbounded family)."""
    from galahad_tpu.qp.lpa import lpa_solve

    qp = _qp(H=None, h_kind="zero", m=1,
             g=jnp.full(4, -1.0),
             A=jnp.ones((1, 4)),
             c_l=jnp.full(1, 1.0), c_u=jnp.full(1, INF),
             x_l=jnp.zeros(4), x_u=jnp.full(4, INF))
    info = lpa_solve(qp)
    assert int(info.status) == int(Status.UNBOUNDED), int(info.status)


def test_max_iterations_minus18():
    from galahad_tpu.qp import IPMControl, ipm_solve

    st = ipm_solve(_qp(), IPMControl(maxit=1))[3]
    assert int(st.status) == int(Status.MAX_ITERATIONS)


def test_cpu_limit_minus19():
    from galahad_tpu.qp import IPMControl, ipm_solve

    st = ipm_solve(_qp(), IPMControl(clock_time_limit=1e-9))[3]
    assert int(st.status) == int(Status.CPU_LIMIT)


def test_unknown_solver_minus26():
    from galahad_tpu.qp.frontend import QPControl, qp_solve

    with pytest.raises(ValueError):
        qp_solve(_qp(), QPControl(quadratic_programming_solver="nope"))


def test_sls_unknown_backend():
    from galahad_tpu.linalg.sls import SLSControl, sls_factorize

    with pytest.raises(ValueError):
        sls_factorize(jnp.eye(3), SLSControl(solver="does-not-exist"))


def test_tiny_step_reported():
    """A fully degenerate vertex stalls the raw IPM with -13 (rescued
    at the qp_solve level, but the raw code must stay honest)."""
    from galahad_tpu.io import qplib
    from galahad_tpu.qp import IPMControl, ipm_solve

    qp = qplib.read_qp("examples/sweep/QPDEGEN.qplib")
    st = ipm_solve(qp, IPMControl())[3]
    assert int(st.status) in (int(Status.TINY_STEP),
                              int(Status.MAX_ITERATIONS))
