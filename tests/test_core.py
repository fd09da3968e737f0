"""Core substrate tests: status codes, problem containers, config/specfiles.

Models the reference's per-package unit-test style (SURVEY §4): sweep the
documented error statuses and option mechanisms with tolerance asserts
instead of output diffs.
"""
import dataclasses

import jax.numpy as jnp
import pytest

from galahad_tpu.core.config import (
    apply_specfile, control, read_specfile, write_specfile_template,
)
from galahad_tpu.core.problem import INFINITY, QP, check_qp, classify_bounds
from galahad_tpu.core.status import Status, status_message


def make_qp(n=3, m=2, **kw):
    d = dict(
        H=jnp.eye(n),
        g=jnp.zeros(n),
        A=jnp.ones((m, n)),
        c_l=jnp.zeros(m),
        c_u=jnp.ones(m),
        x_l=jnp.zeros(n),
        x_u=jnp.ones(n),
    )
    d.update(kw)
    return QP(**d)


class TestStatus:
    def test_reference_codes(self):
        # numbering parity with src/symbols/symbols.f90:52-102
        assert Status.OK == 0
        assert Status.RESTRICTIONS == -3
        assert Status.BAD_BOUNDS == -4
        assert Status.FACTORIZATION == -10
        assert Status.MAX_ITERATIONS == -18
        assert Status.INERTIA == -20
        assert Status.UNKNOWN_SOLVER == -26

    def test_messages(self):
        assert "bounds" in status_message(Status.BAD_BOUNDS)
        assert "unknown status" in status_message(12345)


class TestProblem:
    def test_classify(self):
        qp = make_qp(
            x_l=jnp.array([0.0, -INFINITY, 2.0]),
            x_u=jnp.array([1.0, INFINITY, 2.0]),
            c_l=jnp.array([0.0, 1.0]),
            c_u=jnp.array([INFINITY, 1.0]),
        )
        mk = classify_bounds(qp)
        assert mk.x_range.tolist() == [True, False, False]
        assert mk.x_free.tolist() == [False, True, False]
        assert mk.x_fixed.tolist() == [False, False, True]
        assert mk.c_equality.tolist() == [False, True]
        assert mk.has_cu.tolist() == [False, True]

    def test_check_bad_bounds(self):
        qp = make_qp(x_l=jnp.array([0.0, 2.0, 0.0]), x_u=jnp.ones(3))
        assert check_qp(qp) == int(Status.BAD_BOUNDS)
        assert check_qp(make_qp()) == int(Status.OK)

    def test_hessian_kinds(self):
        v = jnp.array([1.0, 2.0, 3.0])
        dense = make_qp(H=2.0 * jnp.eye(3))
        diag = make_qp(H=jnp.full(3, 2.0), h_kind="diagonal")
        zero = make_qp(H=None, h_kind="zero")
        ident = make_qp(H=None, h_kind="identity")
        assert jnp.allclose(dense.Hx(v), 2 * v)
        assert jnp.allclose(diag.Hx(v), 2 * v)
        assert jnp.allclose(zero.Hx(v), 0 * v)
        assert jnp.allclose(ident.Hx(v), v)
        assert jnp.allclose(diag.H_dense(), 2 * jnp.eye(3))
        assert jnp.allclose(zero.H_diag(), jnp.zeros(3))

    def test_objective(self):
        qp = make_qp(g=jnp.array([1.0, 0.0, 0.0]), f=5.0)
        x = jnp.array([2.0, 0.0, 0.0])
        assert float(qp.objective(x)) == pytest.approx(2.0 + 2.0 + 5.0)


@control
class DemoSub:
    tol: float = 1e-6


@control
class DemoControl:
    maxit: int = 100
    stop_abs_p: float = 1e-5
    verbose: bool = False
    solver: str = "cqp"
    sub: DemoSub = DemoSub()


class TestConfig:
    def test_specfile_parse(self):
        spec = read_specfile(
            """
! a comment
maxit 50
stop-abs-p 1.0D-8
verbose yes
solver dqp
BEGIN sub
  tol 1e-3
END sub
"""
        )
        assert spec["maxit"] == "50"
        assert spec["sub.tol"] == "1e-3"

    def test_apply(self):
        ctl = DemoControl()
        spec = read_specfile(
            "maxit 50\nstop-abs-p 1.0D-8\nverbose yes\nsolver dqp\n"
            "BEGIN sub\n tol 1e-3\nEND sub"
        )
        out = apply_specfile(ctl, spec)
        assert out.maxit == 50
        assert out.stop_abs_p == 1e-8
        assert out.verbose is True
        assert out.solver == "dqp"
        assert out.sub.tol == 1e-3
        # frozen original untouched
        assert ctl.maxit == 100

    def test_template_roundtrip(self):
        text = write_specfile_template(DemoControl(), "DEMO")
        assert "maxit" in text and "BEGIN DEMO" in text
