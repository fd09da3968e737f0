"""Trust-region / regularization subproblem solver tests (TRS/RQS/DPS,
GLTR/GLRT equivalents).

Numerical-contract style (SURVEY §4): optimality conditions of the
subproblems — (H + lam M) x = -c, lam >= 0, H + lam M >= 0, and the
complementarity lam (||x|| - radius) = 0 — checked on randomized and
structured (hard-case) instances, batched and single.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.tr import (
    GLRTControl,
    GLTRControl,
    TRSControl,
    glrt_solve,
    gltr_solve,
    rqs_solve,
    trs_solve,
    trs_solve_diagonal,
)


def rand_sym(n, seed, shift=0.0):
    r = np.random.default_rng(seed)
    B = r.normal(size=(n, n))
    return jnp.asarray((B + B.T) / 2 + shift * np.eye(n))


def check_trs_kkt(H, c, radius, info, M=None, tol=1e-8):
    """(H + lam M) x = -c; lam >= 0; lam (||x||_M - radius) = 0; feasible."""
    x = np.asarray(info.x)
    lam = float(info.multiplier)
    Mn = np.eye(len(x)) if M is None else np.asarray(M)
    r = np.asarray(H) @ x + lam * (Mn @ x) + np.asarray(c)
    scale = max(1.0, float(np.linalg.norm(np.asarray(c))))
    assert np.linalg.norm(r) / scale < tol, f"stationarity {np.linalg.norm(r)}"
    nrm = float(np.sqrt(x @ Mn @ x))
    assert nrm <= float(radius) * (1 + 1e-7), f"infeasible {nrm} > {radius}"
    assert lam >= -1e-12
    assert abs(lam * (nrm - float(radius))) / scale < 1e-6
    # H + lam M must be PSD: check smallest eigenvalue
    w = np.linalg.eigvalsh(np.asarray(H) + lam * Mn)
    assert w[0] >= -1e-7 * max(1.0, abs(w[-1]))


class TestTRS:
    def test_interior(self):
        H = rand_sym(8, 0, shift=6.0)  # PD
        c = jnp.asarray(np.random.default_rng(1).normal(size=8))
        info = trs_solve(H, c, 100.0)
        assert bool(info.interior)
        xstar = np.linalg.solve(np.asarray(H), -np.asarray(c))
        np.testing.assert_allclose(np.asarray(info.x), xstar, atol=1e-9)
        check_trs_kkt(H, c, 100.0, info)

    @pytest.mark.parametrize("seed", [2, 3, 4])
    def test_boundary_pd(self, seed):
        H = rand_sym(10, seed, shift=5.0)
        c = jnp.asarray(np.random.default_rng(seed + 50).normal(size=10))
        info = trs_solve(H, c, 0.1)
        assert not bool(info.interior)
        assert float(info.norm_x) == pytest.approx(0.1, rel=1e-8)
        check_trs_kkt(H, c, 0.1, info)

    @pytest.mark.parametrize("seed", [5, 6, 7])
    def test_indefinite(self, seed):
        H = rand_sym(10, seed)  # indefinite
        c = jnp.asarray(np.random.default_rng(seed + 60).normal(size=10))
        info = trs_solve(H, c, 1.0)
        assert not bool(info.interior)
        check_trs_kkt(H, c, 1.0, info)

    def test_hard_case(self):
        """c orthogonal to the leftmost eigenvector and the pseudo-inverse
        solution interior: lam = -lam_min, solution completed along the
        eigenvector (reference trs.f90:2398-2430)."""
        n = 6
        r = np.random.default_rng(9)
        Q, _ = np.linalg.qr(r.normal(size=(n, n)))
        lams = np.array([-2.0, 1.0, 2.0, 3.0, 4.0, 5.0])
        H = jnp.asarray(Q @ np.diag(lams) @ Q.T)
        # c with NO component along leftmost eigenvector, small otherwise
        c_eig = np.array([0.0, 0.1, -0.05, 0.08, 0.02, -0.03])
        c = jnp.asarray(Q @ c_eig)
        radius = 5.0  # large enough that pinv solution is interior
        info = trs_solve(H, c, radius)
        assert bool(info.hard_case)
        assert float(info.multiplier) == pytest.approx(2.0, abs=1e-6)
        assert float(info.norm_x) == pytest.approx(radius, rel=1e-6)
        check_trs_kkt(H, c, radius, info, tol=1e-6)

    def test_equality_constraint_option(self):
        """equality_problem: ||x|| = radius even when the interior
        minimizer exists (reference TRS control equality_problem)."""
        H = rand_sym(6, 11, shift=5.0)
        c = jnp.asarray(0.01 * np.random.default_rng(12).normal(size=6))
        info = trs_solve(H, c, 0.5, ctl=TRSControl(equality_problem=True))
        assert float(info.norm_x) == pytest.approx(0.5, rel=1e-7)

    def test_m_norm(self):
        H = rand_sym(7, 13)
        c = jnp.asarray(np.random.default_rng(14).normal(size=7))
        Mr = rand_sym(7, 15, shift=4.0)
        info = trs_solve(H, c, 0.7, M=Mr)
        check_trs_kkt(H, c, 0.7, info, M=Mr, tol=1e-7)

    def test_diagonal_fast_path(self):
        h = jnp.array([-1.0, 2.0, 3.0])
        c = jnp.array([0.3, -0.4, 0.5])
        info = trs_solve_diagonal(h, c, 1.0)
        check_trs_kkt(jnp.diag(h), c, 1.0, info)

    def test_batched(self):
        """vmapped batch — the SURVEY §5.7 thousands-of-subproblems axis."""
        n, batch = 6, 32
        r = np.random.default_rng(20)
        Hs = jnp.asarray(
            [(lambda B: (B + B.T) / 2)(r.normal(size=(n, n))) for _ in range(batch)]
        )
        cs = jnp.asarray(r.normal(size=(batch, n)))
        radii = jnp.asarray(r.uniform(0.1, 2.0, size=batch))
        infos = jax.jit(jax.vmap(lambda H, c, d: trs_solve(H, c, d)))(Hs, cs, radii)
        for i in range(batch):
            one = jax.tree_util.tree_map(lambda a: a[i], infos)
            check_trs_kkt(Hs[i], cs[i], float(radii[i]), one, tol=1e-6)

    def test_zero_c(self):
        """c = 0 with indefinite H: pure eigenvector solution."""
        H = rand_sym(5, 30)
        info = trs_solve(H, jnp.zeros(5), 2.0)
        lam_min = float(np.linalg.eigvalsh(np.asarray(H))[0])
        assert float(info.obj) == pytest.approx(0.5 * lam_min * 4.0, rel=1e-6)


class TestRQS:
    @pytest.mark.parametrize("seed,shift", [(0, 4.0), (1, 0.0), (2, -1.0)])
    def test_optimality(self, seed, shift):
        """(H + s I) x = -c with s = sigma ||x||^{p-2}, H + s I >= 0."""
        n, p, sigma = 8, 3.0, 0.7
        H = rand_sym(n, seed, shift=shift)
        c = jnp.asarray(np.random.default_rng(seed + 40).normal(size=n))
        info = rqs_solve(H, c, sigma, p=p)
        x = np.asarray(info.x)
        s = float(info.multiplier)
        nrm = np.linalg.norm(x)
        assert s == pytest.approx(sigma * nrm ** (p - 2), rel=1e-5, abs=1e-9)
        r = np.asarray(H) @ x + s * x + np.asarray(c)
        assert np.linalg.norm(r) < 1e-6 * max(1.0, np.linalg.norm(np.asarray(c)))
        w = np.linalg.eigvalsh(np.asarray(H) + s * np.eye(n))
        assert w[0] >= -1e-7 * max(1.0, abs(w[-1]))

    def test_matches_brute_force(self):
        """Global min of the regularized model via fine 1-d search on s."""
        n = 5
        H = rand_sym(n, 8)
        c = jnp.asarray(np.random.default_rng(17).normal(size=n))
        sigma, p = 1.3, 3.0
        info = rqs_solve(H, c, sigma, p=p)

        def model(x):
            x = np.asarray(x)
            return (
                0.5 * x @ np.asarray(H) @ x
                + np.asarray(c) @ x
                + sigma / p * np.linalg.norm(x) ** p
            )

        # random probing should not find anything better
        r = np.random.default_rng(18)
        best = min(
            model(np.asarray(info.x) + 0.05 * r.normal(size=n)) for _ in range(200)
        )
        assert model(info.x) <= best + 1e-9


def make_matvec(H):
    return lambda v: H @ v


class TestGLTR:
    @pytest.mark.parametrize("seed", [0, 1])
    def test_matches_exact_small(self, seed):
        """With itmax >= n the Krylov solution equals the exact TRS one."""
        n = 8
        H = rand_sym(n, seed, shift=1.0)
        c = jnp.asarray(np.random.default_rng(seed + 70).normal(size=n))
        ex = trs_solve(H, c, 0.5)
        kr = gltr_solve(make_matvec(H), c, 0.5, ctl=GLTRControl(itmax=16))
        assert float(kr.obj) == pytest.approx(float(ex.obj), abs=1e-7)
        np.testing.assert_allclose(np.asarray(kr.x), np.asarray(ex.x), atol=1e-5)

    def test_interior_cg_equivalence(self):
        """Interior case: GLTR == CG == exact Newton step."""
        n = 10
        H = rand_sym(n, 5, shift=8.0)
        c = jnp.asarray(np.random.default_rng(75).normal(size=n))
        kr = gltr_solve(make_matvec(H), c, 1e3, ctl=GLTRControl(itmax=32))
        xstar = np.linalg.solve(np.asarray(H), -np.asarray(c))
        np.testing.assert_allclose(np.asarray(kr.x), xstar, atol=1e-6)

    def test_preconditioned(self):
        """M-norm TR: check feasibility in the M norm and model decrease."""
        n = 9
        H = rand_sym(n, 6)
        c = jnp.asarray(np.random.default_rng(76).normal(size=n))
        Md = jnp.asarray(np.random.default_rng(77).uniform(1.0, 3.0, size=n))
        prec = lambda v: v / Md
        kr = gltr_solve(make_matvec(H), c, 0.8, prec=prec,
                        ctl=GLTRControl(itmax=32))
        x = np.asarray(kr.x)
        norm_m = np.sqrt(x @ (np.asarray(Md) * x))
        assert norm_m <= 0.8 * (1 + 1e-6)
        model = 0.5 * x @ np.asarray(H) @ x + np.asarray(c) @ x
        assert model < 0.0

    def test_batched(self):
        n, batch = 6, 8
        r = np.random.default_rng(80)
        Hs = jnp.asarray(
            [(lambda B: (B + B.T) / 2)(r.normal(size=(n, n))) for _ in range(batch)]
        )
        cs = jnp.asarray(r.normal(size=(batch, n)))

        def solve(H, c):
            return gltr_solve(make_matvec(H), c, 1.0, ctl=GLTRControl(itmax=12)).obj

        objs = jax.jit(jax.vmap(solve))(Hs, cs)
        for i in range(batch):
            ex = trs_solve(Hs[i], cs[i], 1.0)
            assert float(objs[i]) == pytest.approx(float(ex.obj), abs=1e-6)


class TestGLRT:
    @pytest.mark.parametrize("seed", [0, 3])
    def test_matches_exact_small(self, seed):
        n = 7
        H = rand_sym(n, seed + 90)
        c = jnp.asarray(np.random.default_rng(seed + 95).normal(size=n))
        ex = rqs_solve(H, c, 0.9, p=3.0)
        kr = glrt_solve(make_matvec(H), c, 0.9, p=3.0,
                        ctl=GLRTControl(itmax=16))
        assert float(kr.obj) == pytest.approx(float(ex.obj), abs=1e-6)


def test_trs_chol_matches_eigen_secular():
    """Factorization-based Moré-Sorensen TRS (the reference TRS's own
    factorize-per-lambda algorithm, src/trs/trs.f90:802; batched
    Cholesky backend) agrees with the exact eigen-secular solver on
    boundary and interior cases."""
    import numpy as np

    from galahad_tpu.tr.trs import trs_solve, trs_solve_chol

    rng = np.random.default_rng(0)
    for i in range(25):
        n = int(rng.integers(3, 30))
        B = rng.normal(size=(n, n))
        H = (B + B.T) / 2
        if i % 3 == 0:
            H = H @ H.T * 0.2 + np.eye(n) * 0.1   # PD -> interior mix
        c = rng.normal(size=n)
        rad = float(rng.uniform(0.05, 3.0))
        a = trs_solve(jnp.asarray(H), jnp.asarray(c), rad)
        b = trs_solve_chol(jnp.asarray(H), jnp.asarray(c), rad)
        assert float(b.norm_x) <= rad * (1 + 1e-5)
        gap = (float(b.obj) - float(a.obj)) / max(1.0, abs(float(a.obj)))
        assert gap <= 1e-5, (i, n, rad, gap)
    # batched (leading dims) agreement
    Bm = rng.normal(size=(32, 12, 12))
    Hs = jnp.asarray((Bm + np.swapaxes(Bm, -1, -2)) / 2)
    cs = jnp.asarray(rng.normal(size=(32, 12)))
    rads = jnp.asarray(rng.uniform(0.1, 2.0, 32))
    objs_ref = jax.vmap(lambda H, c, r: trs_solve(H, c, r).obj)(
        Hs, cs, rads)
    out = trs_solve_chol(Hs, cs, rads)
    assert float(jnp.max(out.obj - objs_ref)) <= 1e-6
