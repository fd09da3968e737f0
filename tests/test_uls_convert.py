"""ULS facade, CONVERT storage conversions, MOP sparse ops
(reference src/uls, src/convert, src/mop test programs)."""
import jax
import jax.numpy as jnp
import numpy as np

from galahad_tpu.linalg.convert import (
    COO,
    band_from_coo,
    coo_to_csr,
    coo_to_dense,
    csr_to_coo,
    csr_to_csc,
    csr_to_dense,
    dense_to_coo,
    dense_to_csr,
    symmetric_expand,
)
from galahad_tpu.linalg.mop import (
    coo_Ax,
    coo_Aty,
    coo_col_norms,
    coo_extract_diagonal,
    coo_row_norms,
    coo_scale,
)
from galahad_tpu.linalg.uls import (
    ULSControl,
    uls_enquire,
    uls_factorize,
    uls_find_basis,
    uls_solve,
)


def _rand_sparse(m, n, density=0.3, seed=0):
    r = np.random.default_rng(seed)
    M = r.normal(size=(m, n)) * (r.uniform(size=(m, n)) < density)
    return M


class TestConvert:
    def test_roundtrip_coo_csr(self):
        M = _rand_sparse(7, 5)
        coo = dense_to_coo(M)
        csr = coo_to_csr(coo)
        np.testing.assert_allclose(csr_to_dense(csr), M)
        np.testing.assert_allclose(coo_to_dense(csr_to_coo(csr)), M)

    def test_csc(self):
        M = _rand_sparse(6, 4, seed=1)
        csc = csr_to_csc(dense_to_csr(M))
        np.testing.assert_allclose(csr_to_dense(csc), M.T)

    def test_duplicates_summed(self):
        coo = COO(2, 2, np.array([0, 0], np.int32),
                  np.array([1, 1], np.int32), np.array([2.0, 3.0]))
        D = coo_to_dense(coo)
        assert D[0, 1] == 5.0

    def test_symmetric_expand(self):
        # lower triangle of [[2,1],[1,3]]
        coo = COO(2, 2, np.array([0, 1, 1], np.int32),
                  np.array([0, 0, 1], np.int32), np.array([2.0, 1.0, 3.0]))
        full = coo_to_dense(symmetric_expand(coo))
        np.testing.assert_allclose(full, [[2, 1], [1, 3]])

    def test_band(self):
        A = np.array([[4.0, 1, 0], [1, 5, 2], [0, 2, 6]])
        coo = dense_to_coo(np.tril(A))
        band = band_from_coo(coo)
        np.testing.assert_allclose(band[0], [4, 5, 6])
        np.testing.assert_allclose(band[1], [1, 2, 0])


class TestMop:
    def test_Ax_Aty(self):
        M = _rand_sparse(6, 4, seed=2)
        coo = dense_to_coo(M)
        x = np.random.default_rng(3).normal(size=4)
        y = np.random.default_rng(4).normal(size=6)
        np.testing.assert_allclose(
            np.asarray(coo_Ax(coo.row, coo.col, coo.val, jnp.asarray(x), 6)),
            M @ x, rtol=1e-12)
        np.testing.assert_allclose(
            np.asarray(coo_Aty(coo.row, coo.col, coo.val, jnp.asarray(y), 4)),
            M.T @ y, rtol=1e-12)

    def test_symmetric_Ax(self):
        B = _rand_sparse(5, 5, seed=5)
        S = B + B.T + 5 * np.eye(5)
        coo = dense_to_coo(np.tril(S))
        x = np.random.default_rng(6).normal(size=5)
        np.testing.assert_allclose(
            np.asarray(coo_Ax(coo.row, coo.col, coo.val, jnp.asarray(x), 5,
                              symmetric=True)),
            S @ x, rtol=1e-12)

    def test_norms_scale_diag(self):
        M = np.array([[1.0, -3.0], [0.0, 2.0]])
        coo = dense_to_coo(M)
        np.testing.assert_allclose(
            np.asarray(coo_row_norms(coo.row, coo.col, coo.val, 2, 1)),
            [4.0, 2.0])
        np.testing.assert_allclose(
            np.asarray(coo_col_norms(coo.row, coo.col, coo.val, 2, np.inf)),
            [1.0, 3.0])
        sv = coo_scale(coo.row, coo.col, coo.val,
                       jnp.array([2.0, 1.0]), jnp.array([1.0, 0.5]))
        np.testing.assert_allclose(
            coo_to_dense(COO(2, 2, coo.row, coo.col, np.asarray(sv))),
            np.diag([2.0, 1.0]) @ M @ np.diag([1.0, 0.5]))
        np.testing.assert_allclose(
            np.asarray(coo_extract_diagonal(coo.row, coo.col, coo.val, 2)),
            [1.0, 2.0])


class TestULS:
    def test_factorize_solve(self):
        r = np.random.default_rng(0)
        A = r.normal(size=(8, 8)) + 8 * np.eye(8)
        b = r.normal(size=8)
        f = uls_factorize(jnp.asarray(A))
        x = uls_solve(f, jnp.asarray(b), A=jnp.asarray(A))
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A, b),
                                   rtol=1e-10)

    def test_transpose_solve(self):
        r = np.random.default_rng(1)
        A = r.normal(size=(6, 6)) + 6 * np.eye(6)
        b = r.normal(size=6)
        f = uls_factorize(jnp.asarray(A))
        x = uls_solve(f, jnp.asarray(b), A=jnp.asarray(A), trans=True)
        np.testing.assert_allclose(np.asarray(x), np.linalg.solve(A.T, b),
                                   rtol=1e-10)

    def test_enquire_rank(self):
        A = np.diag([1.0, 2.0, 0.0])
        f = uls_factorize(jnp.asarray(A))
        rank, umin, umax = uls_enquire(f)
        assert int(rank) == 2

    def test_batched(self):
        r = np.random.default_rng(2)
        A = r.normal(size=(4, 5, 5)) + 5 * np.eye(5)
        b = r.normal(size=(4, 5))
        f = jax.vmap(uls_factorize)(jnp.asarray(A))
        x = jax.vmap(lambda fi, bi: uls_solve(fi, bi))(f, jnp.asarray(b))
        np.testing.assert_allclose(
            np.asarray(x), np.linalg.solve(A, b[..., None])[..., 0],
            rtol=1e-8)

    def test_find_basis(self):
        r = np.random.default_rng(3)
        B = r.normal(size=(3, 3))
        A = np.concatenate([B, B @ np.array([[1.], [2.], [3.]]),
                            r.normal(size=(3, 2))], axis=1)
        basic, nonbasic, rank = uls_find_basis(A)
        assert rank == 3
        assert np.linalg.matrix_rank(A[:, basic]) == 3
        assert len(nonbasic) == 3
