"""Supernodal multifrontal factorization + native symbolic tests
(SSIDS-class sparse Cholesky)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from galahad_tpu.linalg import SLSControl, sls_factorize, sls_solve
from galahad_tpu.linalg.supernodal import (
    supernodal_analyse,
    supernodal_factorize,
    supernodal_solve,
)
from galahad_tpu.native import (
    amd_order,
    etree,
    nd_order,
    postorder,
    rcm_order,
    supernode_partition,
    tree_levels,
)


def grid_laplacian(k, shift=0.1):
    n = k * k
    G = sp.lil_matrix((n, n))
    for i in range(k):
        for j in range(k):
            u = i * k + j
            G[u, u] = 4.0 + shift
            for (a, b) in ((i + 1, j), (i, j + 1)):
                if a < k and b < k:
                    v = a * k + b
                    G[u, v] = G[v, u] = -1.0
    return G.tocsr()


def analyse_case(A_csr, order="amd", relax=4):
    """Symbolic analysis only (fill comparisons don't need the numeric
    factorization, which costs minutes of XLA compile on the inline
    path)."""
    n = A_csr.shape[0]
    Al = sp.tril(A_csr).tocoo()
    return supernodal_analyse(Al.row, Al.col, n, order=order,
                              relax_cols=relax)


def solve_case(A_csr, order="amd", relax=4):
    n = A_csr.shape[0]
    Al = sp.tril(A_csr).tocoo()
    sym = supernodal_analyse(Al.row, Al.col, n, order=order,
                             relax_cols=relax)
    fac = supernodal_factorize(sym, jnp.asarray(Al.data))
    b = np.random.default_rng(1).normal(size=n)
    x = supernodal_solve(sym, fac, jnp.asarray(b))
    r = np.linalg.norm(A_csr @ np.asarray(x) - b) / np.linalg.norm(b)
    return r, sym, (Al, fac, b)


class TestNativeSymbolic:
    def test_permutations_valid(self):
        A = grid_laplacian(5)
        for fn in (amd_order, rcm_order, nd_order):
            p = fn(A.indptr, A.indices)
            assert sorted(p.tolist()) == list(range(25))

    def test_amd_reduces_fill_vs_natural(self):
        A = grid_laplacian(8)
        sym_amd = analyse_case(A, "amd", relax=0)
        sym_nat = analyse_case(A, "natural", relax=0)
        assert sym_amd.nnz_L < sym_nat.nnz_L

    def test_nd_competitive_on_grid(self):
        """Nested dissection is the asymptotically right ordering for
        2-D grids (the METIS role, reference SSIDS analyse); on an
        18x18 grid it must beat natural ordering and be within 1.5x
        of AMD (it usually wins outright)."""
        A = grid_laplacian(18)
        sym_nd = analyse_case(A, "nd", relax=0)
        sym_amd = analyse_case(A, "amd", relax=0)
        sym_nat = analyse_case(A, "natural", relax=0)
        assert sym_nd.nnz_L < sym_nat.nnz_L
        assert sym_nd.nnz_L < 1.5 * sym_amd.nnz_L

    def test_best_picks_min_fill(self):
        A = grid_laplacian(10)
        sym_best = analyse_case(A, "best", relax=0)
        sym_amd = analyse_case(A, "amd", relax=0)
        sym_nd = analyse_case(A, "nd", relax=0)
        assert sym_best.nnz_L <= min(sym_amd.nnz_L, sym_nd.nnz_L)

    def test_nd_disconnected_graph(self):
        blocks = [grid_laplacian(4), grid_laplacian(5), grid_laplacian(3)]
        A = sp.block_diag(blocks).tocsr()
        p = nd_order(A.indptr, A.indices, leaf_size=8)
        assert sorted(p.tolist()) == list(range(A.shape[0]))

    def test_etree_chain(self):
        n = 6
        T = sp.csr_matrix(np.eye(n) + np.diag(np.ones(n - 1), 1)
                          + np.diag(np.ones(n - 1), -1))
        par = etree(T.indptr, T.indices)
        assert all(par[i] == i + 1 for i in range(n - 1))
        assert par[n - 1] == -1
        assert postorder(par).tolist() == list(range(n))

    def test_supernode_no_overmerge_chain(self):
        """relax=0 must NOT merge interior tridiagonal-chain columns
        (structs not nested); only the final pair is fundamental."""
        n = 6
        par = np.array([1, 2, 3, 4, 5, -1], np.int32)
        cc = np.array([2, 2, 2, 2, 2, 1], np.int32)
        sn, ns = supernode_partition(par, cc, relax_cols=0)
        assert ns == n - 1
        assert sn[4] == sn[5]

    def test_tree_levels(self):
        # two leaves -> one root
        sparent = np.array([2, 2, -1], np.int32)
        lev, nl = tree_levels(sparent)
        assert lev.tolist() == [0, 0, 1]
        assert nl == 2


class TestSupernodalNumeric:
    @pytest.mark.parametrize("order", ["amd", "rcm", "natural", "nd"])
    def test_grid(self, order):
        r, sym, _ = solve_case(grid_laplacian(6), order)
        assert r < 1e-12

    def test_tridiagonal(self):
        n = 30
        A = sp.csr_matrix(np.diag(np.full(n, 4.0))
                          + np.diag(np.full(n - 1, -1.0), 1)
                          + np.diag(np.full(n - 1, -1.0), -1))
        r, sym, _ = solve_case(A, "natural", relax=0)
        assert r < 1e-12

    def test_random_spd(self):
        m = sp.random(25, 25, density=0.15, random_state=7)
        A = sp.csr_matrix((m @ m.T).toarray() + 5 * np.eye(25))
        r, _, _ = solve_case(A, "amd")
        assert r < 1e-12

    def test_disconnected_components(self):
        A1 = grid_laplacian(3).toarray()
        A = sp.csr_matrix(np.block([
            [A1, np.zeros((9, 9))],
            [np.zeros((9, 9)), 2 * A1],
        ]))
        r, _, _ = solve_case(A, "amd")
        assert r < 1e-12

    def test_jit_factor_solve(self):
        """Numeric phase compiles into one program; re-execution with
        new values does not re-run symbolic analysis."""
        A = grid_laplacian(5)
        Al = sp.tril(A).tocoo()
        sym = supernodal_analyse(Al.row, Al.col, A.shape[0])

        @jax.jit
        def solve(vals, b):
            fac = supernodal_factorize(sym, vals)
            return supernodal_solve(sym, fac, b)

        b = np.random.default_rng(3).normal(size=A.shape[0])
        x1 = solve(jnp.asarray(Al.data), jnp.asarray(b))
        x2 = solve(jnp.asarray(2.0 * Al.data), jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(x2), np.asarray(x1) / 2.0,
                                   atol=1e-12)

    def test_shift_regularization(self):
        """Singular matrix + shift solves the shifted system."""
        n = 10
        A = sp.csr_matrix(np.diag(np.arange(n, dtype=float)))  # singular
        Al = sp.tril(A).tocoo()
        sym = supernodal_analyse(Al.row, Al.col, n, order="natural")
        fac = supernodal_factorize(sym, jnp.asarray(Al.data), shift=1.0)
        b = np.ones(n)
        x = supernodal_solve(sym, fac, jnp.asarray(b))
        np.testing.assert_allclose(np.asarray(x),
                                   1.0 / (np.arange(n) + 1.0), atol=1e-12)

    def test_sls_facade(self):
        A = grid_laplacian(5)
        Al = sp.tril(A).tocoo()
        sym = supernodal_analyse(Al.row, Al.col, A.shape[0])
        f = sls_factorize((sym, jnp.asarray(Al.data)),
                          SLSControl(solver="supernodal"))
        b = np.random.default_rng(5).normal(size=A.shape[0])
        x = sls_solve(f, jnp.asarray(b))
        assert np.linalg.norm(A @ np.asarray(x) - b) < 1e-10


class TestIndefiniteLDLT:
    """Quasi-definite LDL^T + inertia (SLS_enquire role; VERDICT round-1
    item 2: reference src/ssids/ldlt_app.cxx:40, src/trs/trs.f90:2260)."""

    def _kkt(self, n=40, m=15, delta=1e-2):
        rng = np.random.default_rng(0)
        G = sp.random(n, n, density=0.12, random_state=1)
        G = (G @ G.T).tocsr() + sp.eye(n) * 2.0
        A = sp.random(m, n, density=0.2, random_state=2).tocsr()
        return sp.bmat([[G, A.T], [A, -delta * sp.eye(m)]]).tocsr(), n, m

    def test_quasi_definite_inertia_and_solve(self):
        K, n, m = self._kkt()
        Kl = sp.tril(K).tocoo()
        sym = supernodal_analyse(Kl.row, Kl.col, n + m, order="amd")
        fac = supernodal_factorize(sym, jnp.asarray(Kl.data))
        assert np.asarray(fac.inertia).tolist() == [n, m, 0]
        assert float(fac.dmin) > 0
        b = np.random.default_rng(3).normal(size=n + m)
        x = supernodal_solve(sym, fac, jnp.asarray(b))
        r = np.linalg.norm(K @ np.asarray(x) - b) / np.linalg.norm(b)
        assert r < 1e-10

    def test_signed_shift_vector(self):
        """(n,)-vector shift = signed quasi-definite regularization
        (+rho on primal block, -delta on dual block)."""
        K, n, m = self._kkt(delta=0.0)      # singular (2,2) block
        Kl = sp.tril(K).tocoo()
        sym = supernodal_analyse(Kl.row, Kl.col, n + m, order="amd")
        shift = np.concatenate([np.full(n, 0.5), np.full(m, -0.5)])
        fac = supernodal_factorize(sym, jnp.asarray(Kl.data),
                                   shift=jnp.asarray(shift))
        assert np.asarray(fac.inertia).tolist() == [n, m, 0]
        b = np.random.default_rng(4).normal(size=n + m)
        x = supernodal_solve(sym, fac, jnp.asarray(b))
        Ks = K + sp.diags(shift)
        r = np.linalg.norm(Ks @ np.asarray(x) - b) / np.linalg.norm(b)
        assert r < 1e-10

    def test_indefinite_dense_vs_eigh(self):
        """General (not quasi-definite) symmetric matrix with a benign
        ordering still factors; inertia matches the eigenvalue count."""
        rng = np.random.default_rng(7)
        n = 12
        B = rng.normal(size=(n, n))
        M = (B + B.T) / 2 + np.diag(10.0 * np.sign(rng.normal(size=n)))
        Ml = sp.tril(sp.csr_matrix(M)).tocoo()
        sym = supernodal_analyse(Ml.row, Ml.col, n, order="natural")
        fac = supernodal_factorize(sym, jnp.asarray(Ml.data))
        lam = np.linalg.eigvalsh(M)
        expect = [int((lam > 0).sum()), int((lam < 0).sum()), 0]
        assert np.asarray(fac.inertia).tolist() == expect
        b = rng.normal(size=n)
        x = supernodal_solve(sym, fac, jnp.asarray(b))
        assert np.linalg.norm(M @ np.asarray(x) - b) < 1e-9


class TestPallasKernel:
    """VMEM-resident partial-LDL^T kernel (interpret mode on CPU):
    matches the XLA blocked path on eliminated columns and the
    trailing Schur square (SURVEY §2.6 native checklist 1-2)."""

    def test_matches_xla_path(self):
        import jax
        from galahad_tpu.linalg.pallas_kernels import partial_ldlt_pallas
        from galahad_tpu.linalg.supernodal import _blocked_partial_ldlt

        rng = np.random.default_rng(0)
        nb, Fpad, cmax, B = 5, 24, 12, 8
        F0 = np.zeros((nb, Fpad, Fpad))
        ncols = rng.integers(1, cmax + 1, nb).astype(np.int32)
        for k in range(nb):
            nr = int(min(Fpad, ncols[k] + 4))
            Bk = rng.normal(size=(nr, nr))
            F0[k, :nr, :nr] = Bk @ Bk.T + 8 * np.eye(nr)
        F0 = jnp.asarray(F0, jnp.float32)
        ref = _blocked_partial_ldlt(F0, jnp.asarray(ncols), cmax, B)
        out = partial_ldlt_pallas(F0, jnp.asarray(ncols), cmax,
                                  interpret=True)
        for k in range(nb):
            nc = int(ncols[k])
            r = np.asarray(ref[k])
            o = np.asarray(out[k])
            low = np.tril(np.ones((Fpad, Fpad), bool))[:, :nc]
            assert np.abs((r[:, :nc] - o[:, :nc])[low]).max() < 1e-4
            assert np.abs(r[nc:, nc:] - o[nc:, nc:]).max() < 1e-4
