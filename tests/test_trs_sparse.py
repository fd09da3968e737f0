"""Sparse TRS: factorize-per-lambda secular iteration with inertia
(reference src/trs/trs.f90:1942-2337, contract :4100, history :2575)."""
import numpy as np
import jax.numpy as jnp

from galahad_tpu.core.sparse import COOPattern, lower_triangle
from galahad_tpu.tr import (
    TRSSparseControl,
    trs_contract,
    trs_solve,
    trs_solve_sparse,
)


def _laplacian_2d(k):
    """k x k grid Laplacian (SPD after +0; indefinite if shifted)."""
    n = k * k
    rows, cols, vals = [], [], []
    for i in range(k):
        for j in range(k):
            p = i * k + j
            rows.append(p); cols.append(p); vals.append(4.0)
            if i + 1 < k:
                q = (i + 1) * k + j
                rows.append(max(p, q)); cols.append(min(p, q)); vals.append(-1.0)
            if j + 1 < k:
                q = i * k + j + 1
                rows.append(max(p, q)); cols.append(min(p, q)); vals.append(-1.0)
    return np.array(rows), np.array(cols), np.array(vals), n


def _dense_from(h_pat, h_vals, n):
    H = np.zeros((n, n))
    r, c, v = np.asarray(h_pat.rows), np.asarray(h_pat.cols), np.asarray(h_vals)
    np.add.at(H, (r, c), v)
    off = r != c
    np.add.at(H, (c[off], r[off]), v[off])
    return H


def test_sparse_trs_boundary_matches_dense():
    r, c, v, n = _laplacian_2d(8)
    rr, cc, vv = lower_triangle(r, c, v)
    pat = COOPattern(rr, cc, n, n)
    rng = np.random.default_rng(3)
    g = rng.standard_normal(n)
    radius = 0.5   # small: boundary active
    out = trs_solve_sparse(pat, vv, g, radius)
    dense = trs_solve(jnp.asarray(_dense_from(pat, vv, n)), jnp.asarray(g),
                      jnp.asarray(radius))
    assert abs(out.norm_x - radius) <= 1e-7 * radius
    np.testing.assert_allclose(out.obj, float(dense.obj), rtol=1e-8)
    np.testing.assert_allclose(out.multiplier, float(dense.multiplier),
                               rtol=1e-6, atol=1e-8)
    assert out.history_lambda.shape[0] == out.n_factorizations
    assert not out.hard_case and not out.interior


def test_sparse_trs_interior():
    r, c, v, n = _laplacian_2d(6)
    rr, cc, vv = lower_triangle(r, c, v)
    pat = COOPattern(rr, cc, n, n)
    g = 0.001 * np.ones(n)
    out = trs_solve_sparse(pat, vv, g, 100.0)
    assert out.interior
    assert out.multiplier == 0.0
    dense = trs_solve(jnp.asarray(_dense_from(pat, vv, n)), jnp.asarray(g),
                      jnp.asarray(100.0))
    np.testing.assert_allclose(out.obj, float(dense.obj), rtol=1e-10)


def test_sparse_trs_indefinite_and_mnorm():
    # H = Laplacian - 3 I is indefinite; boundary solution, lambda > 0
    r, c, v, n = _laplacian_2d(6)
    d = r == c
    v = v.astype(float); v[d] -= 3.0
    rr, cc, vv = lower_triangle(r, c, v)
    pat = COOPattern(rr, cc, n, n)
    rng = np.random.default_rng(5)
    g = rng.standard_normal(n)
    m = np.full(n, 2.0)
    out = trs_solve_sparse(pat, vv, g, 1.5, m_diag=m)
    dense = trs_solve(jnp.asarray(_dense_from(pat, vv, n)), jnp.asarray(g),
                      jnp.asarray(1.5), M=jnp.asarray(np.diag(m)))
    # ||x||_M = radius
    nm = float(np.sqrt((m * np.asarray(out.x) ** 2).sum()))
    assert abs(nm - 1.5) <= 2e-6
    np.testing.assert_allclose(out.obj, float(dense.obj), rtol=1e-6)


def test_sparse_trs_hard_case():
    # diagonal H with leftmost eigenvalue -1 on coord 0, c orthogonal to e0
    n = 16
    diag = np.linspace(-1.0, 3.0, n)
    rr = cc = np.arange(n)
    pat = COOPattern(rr, cc, n, n)
    g = np.zeros(n); g[3] = 0.01   # no component along e0
    out = trs_solve_sparse(pat, diag, g, 5.0)
    assert out.hard_case
    dense = trs_solve(jnp.asarray(np.diag(diag)), jnp.asarray(g),
                      jnp.asarray(5.0))
    assert abs(out.norm_x - 5.0) <= 1e-5 * 5
    np.testing.assert_allclose(out.obj, float(dense.obj), rtol=1e-5)


def test_trs_contract_warm_start():
    r, c, v, n = _laplacian_2d(8)
    rr, cc, vv = lower_triangle(r, c, v)
    pat = COOPattern(rr, cc, n, n)
    rng = np.random.default_rng(7)
    g = rng.standard_normal(n)
    first = trs_solve_sparse(pat, vv, g, 0.5)
    shrunk = trs_contract(pat, vv, g, 0.25, first)
    assert abs(shrunk.norm_x - 0.25) <= 1e-6 * 0.25
    assert shrunk.multiplier >= first.multiplier - 1e-10
    # warm start should not cost more factorizations than the cold solve
    cold = trs_solve_sparse(pat, vv, g, 0.25)
    assert shrunk.n_factorizations <= cold.n_factorizations
