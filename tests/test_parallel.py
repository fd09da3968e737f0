"""Multi-device scale-out tests on the 8-device host-platform mesh
(conftest sets xla_force_host_platform_device_count=8).

The reference has no distributed backend (SURVEY §5.8); these tests pin
the new capability: batch-sharded solves agree with single-device
solves, and model-sharded KKT iterations compile + execute.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from galahad_tpu.parallel import batch_ipm_solve, make_mesh, model_sharded_step
from galahad_tpu.qp.ipm import IPMControl, ipm_solve

from test_ipm import random_convex_qp


@pytest.fixture(scope="module")
def stacked_qps():
    n, m, batch = 6, 3, 8
    qps = [random_convex_qp(n, m, 200 + s) for s in range(batch)]
    cols = (
        jnp.stack([q.H for q in qps]),
        jnp.stack([q.g for q in qps]),
        jnp.stack([q.A for q in qps]),
        jnp.stack([q.c_l for q in qps]),
        jnp.stack([q.c_u for q in qps]),
        jnp.stack([q.x_l for q in qps]),
        jnp.stack([q.x_u for q in qps]),
    )
    return qps, cols


def test_mesh_shapes():
    mesh = make_mesh(8, batch=4)
    assert mesh.shape == {"batch": 4, "model": 2}


def test_batch_sharded_matches_single(stacked_qps):
    qps, cols = stacked_qps
    mesh = make_mesh(8, batch=8)
    xs, ys, zs, st = batch_ipm_solve(*cols, ctl=IPMControl(maxit=60), mesh=mesh)
    assert bool(jnp.all(st.converged))
    for i, qp in enumerate(qps):
        x_ref, _, _, _ = ipm_solve(qp)
        np.testing.assert_allclose(np.asarray(xs[i]), np.asarray(x_ref),
                                   atol=1e-5)


def test_model_sharded_step_executes():
    mesh = make_mesh(8, batch=1)
    n, m = 32, 16
    r = np.random.default_rng(5)
    B = r.normal(size=(n, n))
    H = jnp.asarray(B @ B.T + np.eye(n))
    A = jnp.asarray(r.normal(size=(m, n)))
    x_feas = r.uniform(0.2, 0.8, size=n)
    c_at = np.asarray(A) @ x_feas
    args = (H, jnp.asarray(r.normal(size=n)), A,
            jnp.asarray(c_at - 1.0), jnp.asarray(c_at + 1.0),
            jnp.zeros(n), jnp.ones(n))
    st = model_sharded_step(args, mesh)
    assert st.x.shape == (n,)
    assert np.isfinite(float(st.res_d))


def test_graft_entry_single_and_multichip():
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "graft_entry", "/root/repo/__graft_entry__.py"
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    mod.dryrun_multichip(8)


class TestBlockAngularSchur:
    """Distributed Schur-complement reduction (VERDICT r1 item 8;
    SURVEY §5.8 point ii): per-device local factors + ONE psum for the
    coupling block, semantics matching the monolithic dense solve."""

    def _problem(self, K=8, n=12, m=5, seed=0):
        rng = np.random.default_rng(seed)
        Bs = rng.normal(size=(K, n, n))
        G = jnp.asarray(Bs @ np.swapaxes(Bs, -1, -2) + 4 * np.eye(n))
        A = jnp.asarray(rng.normal(size=(K, m, n)))
        b = jnp.asarray(rng.normal(size=(K, n)))
        Cb = rng.normal(size=(m, m))
        C = jnp.asarray(Cb @ Cb.T + np.eye(m))
        d = jnp.asarray(rng.normal(size=m))
        return G, A, b, C, d

    def test_matches_monolithic(self):
        from galahad_tpu.parallel import (
            block_angular_residual, block_angular_solve, make_mesh,
        )

        G, A, b, C, d = self._problem()
        mesh = make_mesh(8, batch=8)
        x, y = block_angular_solve(mesh, G, A, b, C, d)
        res = float(block_angular_residual(G, A, b, C, d, x, y))
        assert res < 1e-9
        # monolithic dense check
        K, n = G.shape[0], G.shape[1]
        m = C.shape[0]
        M = np.zeros((K * n + m, K * n + m))
        rhs = np.zeros(K * n + m)
        for k in range(K):
            M[k*n:(k+1)*n, k*n:(k+1)*n] = np.asarray(G[k])
            M[k*n:(k+1)*n, K*n:] = np.asarray(A[k]).T
            M[K*n:, k*n:(k+1)*n] = np.asarray(A[k])
            rhs[k*n:(k+1)*n] = np.asarray(b[k])
        M[K*n:, K*n:] = -np.asarray(C)
        rhs[K*n:] = np.asarray(d)
        sol = np.linalg.solve(M, rhs)
        np.testing.assert_allclose(np.asarray(x).reshape(-1), sol[:K*n],
                                   atol=1e-8)
        np.testing.assert_allclose(np.asarray(y), sol[K*n:], atol=1e-8)

    def test_multiblock_per_device(self):
        """More scenario blocks than devices: local vmap + one psum."""
        from galahad_tpu.parallel import (
            block_angular_residual, block_angular_solve, make_mesh,
        )

        G, A, b, C, d = self._problem(K=16, n=6, m=3, seed=2)
        mesh = make_mesh(8, batch=8)
        x, y = block_angular_solve(mesh, G, A, b, C, d)
        assert float(block_angular_residual(G, A, b, C, d, x, y)) < 1e-9


def test_sharded_supernodal_kkt():
    """VERDICT r4 item 4: the SUPERNODAL factorization sharded over the
    mesh — D elimination-tree strips, local flat LDL^T per device inside
    shard_map, one psum for the separator Schur complement; semantics
    match the monolithic sparse solve."""
    import numpy as np

    from galahad_tpu.parallel.mesh import make_mesh
    from galahad_tpu.parallel.supernodal_mesh import (
        build_strip_grid_kkt,
        sharded_kkt_residual,
        sharded_kkt_solve,
    )

    D = 8
    plan, parts = build_strip_grid_kkt(D, 3, 8)
    mesh = make_mesh(D, batch=D)
    xs, xsep = sharded_kkt_solve(mesh, plan, parts["vals"], parts["B"],
                                 parts["Kss"], parts["b"], parts["bs"])
    res = sharded_kkt_residual(parts, xs, xsep)
    assert res < 1e-10, res
    # the sharded solution matches the monolithic reference solve
    x = np.concatenate([np.asarray(xs).ravel(), np.asarray(xsep)])
    ref = np.concatenate(
        [parts["x_ref"][I] for I in parts["interior"]]
        + [parts["x_ref"][parts["sep"]]])
    assert np.max(np.abs(x - ref)) < 1e-8
