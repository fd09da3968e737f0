"""Device-mesh scale-out for batched optimization.

The reference has NO distributed backend (SURVEY §5.8: OpenMP + single
GPU only, no MPI/NCCL anywhere); multi-chip execution is new capability
in this framework, built the TPU way: a `jax.sharding.Mesh`, data layed
out with NamedSharding, XLA inserting collectives over ICI.

Two scaling axes (SURVEY §5.7):
  * ``batch``  — independent subproblems (scenario QPs, per-iteration
    TRS instances) sharded embarrassingly; zero communication.
  * ``model``  — within-problem sharding of the dense KKT operators for
    problems too large for one chip's HBM; XLA partitions the matmuls
    and Cholesky via its SPMD partitioner (all_gather / reduce_scatter
    over ICI).

These compose in a 2-D mesh ("batch", "model").
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, batch: int | None = None,
              axis_names=("batch", "model")) -> Mesh:
    """Build a 2-D (batch, model) mesh over the available devices.

    ``batch`` fixes the size of the batch axis (must divide n_devices);
    default uses all devices on the batch axis (model = 1).
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    devs = devs[:n_devices]
    if batch is None:
        batch = n_devices
    if n_devices % batch:
        raise ValueError(f"batch axis {batch} must divide {n_devices} devices")
    arr = np.array(devs).reshape(batch, n_devices // batch)
    return Mesh(arr, axis_names)


def shard_batch(tree, mesh: Mesh, axis: str = "batch"):
    """Place a stacked pytree of problems with the leading (batch) dim
    sharded over ``axis`` and everything else replicated."""

    def put(x):
        x = jnp.asarray(x)
        spec = P(axis, *([None] * (x.ndim - 1))) if x.ndim > 0 else P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def batch_ipm_solve(Hs, gs, As, c_ls, c_us, x_ls, x_us, ctl=None,
                    mesh: Mesh | None = None, h_kind: str = "dense"):
    """Solve a stacked batch of same-shape QPs, sharded over the mesh's
    batch axis when a mesh is given.  Returns (xs, ys, zs, states).

    This is the headline scale-out path: each device runs its shard of
    the batch through the fully-compiled IPM (lax.while_loop) with no
    inter-device communication — linear scaling by construction,
    validated by tests/test_parallel.py on a host-platform mesh.
    """
    from ..core.problem import QP
    from ..qp.ipm import IPMControl, ipm_solve_compiled

    ctl = ctl or IPMControl()

    def solve_one(H, g, A, c_l, c_u, x_l, x_u):
        qp = QP(H=H, g=g, A=A, c_l=c_l, c_u=c_u, x_l=x_l, x_u=x_u,
                h_kind=h_kind)
        return ipm_solve_compiled(qp, ctl)

    args = (Hs, gs, As, c_ls, c_us, x_ls, x_us)
    if mesh is not None:
        args = shard_batch(args, mesh)
    return jax.jit(jax.vmap(solve_one))(*args)


def model_sharded_step(qp_arrays, mesh: Mesh, ctl=None):
    """One IPM iteration with the *problem itself* sharded over the
    "model" axis (rows of H and A split across devices) — the
    tensor-parallel analogue for problems larger than one chip.

    Used by the multi-chip dry run; XLA partitions the KKT matmuls and
    the Schur-complement Cholesky, inserting ICI collectives.
    """
    from ..core.problem import QP, classify_bounds
    from ..qp.ipm import IPMControl, ipm_init, ipm_step

    ctl = ctl or IPMControl()
    H, g, A, c_l, c_u, x_l, x_u = qp_arrays

    shardings = dict(
        H=NamedSharding(mesh, P("model", None)),
        g=NamedSharding(mesh, P(None)),
        A=NamedSharding(mesh, P(None, "model")),
        c_l=NamedSharding(mesh, P(None)),
        c_u=NamedSharding(mesh, P(None)),
        x_l=NamedSharding(mesh, P(None)),
        x_u=NamedSharding(mesh, P(None)),
    )
    H = jax.device_put(H, shardings["H"])
    A = jax.device_put(A, shardings["A"])
    g, c_l, c_u, x_l, x_u = (
        jax.device_put(v, NamedSharding(mesh, P(None)))
        for v in (g, c_l, c_u, x_l, x_u)
    )
    qp = QP(H=H, g=g, A=A, c_l=c_l, c_u=c_u, x_l=x_l, x_u=x_u)
    masks = classify_bounds(qp, ctl.infinity)
    st0 = ipm_init(qp, masks, ctl)

    @jax.jit
    def step(st):
        return ipm_step(qp, masks, st, ctl)

    return step(st0)
