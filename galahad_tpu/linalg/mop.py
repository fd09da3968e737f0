"""Device-side sparse matrix-vector operations over static COO metadata.

TPU-native re-design of GALAHAD's MOP package (reference
src/mop/mop.f90: mop_Ax :40, row norms / scaling helpers).  The
reference loops over SMT entries on the host; here the index arrays are
static trace-time constants and the arithmetic is one gather +
segment-sum per product — XLA fuses these into a single pass, and the
whole op vmaps over batches of value arrays sharing a sparsity pattern.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def coo_Ax(row, col, val, x, m: int, symmetric: bool = False):
    """y = A x from coordinate data. ``row``/``col`` are static numpy
    index arrays; ``val``/``x`` may be traced. With ``symmetric``, the
    (row,col,val) triples describe the lower triangle of a symmetric A
    (the reference's symmetric SMT convention)."""
    val = jnp.asarray(val)
    x = jnp.asarray(x)
    y = jax.ops.segment_sum(val * x[col], row, num_segments=m)
    if symmetric:
        off = row != col
        y = y + jax.ops.segment_sum(
            jnp.where(off, val, 0.0) * x[row], col, num_segments=m)
    return y


def coo_Aty(row, col, val, y, n: int):
    """x = A' y."""
    val = jnp.asarray(val)
    y = jnp.asarray(y)
    return jax.ops.segment_sum(val * y[row], col, num_segments=n)


def coo_row_norms(row, col, val, m: int, ord: float = jnp.inf):
    """Row norms of A (mop.f90 row-norm helpers used by scalings)."""
    val = jnp.asarray(val)
    if ord == jnp.inf:
        return jax.ops.segment_max(jnp.abs(val), row, num_segments=m)
    if ord == 1:
        return jax.ops.segment_sum(jnp.abs(val), row, num_segments=m)
    if ord == 2:
        return jnp.sqrt(jax.ops.segment_sum(val * val, row, num_segments=m))
    raise ValueError("ord must be 1, 2 or inf")


def coo_col_norms(row, col, val, n: int, ord: float = jnp.inf):
    return coo_row_norms(col, row, val, n, ord)


def coo_scale(row, col, val, r_scale, c_scale):
    """Values of diag(r) A diag(c) (scaling application)."""
    return jnp.asarray(val) * r_scale[row] * c_scale[col]


def coo_extract_diagonal(row, col, val, n: int):
    d = row == col
    return jax.ops.segment_sum(
        jnp.where(d, jnp.asarray(val), 0.0), row, num_segments=n)
