"""Sparse matrix-vector products (XLA reference implementations).

These are the jnp fallbacks used on CPU and inside tests; the hot TPU path is
the Pallas kernel in ``ops/pallas_spmv.py``.  They replace the implicit native
SpMV of the MATLAB reference (every ``A*v`` / ``C*q`` / ``B'*y``, e.g.
/root/reference/kernels/cpminres.m:187-188).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from .formats import CSR, ELL, Diagonal


def csr_matvec(mat: CSR, x: jax.Array) -> jax.Array:
    """y = mat @ x via gather + segment_sum (row-sorted COO)."""
    vals = mat.data * jnp.take(x, mat.indices, mode="clip")
    return jax.ops.segment_sum(
        vals, mat.row_ids, num_segments=mat.shape[0], indices_are_sorted=True
    )


def csr_rmatvec(mat: CSR, y: jax.Array) -> jax.Array:
    """x = mat.T @ y via scatter-add over column indices (unsorted)."""
    vals = mat.data * jnp.take(y, mat.row_ids, mode="clip")
    return jax.ops.segment_sum(vals, mat.indices, num_segments=mat.shape[1])


def ell_matvec(mat: ELL, x: jax.Array) -> jax.Array:
    """y = mat @ x; fully vectorised over the padded (rows, K) layout."""
    gathered = jnp.take(x, mat.cols, mode="clip")
    y = (mat.data * gathered).sum(axis=1)
    return y[: mat.shape[0]]


def diag_matvec(mat: Diagonal, x: jax.Array) -> jax.Array:
    return mat.diag * x


def matvec(mat, x: jax.Array) -> jax.Array:
    if isinstance(mat, CSR):
        return csr_matvec(mat, x)
    if isinstance(mat, ELL):
        return ell_matvec(mat, x)
    if isinstance(mat, Diagonal):
        return diag_matvec(mat, x)
    if isinstance(mat, jax.Array) or hasattr(mat, "ndim"):
        return jnp.asarray(mat) @ x
    raise TypeError(f"unsupported matrix type {type(mat)}")
