"""Host-side row partitioning of saddle-point blocks across a device mesh.

The scaling dimension of this domain is matrix rows/nnz (SURVEY.md §5): the
blocks A (n x n), B (m x n), B' (n x m), C (m x m) are 1-D row-partitioned
across the mesh axis, the paired vectors (n-part, m-part) are sharded the
same way, and scalar recurrence state is replicated.  Device-side layout is
ELL with *global* column indices, stacked with a leading device axis so
``shard_map`` hands each device its own row block.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp


def _register(cls, data_fields, meta_fields):
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )


@partial(_register,
         data_fields=("a_data", "a_cols", "b_data", "b_cols", "bt_data",
                      "bt_cols", "c_data", "c_cols"),
         meta_fields=("n", "m", "n_loc", "m_loc", "ndev"))
@dataclasses.dataclass(frozen=True)
class PartitionedBlocks:
    """Row blocks of (A, B, B', C), stacked over devices.

    Shapes: ``a_*`` (ndev, n_loc, Ka); ``b_*`` (ndev, m_loc, Kb);
    ``bt_*`` (ndev, n_loc, Kbt); ``c_*`` (ndev, m_loc, Kc).
    Row counts are padded so n_loc * ndev >= n (padding rows are all-zero).
    """

    a_data: jax.Array
    a_cols: jax.Array
    b_data: jax.Array
    b_cols: jax.Array
    bt_data: jax.Array
    bt_cols: jax.Array
    c_data: jax.Array
    c_cols: jax.Array
    n: int
    m: int
    n_loc: int
    m_loc: int
    ndev: int


def _ell_offsets(indptr: np.ndarray) -> np.ndarray:
    """Within-row position of every entry (vectorized cumcount, O(nnz))."""
    counts = np.diff(indptr)
    nnz = int(indptr[-1])
    return np.arange(nnz) - np.repeat(indptr[:-1], counts)


def _ell_rows(mat: sp.csr_matrix, r0: int, r1: int, k: int, dtype):
    """ELL block of rows [r0, r1) with global column ids, padded to width k."""
    blk = mat[r0:r1]
    rows = r1 - r0
    data = np.zeros((rows, k), dtype=dtype)
    cols = np.zeros((rows, k), dtype=np.int32)
    if blk.nnz:
        offs = _ell_offsets(blk.indptr)
        rr = np.repeat(np.arange(rows), np.diff(blk.indptr))
        data[rr, offs] = blk.data
        cols[rr, offs] = blk.indices
    return data, cols


def _stack_blocks(mat: sp.csr_matrix, ndev: int, rows_loc: int, dtype):
    """Stacked (ndev, rows_loc, k) ELL — one vectorized O(nnz) scatter."""
    mat = sp.csr_matrix(mat)
    mat.sum_duplicates()
    k = max(1, int(np.diff(mat.indptr).max()) if mat.nnz else 1)
    data = np.zeros((ndev, rows_loc, k), dtype=dtype)
    cols = np.zeros((ndev, rows_loc, k), dtype=np.int32)
    if mat.nnz:
        offs = _ell_offsets(mat.indptr)
        rr = np.repeat(np.arange(mat.shape[0]), np.diff(mat.indptr))
        data[rr // rows_loc, rr % rows_loc, offs] = mat.data
        cols[rr // rows_loc, rr % rows_loc, offs] = mat.indices
    return jnp.asarray(data), jnp.asarray(cols)


def partition_blocks(A, B, C, ndev: int, dtype=np.float64) -> PartitionedBlocks:
    """Row-partition A, B, B', C over ``ndev`` shards."""
    A = sp.csr_matrix(A)
    B = sp.csr_matrix(B)
    C = sp.csr_matrix(C)
    n = A.shape[0]
    m = C.shape[0]
    n_loc = -(-n // ndev)
    m_loc = -(-m // ndev)

    a_data, a_cols = _stack_blocks(A, ndev, n_loc, dtype)
    b_data, b_cols = _stack_blocks(B, ndev, m_loc, dtype)
    bt_data, bt_cols = _stack_blocks(B.T.tocsr(), ndev, n_loc, dtype)
    c_data, c_cols = _stack_blocks(C, ndev, m_loc, dtype)
    return PartitionedBlocks(
        a_data=a_data, a_cols=a_cols, b_data=b_data, b_cols=b_cols,
        bt_data=bt_data, bt_cols=bt_cols, c_data=c_data, c_cols=c_cols,
        n=int(n), m=int(m), n_loc=int(n_loc), m_loc=int(m_loc),
        ndev=int(ndev),
    )


def shard_vector(v: np.ndarray, ndev: int, loc: int) -> jax.Array:
    """Pad a host vector to (ndev, loc) shard layout."""
    out = np.zeros((ndev, loc), dtype=v.dtype)
    flat = out.reshape(-1)
    flat[: v.shape[0]] = v
    return jnp.asarray(out)


def unshard_vector(v: jax.Array, size: int) -> jax.Array:
    return v.reshape(-1)[:size]
