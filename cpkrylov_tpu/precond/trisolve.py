"""Sparse triangular solves on TPU via blocked forward substitution.

This replaces the sparse triangular solves hidden inside the reference's
``op.LDL`` operator composition (/root/reference/ops/opLDL2.m:86, applied at
opLDL2.m:165-167).  Triangular solves are inherently sequential; the
TPU-native formulation here blocks the factor into ``panel``-row panels,
inverts each diagonal panel densely on the host once at setup, and then runs

    x[blk] = inv_diag[blk] @ (b[blk] - L_off[blk, :] @ x)

as a ``fori_loop`` of ``n/panel`` steps.  Each step is an ELL gather (VPU)
plus a (panel, panel) dense matvec (MXU) — compiler-friendly static shapes,
sequential depth n/panel instead of the nnz-chain depth of level scheduling.

An upper-triangular solve is the same kernel on the index-reversed matrix
(J U J is lower triangular for the reversal J), so only one device routine
exists; the reversal is folded into the host-side permutations.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _register(cls, data_fields, meta_fields):
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )


@partial(_register,
         data_fields=("inv_diag", "off_data", "off_cols"),
         meta_fields=("n", "panel"))
@dataclasses.dataclass(frozen=True)
class BlockTriFactor:
    """Lower-triangular factor prepared for blocked substitution."""

    inv_diag: jax.Array  # (nblocks, panel, panel) dense inverses
    off_data: jax.Array  # (n_pad, K) entries strictly left of the block
    off_cols: jax.Array  # (n_pad, K) int32
    n: int
    panel: int

    @property
    def nblocks(self) -> int:
        return self.inv_diag.shape[0]


def build_block_tri(T, panel: int = 256, dtype=None) -> BlockTriFactor:
    """Prepare a scipy lower-triangular matrix (diagonal included).

    ``T`` must be lower triangular with an explicit (nonzero) diagonal; pass
    ``L + I`` for unit-diagonal factors stored strictly-lower.
    """
    import scipy.sparse as sp
    import scipy.linalg as sla

    T = sp.csr_matrix(T)
    n = T.shape[0]
    dtype = dtype or T.dtype
    nblocks = max(1, -(-n // panel))
    n_pad = nblocks * panel

    inv_diag = np.zeros((nblocks, panel, panel), dtype=dtype)
    indptr = T.indptr
    indices = T.indices
    data = T.data

    # Split entries into diagonal-panel vs off-panel per row.
    off_rows = [None] * n
    diag_dense = np.zeros((panel, panel), dtype=np.float64)
    max_off = 1
    for blk in range(nblocks):
        r0 = blk * panel
        r1 = min(r0 + panel, n)
        diag_dense[:] = 0.0
        np.fill_diagonal(diag_dense, 1.0)  # padding rows solve to identity
        for i in range(r0, r1):
            cols = indices[indptr[i]:indptr[i + 1]]
            vals = data[indptr[i]:indptr[i + 1]]
            in_blk = cols >= r0
            diag_dense[i - r0, cols[in_blk] - r0] = vals[in_blk]
            off = (~in_blk).nonzero()[0]
            off_rows[i] = (cols[off], vals[off])
            max_off = max(max_off, off.size)
        inv_diag[blk] = sla.solve_triangular(
            diag_dense, np.eye(panel), lower=True
        ).astype(dtype)

    off_data = np.zeros((n_pad, max_off), dtype=dtype)
    off_cols = np.zeros((n_pad, max_off), dtype=np.int32)
    for i in range(n):
        cols, vals = off_rows[i]
        off_data[i, : vals.size] = vals
        off_cols[i, : cols.size] = cols

    return BlockTriFactor(
        inv_diag=jnp.asarray(inv_diag),
        off_data=jnp.asarray(off_data),
        off_cols=jnp.asarray(off_cols),
        n=int(n),
        panel=int(panel),
    )


def block_tri_solve(tf: BlockTriFactor, b: jax.Array) -> jax.Array:
    """Solve T x = b for the prepared lower-triangular factor."""
    panel = tf.panel
    n_pad = tf.nblocks * panel
    x0 = jnp.zeros(n_pad, dtype=b.dtype)
    b_pad = x0.at[: tf.n].set(b)

    def body(i, x):
        r0 = i * panel
        od = jax.lax.dynamic_slice_in_dim(tf.off_data, r0, panel, axis=0)
        oc = jax.lax.dynamic_slice_in_dim(tf.off_cols, r0, panel, axis=0)
        gathered = jnp.take(x, oc, mode="clip")
        contrib = (od.astype(b.dtype) * gathered).sum(axis=1)
        rhs = jax.lax.dynamic_slice_in_dim(b_pad, r0, panel) - contrib
        inv = jax.lax.dynamic_index_in_dim(tf.inv_diag, i, keepdims=False)
        xb = inv.astype(b.dtype) @ rhs
        return jax.lax.dynamic_update_slice_in_dim(x, xb, r0, axis=0)

    x = jax.lax.fori_loop(0, tf.nblocks, body, x0)
    return x[: tf.n]


def build_block_tri_upper(U, panel: int = 256, dtype=None) -> BlockTriFactor:
    """Prepare an upper-triangular matrix by building its reversal.

    Solving U w = v is ``rev(solve_lower(J U J, rev(v)))``; callers fold the
    two reversals into their permutation vectors (see cp.py).
    """
    import scipy.sparse as sp

    U = sp.csr_matrix(U)
    n = U.shape[0]
    rev = np.arange(n - 1, -1, -1)
    T = U[rev][:, rev].tocsr()
    return build_block_tri(T, panel=panel, dtype=dtype)
