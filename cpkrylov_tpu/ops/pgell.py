"""PGELL — paged-gather ELL: a TPU-native sparse matrix format.

TPUs have no hardware gather; the one fast data-dependent primitive Mosaic
exposes is ``tpu.dynamic_gather`` along lanes (a per-sublane-row 128-entry
LUT, measured ~224 G elems/s on v5e).  PGELL organizes SpMV so that *all*
other data movement is dense:

  * x is viewed as pages of 128 lanes: ``x2d (P, 128)``.
  * nnz of a row tile are packed into slot-rows of 128 lanes; every slot-row
    is homogeneous in (x-page, destination row-bucket): all its entries read
    from one x page and accumulate into one 128-row output bucket, at the
    lane equal to their destination row's offset within the bucket.
  * the x page for each slot-row is brought in with an MXU one-hot matmul
    ``onehotP (S, Wp) @ window (Wp, 128)``;
  * the per-entry x element is then picked with the lane LUT
    (``take_along_axis(..., axis=1)``);
  * accumulation into the output buckets is a second MXU one-hot matmul
    ``onehotB (B, S) @ prod (S, 128)``.

Per-nnz cost: one lane-gather + one multiply on the VPU, plus
O(Wp + B) MXU MACs, which the 128x128 systolic array absorbs.  The format
is profitable for locally-banded matrices (e.g. RCM-ordered KKT systems)
where each row tile touches a bounded window of x pages.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

LANE = 128


def _register(cls, data_fields, meta_fields):
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )


@partial(_register,
         data_fields=("vals", "lane_idx", "page_sel", "wstart"),
         meta_fields=("shape", "tile_rows", "wp", "s_rows", "depth"))
@dataclasses.dataclass(frozen=True)
class PGELL:
    """Packed matrix; T = number of row tiles, S = B * D slot-rows per tile.

    Slot-rows are bucket-major with uniform depth D, so slot-row s serves
    bucket ``s // D`` implicitly.
    """

    vals: jax.Array        # (T, S, 128) f32 entry values (0 = padding)
    lane_idx: jax.Array    # (T, S, 128) i32 source lane (col % 128)
    page_sel: jax.Array    # (T, S, 1)   i32 local x page of the slot-row
    wstart: jax.Array      # (T,)        i32 first x page of the tile window
    shape: Tuple[int, int]
    tile_rows: int         # TR (multiple of 128); buckets B = TR // 128
    wp: int                # pages per window
    s_rows: int            # S = B * depth
    depth: int             # uniform slot depth per bucket

    @property
    def ntiles(self) -> int:
        return self.vals.shape[0]

    @property
    def buckets(self) -> int:
        return self.tile_rows // LANE

    @property
    def nnz_density(self) -> float:
        """Fraction of slot capacity holding real entries."""
        return float((np.asarray(self.vals) != 0).mean())


def pack_pgell(mat, tile_rows: int = 2048, min_wp: int = 8,
               dtype=np.float32) -> PGELL:
    """Pack a scipy sparse matrix into PGELL.

    ``tile_rows`` must be a multiple of 128.  The window size Wp is chosen as
    the maximum page span over tiles (so the format suits locally banded
    matrices; a single dense row would force Wp ~ ncols/128).
    """
    if tile_rows % LANE:
        raise ValueError("tile_rows must be a multiple of 128")
    csr = sp.csr_matrix(mat)
    nrows, ncols = csr.shape
    npages = -(-max(ncols, 1) // LANE)
    ntiles = max(1, -(-nrows // tile_rows))

    # First pass: per-tile page spans -> global Wp.
    spans = []
    p0s = []
    for t in range(ntiles):
        r0, r1 = t * tile_rows, min((t + 1) * tile_rows, nrows)
        cols = csr.indices[csr.indptr[r0]:csr.indptr[r1]]
        if cols.size:
            pmin, pmax = int(cols.min()) // LANE, int(cols.max()) // LANE
        else:
            pmin = pmax = 0
        spans.append(pmax - pmin + 1)
        p0s.append(pmin)
    wp = max(min_wp, max(spans))
    # Keep windows inside the padded page array.
    p0s = [min(p0, max(0, npages - wp)) for p0 in p0s]
    npages_pad = max(npages, wp)

    # Second pass: vectorized slot assignment.
    coo = csr.tocoo()
    er = coo.row.astype(np.int64)
    ec = coo.col.astype(np.int64)
    ev = coo.data
    tile = er // tile_rows
    bucket = (er % tile_rows) // LANE
    lane = er % LANE
    page = ec // LANE - np.asarray(p0s, np.int64)[tile]
    lidx = (ec % LANE).astype(np.int32)

    # occurrence depth within each (tile, bucket, page, lane) group
    gkey = ((tile * (tile_rows // LANE) + bucket) * wp + page) * LANE + lane
    order = np.argsort(gkey, kind="stable")
    gk_sorted = gkey[order]
    newgrp = np.empty(gk_sorted.shape, bool)
    newgrp[:1] = True
    newgrp[1:] = gk_sorted[1:] != gk_sorted[:-1]
    grp_start = np.maximum.accumulate(np.where(newgrp,
                                               np.arange(gk_sorted.size), 0))
    depth = np.empty_like(gk_sorted)
    depth[order] = np.arange(gk_sorted.size) - grp_start

    # slot-row identity = (tile, bucket, page, depth); layout is
    # bucket-major with a *uniform* per-bucket depth D, so the bucket
    # accumulation in the kernel is a free reshape + sum (no matmul).
    nb = tile_rows // LANE
    skey = ((tile * nb + bucket) * wp + page) \
        * (int(depth.max()) + 1 if depth.size else 1) + depth
    uniq, slot_of_entry = np.unique(skey, return_inverse=True)
    rep = np.zeros(uniq.size, np.int64)
    rep[slot_of_entry] = np.arange(er.size)
    slot_tile = tile[rep]
    slot_bucket = bucket[rep]
    slot_page = page[rep]
    # per-(tile, bucket) ordinal of each slot (uniq sorted => contiguous)
    tb = slot_tile * nb + slot_bucket
    tb_first = np.searchsorted(tb, np.arange(ntiles * nb), side="left")
    d_of_slot = np.arange(uniq.size) - tb_first[tb]
    d_counts = np.diff(np.append(tb_first, uniq.size))

    T = ntiles
    dmax = int(d_counts.max()) if uniq.size else 1
    # S = B * D; keep the (B*D) product sublane-aligned via D
    dmax = max(1, dmax)
    while (nb * dmax) % 8:
        dmax += 1
    smax = nb * dmax
    s_of_slot = slot_bucket * dmax + d_of_slot

    vals = np.zeros((T, smax, LANE), dtype)
    lane_idx = np.zeros((T, smax, LANE), np.int32)
    page_sel = np.zeros((T, smax), np.int32)
    page_sel[slot_tile, s_of_slot] = slot_page
    es = s_of_slot[slot_of_entry]
    vals[tile, es, lane] = ev
    lane_idx[tile, es, lane] = lidx

    return PGELL(
        vals=jnp.asarray(vals), lane_idx=jnp.asarray(lane_idx),
        page_sel=jnp.asarray(page_sel[..., None]),
        wstart=jnp.asarray(np.asarray(p0s, np.int32)),
        shape=(int(nrows), int(ncols)), tile_rows=int(tile_rows),
        wp=int(wp), s_rows=int(smax), depth=int(dmax),
    )


def pad_x_pages(x: jax.Array, ncols: int, wp: int) -> jax.Array:
    """Reshape x to padded (P, 128) pages covering every window."""
    npages = -(-max(ncols, 1) // LANE)
    npages_pad = max(npages, wp)
    total = npages_pad * LANE
    xp = jnp.zeros(total, x.dtype).at[: x.shape[0]].set(x)
    return xp.reshape(npages_pad, LANE)


def pgell_matvec_reference(mat: PGELL, x: jax.Array) -> jax.Array:
    """jnp reference implementation (for tests; mirrors the kernel math)."""
    x2d = pad_x_pages(x, mat.shape[1], mat.wp)
    T, S = mat.vals.shape[0], mat.s_rows
    B = mat.buckets

    def tile(t):
        win = jax.lax.dynamic_slice_in_dim(x2d, mat.wstart[t], mat.wp, 0)
        onehot_p = (jax.lax.broadcasted_iota(jnp.int32, (S, mat.wp), 1)
                    == mat.page_sel[t]).astype(x.dtype)
        g1 = jnp.dot(onehot_p, win.astype(x.dtype),
                     precision=jax.lax.Precision.HIGHEST)
        g2 = jnp.take_along_axis(g1, mat.lane_idx[t], axis=1)
        prod = mat.vals[t].astype(x.dtype) * g2
        return prod.reshape(B, mat.depth, LANE).sum(axis=1).reshape(-1)

    y = jax.vmap(tile)(jnp.arange(T)).reshape(-1)
    return y[: mat.shape[0]]
