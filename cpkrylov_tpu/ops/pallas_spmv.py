"""Pallas TPU SpMV kernel over the PGELL v2 format (see pgell.py).

Grid over row tiles; per tile:
  1. DMA the tile's x-page window (Wp, 128) from HBM to VMEM (start page is
     data-dependent, read from a scalar-prefetch array),
  2. broadcast+reshape replicates each page across its D slot-rows (free),
  3. lane LUT (``take_along_axis`` axis=1 -> tpu.dynamic_gather) picks the
     per-entry x element,
  4. multiply by values into a VMEM scratch,
  5. per output bucket, a masked sum over the bucket's host-precomputed
     contiguous slot range (start from scalar prefetch).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pgell import LANE, PGELL, pad_x_pages


def _kernel(wstart_ref, lo_ref,              # scalar-prefetch (T,), (T, B)
            vals_ref, lane_ref, bmap_ref, x2d_ref,
            out_ref, win_ref, prod_ref, sem,
            *, wp: int, depth: int, s_pad: int, buckets: int,
            rng_len: int):
    t = pl.program_id(0)
    p0 = pl.multiple_of(wstart_ref[t], 8)   # host 8-aligns window starts
    s_rows = wp * depth

    copy = pltpu.make_async_copy(
        x2d_ref.at[pl.ds(p0, wp), :], win_ref, sem)
    copy.start()
    copy.wait()

    win = win_ref[:]                                    # (Wp, 128)
    g1 = jnp.broadcast_to(win[:, None, :],
                          (wp, depth, LANE)).reshape(s_rows, LANE)
    if s_pad > s_rows:
        g1 = jnp.concatenate(
            [g1, jnp.zeros((s_pad - s_rows, LANE), g1.dtype)], axis=0)
    lanes = lane_ref[0].astype(jnp.int32)               # (S_pad, 128)
    g2 = jnp.take_along_axis(g1, lanes, axis=1)
    prod_ref[:] = vals_ref[0] * g2

    for b in range(buckets):
        sl = pl.multiple_of(lo_ref[t, b], 32)  # host aligns range starts
        seg = prod_ref[pl.ds(sl, rng_len), :]
        mseg = bmap_ref[0, pl.ds(sl, rng_len), :]
        # int8 compares are unsupported on some targets; upcast in VMEM
        out_ref[0, b, :] = jnp.where(
            mseg.astype(jnp.int32) == b, seg, 0.0).sum(axis=0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pgell_matvec(mat: PGELL, x: jax.Array, interpret: bool = False):
    """y = mat @ x via the Pallas kernel."""
    x2d = pad_x_pages(x, mat).astype(mat.vals.dtype)
    T = mat.ntiles
    S = mat.s_rows
    B = mat.buckets
    wp = mat.wp

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, LANE), lambda t, w, l: (t, 0, 0)),
            pl.BlockSpec((1, S, LANE), lambda t, w, l: (t, 0, 0)),
            pl.BlockSpec((1, S, LANE), lambda t, w, l: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),        # x2d stays in HBM
        ],
        out_specs=pl.BlockSpec((1, B, LANE), lambda t, w, l: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((wp, LANE), x2d.dtype),
            pltpu.VMEM((S, LANE), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = functools.partial(_kernel, wp=wp, depth=mat.depth, s_pad=S,
                             buckets=B, rng_len=mat.rng_len)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, B, LANE), jnp.float32),
        interpret=interpret,
    )(mat.wstart, mat.lo, mat.vals, mat.lane_idx, mat.bucket_map, x2d)
    return out.reshape(-1)[: mat.shape[0]].astype(x.dtype)
