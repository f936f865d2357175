"""Pallas TPU SpMV kernel over the PGELL format (see pgell.py).

Grid over row tiles; per tile:
  1. DMA the tile's x-page window (Wp, 128) from HBM to VMEM (start page is
     data-dependent, read from a scalar-prefetch array),
  2. one-hot MXU matmul selects each slot-row's page,
  3. lane LUT (``take_along_axis`` axis=1 -> tpu.dynamic_gather) picks the
     per-entry x element,
  4. multiply by values,
  5. one-hot MXU matmul accumulates slot-rows into the tile's row buckets.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pgell import LANE, PGELL, pad_x_pages


def _kernel(wstart_ref,                      # scalar-prefetch (T,)
            vals_ref, lane_ref, page_ref, x2d_ref,
            out_ref, win_ref, sem,
            *, wp: int, s_rows: int, buckets: int, depth: int):
    t = pl.program_id(0)
    p0 = wstart_ref[t]

    copy = pltpu.make_async_copy(
        x2d_ref.at[pl.ds(p0, wp), :], win_ref, sem)
    copy.start()

    vals = vals_ref[0]                      # (S, 128)
    lanes = lane_ref[0]                     # (S, 128) i32
    pages = page_ref[0]                     # (S, 1)

    onehot_p = (jax.lax.broadcasted_iota(jnp.int32, (s_rows, wp), 1)
                == pages).astype(vals.dtype)

    copy.wait()
    # precision=HIGHEST: the one-hot operand is exact, but default (bf16)
    # MXU passes would truncate the x values to 8 mantissa bits.
    g1 = jnp.dot(onehot_p, win_ref[:].astype(vals.dtype),
                 preferred_element_type=jnp.float32,
                 precision=jax.lax.Precision.HIGHEST)
    g2 = jnp.take_along_axis(g1, lanes, axis=1)
    prod = vals * g2
    # bucket-major uniform-depth layout: accumulation is a reshape + sum
    out_ref[0] = prod.reshape(buckets, depth, 128).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pgell_matvec(mat: PGELL, x: jax.Array, interpret: bool = False):
    """y = mat @ x via the Pallas kernel."""
    x2d = pad_x_pages(x, mat.shape[1], mat.wp).astype(mat.vals.dtype)
    T = mat.ntiles
    S = mat.s_rows
    B = mat.buckets
    wp = mat.wp

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(T,),
        in_specs=[
            pl.BlockSpec((1, S, LANE), lambda t, w: (t, 0, 0)),
            pl.BlockSpec((1, S, LANE), lambda t, w: (t, 0, 0)),
            pl.BlockSpec((1, S, 1), lambda t, w: (t, 0, 0)),
            pl.BlockSpec(memory_space=pltpu.ANY),        # x2d stays in HBM
        ],
        out_specs=pl.BlockSpec((1, B, LANE), lambda t, w: (t, 0, 0)),
        scratch_shapes=[
            pltpu.VMEM((wp, LANE), x2d.dtype),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kern = functools.partial(_kernel, wp=wp, s_rows=S, buckets=B,
                             depth=mat.depth)
    out = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((T, B, LANE), jnp.float32),
        interpret=interpret,
    )(mat.wstart, mat.vals, mat.lane_idx, mat.page_sel, x2d)
    return out.reshape(-1)[: mat.shape[0]].astype(x.dtype)
