"""Pallas TPU kernels for the interleave permutation's head region.

``InterleavePermute`` (permute.py) applies the riffle ordering with XLA
reshape/concat chains over (m, c)/(m, c+1)-shaped intermediates.  On TPU
those minor-dim-c arrays are tile-padded to 128 lanes, so each apply
materializes ~32x the logical bytes — measured 0.46 ms (apply) / 0.81 ms
(apply_inv) per call at m = 250k, i.e. ~40% of the whole preconditioner
application after the fused trisolve kernels landed.

These kernels do the same (G, c) + (G, 1) <-> (G, c+1) relayout inside
VMEM, where the padded shapes never touch HBM: traffic is exactly one read
+ one write of the logical bytes.  Only the HEAD of the permutation (the
first (c+1)*m positions) needs a kernel — the x-tail is a contiguous slice
either way and stays in XLA.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interleave_kernel(x_ref, y_ref, out_ref, *, G: int, c: int):
    xb = x_ref[:].reshape(G, c)
    yb = y_ref[:].reshape(G, 1)
    out_ref[:] = jnp.concatenate([xb, yb], axis=1).reshape(G * (c + 1))


def _uninterleave_kernel(in_ref, x_ref, y_ref, *, G: int, c: int):
    blk = in_ref[:].reshape(G, c + 1)
    x_ref[:] = blk[:, :c].reshape(G * c)
    y_ref[:] = blk[:, c]


@functools.partial(jax.jit, static_argnames=("c", "G", "interpret"))
def interleave_head(zx_head: jax.Array, zy: jax.Array, *, c: int,
                    G: int = 8192, interpret: bool = False) -> jax.Array:
    """[x_0..x_{c-1} y_0 x_c ... ] riffle of zx_head ((c*m,)) and zy ((m,))."""
    m = zy.shape[0]
    grid = (pl.cdiv(m, G),)
    kernel = functools.partial(_interleave_kernel, G=G, c=c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G * c,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((G,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((G * (c + 1),), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((m * (c + 1),), zx_head.dtype),
        interpret=interpret,
    )(zx_head, zy)


@functools.partial(jax.jit, static_argnames=("c", "G", "interpret"))
def uninterleave_head(w_head: jax.Array, *, c: int, G: int = 8192,
                      interpret: bool = False):
    """Inverse riffle: w_head ((c+1)*m,) -> (zx_head (c*m,), zy (m,))."""
    m = w_head.shape[0] // (c + 1)
    grid = (pl.cdiv(m, G),)
    kernel = functools.partial(_uninterleave_kernel, G=G, c=c)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((G * (c + 1),), lambda i: (i,),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((G * c,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((G,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((m * c,), w_head.dtype),
            jax.ShapeDtypeStruct((m,), w_head.dtype),
        ],
        interpret=interpret,
    )(w_head)
