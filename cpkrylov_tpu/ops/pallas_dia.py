"""Pallas TPU kernel for DIA (diagonal-storage) SpMV.

The XLA DIA matvec (ops/dia.py) is a chain of ``ndiag`` shifted
multiply-adds; XLA materializes accumulators between the unaligned slice
reads, costing ~4x the streaming floor at production sizes (measured
0.25 ms vs a ~0.06 ms floor for the 7-diagonal 1M-row bench A).  This
kernel makes the product ONE pass: each grid step loads a K-element chunk
of every diagonal plus a 3-block operand window into VMEM and runs the
shifted FMA chain on VMEM-resident data (in-VMEM unaligned slices are lane
rotations, not HBM round trips).

Overlapping operand windows are built from three BlockSpec views of a
once-padded operand (blocks i, i+1, i+2 of ``[0_K | x | 0_K...]``), so no
dynamic DMA or scalar prefetch is needed; any |offset| <= K is covered —
far beyond the reach of banded systems.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .dia import DIA


def _register(cls, data_fields, meta_fields):
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields))


@functools.partial(_register, data_fields=("data",),
                   meta_fields=("offsets", "shape", "nrows_pad", "chunk",
                                "nnz"))
@dataclasses.dataclass(frozen=True)
class PallasDIA:
    """DIA operand pre-padded for the one-pass Pallas matvec kernel.

    ``data`` is (ndiag, nrows_pad) with nrows_pad a multiple of ``chunk``;
    offsets follow ops.dia.DIA (column minus row).
    """

    data: jax.Array
    offsets: Tuple[int, ...]
    shape: Tuple[int, int]
    nrows_pad: int
    chunk: int
    nnz: int = 0

    @property
    def dtype(self):
        return self.data.dtype

    @property
    def ndiag(self) -> int:
        return len(self.offsets)

    @property
    def device_bytes(self) -> int:
        return int(self.data.size * np.dtype(self.data.dtype).itemsize)

    def to_dia(self) -> DIA:
        """XLA-form view (used for rmatvec/matmat fallbacks)."""
        return DIA(data=self.data[:, : self.shape[0]], offsets=self.offsets,
                   shape=self.shape, nnz=self.nnz)


def pack_pallas_dia(mat: DIA, chunk: int = 8192,
                    max_groups: int = 4) -> PallasDIA | None:
    """Wrap an XLA DIA operand for the Pallas kernel.

    Offsets of ANY magnitude are supported via window grouping (one
    two-block operand window per distinct ``offset // chunk`` — e.g. the
    natural-order K_P's B-blocks at offsets ~±n form two far groups);
    None only when the number of distinct groups would exceed
    ``max_groups`` (the VMEM cost of the extra windows stops paying)."""
    groups = sorted({o // chunk for o in mat.offsets})
    if len(groups) > max_groups:
        return None
    nrows = mat.shape[0]
    nrows_pad = -(-nrows // chunk) * chunk
    data = jnp.pad(mat.data, ((0, 0), (0, nrows_pad - nrows)))
    return PallasDIA(data=data, offsets=mat.offsets, shape=mat.shape,
                     nrows_pad=int(nrows_pad), chunk=int(chunk),
                     nnz=int(mat.nnz))


def _dia_kernel(data_ref, *refs, offsets, groups, K):
    # refs = (w0_g0, w1_g0, w0_g1, w1_g1, ..., y_ref)
    y_ref = refs[-1]
    wins = {}
    for gi, g in enumerate(groups):
        wins[g] = jnp.concatenate([refs[2 * gi][:], refs[2 * gi + 1][:]])
    acc = None
    for k, off in enumerate(offsets):
        g = off // K
        local = off - g * K                        # in [0, K)
        term = data_ref[k, :] * wins[g][local: local + K]
        acc = term if acc is None else acc + term
    y_ref[:] = acc


def pallas_dia_matvec(mat: PallasDIA, x: jax.Array,
                      interpret: bool = False) -> jax.Array:
    nrows, ncols = mat.shape
    K = mat.chunk
    npad = mat.nrows_pad
    groups = tuple(sorted({o // K for o in mat.offsets}))
    # Operand embedded at offset K in a zero-padded buffer; rows whose
    # diagonal entry would read outside the valid band carry ZERO data, so
    # clipped window indices at the extremes never contribute.
    xpad_len = npad + 2 * K
    nblk = xpad_len // K
    xfull = jnp.zeros(xpad_len, x.dtype).at[K: K + ncols].set(x)

    in_specs = [pl.BlockSpec((mat.ndiag, K), lambda i: (0, i),
                             memory_space=pltpu.VMEM)]
    operands = [mat.data.astype(x.dtype)
                if mat.data.dtype != x.dtype else mat.data]
    for g in groups:
        for extra in (1, 2):
            delta = g + extra
            in_specs.append(pl.BlockSpec(
                (K,),
                (lambda i, d=delta: (jnp.clip(i + d, 0, nblk - 1),)),
                memory_space=pltpu.VMEM))
            operands.append(xfull)

    kernel = functools.partial(_dia_kernel, offsets=mat.offsets,
                               groups=groups, K=K)
    y = pl.pallas_call(
        kernel,
        grid=(npad // K,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((K,), lambda i: (i,),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad,), x.dtype),
        interpret=interpret,
    )(*operands)
    return y[:nrows]


# ---------------------------------------------------------------------------
# df64 (double-f32) DIA matvec — the mixed-refinement outer residual's pass
# ---------------------------------------------------------------------------

def _df_dia_kernel(dh_ref, dl_ref, *refs, offsets, groups, K):
    """df64 shifted-FMA chain with error-free transforms (ops/df64.py
    semantics) on VMEM-resident windows."""
    yh_ref, yl_ref = refs[-2], refs[-1]
    wins_h = {}
    wins_l = {}
    for gi, g in enumerate(groups):
        wins_h[g] = jnp.concatenate([refs[4 * gi][:], refs[4 * gi + 1][:]])
        wins_l[g] = jnp.concatenate([refs[4 * gi + 2][:],
                                     refs[4 * gi + 3][:]])
    split = jnp.float32(4097.0)

    def two_prod(a, b):
        p = a * b
        ca = a * split
        ah = ca - (ca - a)
        al = a - ah
        cb = b * split
        bh = cb - (cb - b)
        bl = b - bh
        e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
        return p, e

    acc_h = jnp.zeros((K,), jnp.float32)
    acc_l = jnp.zeros((K,), jnp.float32)
    for k, off in enumerate(offsets):
        g = off // K
        local = off - g * K
        vh = wins_h[g][local: local + K]
        vl = wins_l[g][local: local + K]
        dh = dh_ref[k, :]
        dl = dl_ref[k, :]
        p, e = two_prod(dh, vh)
        e = e + dh * vl + dl * vh
        s = acc_h + p
        bb = s - acc_h
        e2 = (acc_h - (s - bb)) + (p - bb)
        acc_h = s
        acc_l = acc_l + e + e2
    s = acc_h + acc_l
    yl_ref[:] = acc_l - (s - acc_h)
    yh_ref[:] = s


def pallas_df_dia_matvec(dfd, xh: jax.Array, xl: jax.Array,
                         chunk: int = 8192, interpret: bool = False):
    """One-pass df64 DIA matvec; ``dfd`` is an ops.df64.DFDia (hi/lo
    diagonal stacks).  Falls back to the XLA form off-TPU (caller's job)."""
    nrows, ncols = dfd.shape
    K = chunk
    groups = tuple(sorted({o // K for o in dfd.offsets}))
    npad = -(-nrows // K) * K
    dh = jnp.pad(dfd.hi, ((0, 0), (0, npad - nrows)))
    dl = jnp.pad(dfd.lo, ((0, 0), (0, npad - nrows)))
    # Operand buffer sized by the COLUMN count (rectangular blocks: the
    # grid runs over output rows, windows index into x of length ncols).
    xpad_len = max(npad, -(-ncols // K) * K) + 2 * K
    nblk = xpad_len // K
    xh_f = jnp.zeros(xpad_len, jnp.float32).at[K: K + ncols].set(xh)
    xl_f = jnp.zeros(xpad_len, jnp.float32).at[K: K + ncols].set(xl)

    in_specs = [
        pl.BlockSpec((len(dfd.offsets), K), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((len(dfd.offsets), K), lambda i: (0, i),
                     memory_space=pltpu.VMEM),
    ]
    operands = [dh, dl]
    for g in groups:
        for extra, arr in ((1, xh_f), (2, xh_f), (1, xl_f), (2, xl_f)):
            delta = g + extra
            in_specs.append(pl.BlockSpec(
                (K,),
                (lambda i, d=delta: (jnp.clip(i + d, 0, nblk - 1),)),
                memory_space=pltpu.VMEM))
            operands.append(arr)

    kernel = functools.partial(_df_dia_kernel, offsets=dfd.offsets,
                               groups=groups, K=K)
    yh, yl = pl.pallas_call(
        kernel,
        grid=(npad // K,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((K,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((K,), lambda i: (i,), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((npad,), jnp.float32),
            jax.ShapeDtypeStruct((npad,), jnp.float32),
        ],
        interpret=interpret,
    )(*operands)
    return yh[:nrows], yl[:nrows]
