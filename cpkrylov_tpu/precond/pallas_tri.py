"""Pallas TPU kernel for the reduced-state triangular-solve scan.

The blocked trisolve (trisolve.py) reduces a banded lower-triangular solve
to the first-order affine recurrence over panel tail-states

    s_i = Mr_i @ s_{i-1} + cr_i ,          Mr_i: (r, r),  i = 1..nb

(reference semantics: the L / L^T solves inside opLDL2's composition,
/root/reference/ops/opLDL2.m:86, 165-167).  ``lax.associative_scan`` on
(nb, r, r) operands is the measured bottleneck of the whole solver hot loop
on TPU: its level-by-level odd/even slicing keeps every intermediate in an
(..., r, r)-trailing layout that pads r=8 lanes up to 128 — a ~16x HBM
traffic blow-up, 3.4 ms per solve at nb = 78k vs ~0.05 ms for the
surrounding einsums (benchmarks/exp_tri_pieces.py, round 4).

This kernel instead stores everything lane-major — transitions (r, r, nb),
affine parts (r, nb), trailing dim = scan axis = lanes — and runs ONE
sequential-grid pass: each grid step loads a K-lane chunk into VMEM,
computes the in-chunk inclusive prefix by Hillis-Steele doubling over lanes
(log2 K levels of (r, r, K) FMAs, all VMEM-resident), folds in the carry
state from the previous chunk, and persists the new carry in VMEM scratch
across grid steps (TPU grids execute sequentially, scratch persists).
HBM traffic is exactly one read of (Mr, cr) + one write of s.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _affine_scan_kernel(m_ref, c_ref, s_ref, carry_ref, *, r: int, K: int):
    """One K-lane chunk of the inclusive affine-recurrence prefix scan.

    m_ref: (r, r, K) transitions, c_ref: (r, K) affine parts,
    s_ref: (r, K) output states, carry_ref: (r, 128) VMEM scratch whose
    column 0 holds s at the end of the previous chunk.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        carry_ref[:, :] = jnp.zeros((r, 128), jnp.float32)

    M = m_ref[:, :, :]
    C = c_ref[:, :]

    eye = jnp.broadcast_to(jnp.eye(r, dtype=jnp.float32)[:, :, None],
                           (r, r, K))
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (r, r, K), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (r, K), 1)

    d = 1
    while d < K:
        # Shift right by d along lanes; lanes < d take the identity map.
        Mp = jnp.where(lane3 < d, eye, pltpu.roll(M, shift=d, axis=2))
        Cp = jnp.where(lane2 < d, jnp.float32(0.0),
                       pltpu.roll(C, shift=d, axis=1))
        # Compose: out_i = cur_i \circ prev_{i-d}.  Basic slices only
        # (fancy indexing lowers to unsupported >2D gathers in Mosaic).
        Mn = M[:, 0:1, :] * Mp[0:1, :, :]
        acc_c = M[:, 0, :] * jnp.broadcast_to(Cp[0:1, :], (r, K))
        for k in range(1, r):
            Mn = Mn + M[:, k:k + 1, :] * Mp[k:k + 1, :, :]
            acc_c = acc_c + M[:, k, :] * jnp.broadcast_to(Cp[k:k + 1, :],
                                                          (r, K))
        M = Mn
        C = acc_c + C
        d *= 2

    # Fold in the carry from the previous chunk: s = C + M @ s_in.
    s_in = carry_ref[:, 0]                       # (r,)
    s = C
    for k in range(r):
        s = s + M[:, k, :] * s_in[k]
    s_ref[:, :] = s
    carry_ref[:, 0] = s[:, K - 1]


@functools.partial(jax.jit, static_argnames=("r", "K"))
def affine_lane_scan(mr: jax.Array, cr: jax.Array, *, r: int,
                     K: int = 2048) -> jax.Array:
    """Inclusive prefix of s_i = Mr_i s_{i-1} + cr_i over the lane axis.

    mr: (r, r, nb) f32, cr: (r, nb) f32, nb divisible by K.
    Returns s: (r, nb) f32.
    """
    nb = mr.shape[2]
    assert nb % K == 0, (nb, K)
    grid = (nb // K,)
    kernel = functools.partial(_affine_scan_kernel, r=r, K=K)
    return pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((r, r, K), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, K), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, K), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, nb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.float32)],
    )(mr, cr)


def affine_lane_scan_reference(mr, cr):
    """XLA reference for tests: same lane-major contract."""
    r = mr.shape[0]

    def combine(a, b):
        ma, ca = a
        mb, cb = b
        return (jnp.einsum("ikb,kjb->ijb", mb, ma),
                jnp.einsum("ikb,kjb->ijb", mb, ca) + cb)

    _, s = jax.lax.associative_scan(
        combine, (mr, cr[:, None, :]), axis=2)
    return s[:, 0, :]


# ---------------------------------------------------------------------------
# Fused trisolve kernel: transpose + c-einsum + scan + x-einsum in one pass
# ---------------------------------------------------------------------------

import dataclasses

import jax.tree_util as jtu


@functools.partial(
    jtu.register_dataclass,
    data_fields=["inv_t", "w_t"],
    meta_fields=["n", "panel", "r", "nb", "chunk"])
@dataclasses.dataclass(frozen=True)
class PallasTriFactor:
    """Lane-major factor operands for the fused Pallas trisolve.

    Same math as ``ReducedScanTriFactor`` (trisolve.py) — panel inverses and
    W = inv @ S sub-blocks of a banded lower-triangular T — but stored
    lane-major ((p, p, nb_pad) / (p, r, nb_pad), trailing dim = panel index)
    so every kernel op is an FMA over clean 128-lane tiles, and padded so the
    panel count divides the kernel chunk.
    """

    inv_t: jax.Array   # (p, p, nb_pad) f32
    w_t: jax.Array     # (p, r, nb_pad) f32
    n: int
    panel: int
    r: int
    nb: int            # un-padded panel count
    chunk: int         # lanes per grid step; nb_pad % chunk == 0

    @property
    def nblocks(self) -> int:
        return self.nb

    @property
    def work_nnz(self) -> int:
        nb, p, r = self.nb, self.panel, self.r
        return nb * (p * p + 2 * p * r)

    @property
    def device_bytes(self) -> int:
        return int((self.inv_t.size + self.w_t.size)
                   * np.dtype(self.inv_t.dtype).itemsize)


def _fused_tri_kernel(inv_ref, w_ref, b_ref, x_ref, carry_ref, *,
                      p: int, r: int, K: int):
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        carry_ref[:, :] = jnp.zeros((r, 128), jnp.float32)

    # b arrives lane-major (p, K) — natural-order (nb, p) blocks tile-pad
    # their 16-lane minor dim up to 128 in HBM (an ~8x hidden traffic and
    # footprint blow-up measured in round 5) and needed an in-kernel
    # transpose; the caller now reshapes+transposes in XLA (fused, packed).
    bt = b_ref[:, :]                               # (p, K)
    inv = inv_ref[:, :, :]
    w = w_ref[:, :, :]

    # c_i = inv_i @ b_i, lane-major FMA chain.
    c = inv[:, 0, :] * jnp.broadcast_to(bt[0:1, :], (p, K))
    for j in range(1, p):
        c = c + inv[:, j, :] * jnp.broadcast_to(bt[j:j + 1, :], (p, K))

    # Inclusive affine prefix over the tail states.  Two-level Hillis-
    # Steele: doubling within 128-lane segments (log2(128) = 7 levels of
    # (r, r, K) FMAs — the kernel's dominant compute), then a tiny stitch
    # scan over the K/128 segment summaries, then one broadcast apply.
    # vs plain doubling over the full chunk this removes log2(K/128)
    # full-width levels (~36% of the doubling FLOPs at K = 2048).
    M = -w[p - r:, :, :]                           # (r, r, K)
    C = c[p - r:, :]                               # (r, K)
    eye = jnp.broadcast_to(jnp.eye(r, dtype=jnp.float32)[:, :, None],
                           (r, r, K))
    lane3 = jax.lax.broadcasted_iota(jnp.int32, (r, r, K), 2)
    lane2 = jax.lax.broadcasted_iota(jnp.int32, (r, K), 1)
    seg = 128 if K % 128 == 0 and K > 128 else K
    d = 1
    while d < seg:
        # mask at SEGMENT starts: rolled-in values from the previous
        # segment are replaced by the identity map
        Mp = jnp.where(lane3 % seg < d, eye, pltpu.roll(M, shift=d, axis=2))
        Cp = jnp.where(lane2 % seg < d, jnp.float32(0.0),
                       pltpu.roll(C, shift=d, axis=1))
        Mn = M[:, 0:1, :] * Mp[0:1, :, :]
        acc = M[:, 0, :] * jnp.broadcast_to(Cp[0:1, :], (r, K))
        for k in range(1, r):
            Mn = Mn + M[:, k:k + 1, :] * Mp[k:k + 1, :, :]
            acc = acc + M[:, k, :] * jnp.broadcast_to(Cp[k:k + 1, :], (r, K))
        M = Mn
        C = acc + C
        d *= 2

    s_in = carry_ref[:, 0]                         # (r,) carry from prev chunk
    if seg < K:
        S = K // seg
        M4 = M.reshape(r, r, S, seg)               # minor split K -> (S, seg)
        C4 = C.reshape(r, S, seg)
        # Segment summaries (last lane of each segment), kept 4D with a
        # trailing singleton so every op below is a basic slice / roll —
        # integer and None indexing lower to unsupported gathers in Mosaic.
        sM = jax.lax.slice_in_dim(M4, seg - 1, seg, axis=3)  # (r, r, S, 1)
        sC = jax.lax.slice_in_dim(C4, seg - 1, seg, axis=2)  # (r, S, 1)
        # identity maps built from iota comparisons: a (r, r) -> (r, r, 1, 1)
        # reshape is an unsupported Mosaic shape cast
        eyeS = jnp.where(
            jax.lax.broadcasted_iota(jnp.int32, (r, r, S, 1), 0)
            == jax.lax.broadcasted_iota(jnp.int32, (r, r, S, 1), 1),
            jnp.float32(1.0), jnp.float32(0.0))
        seg4 = jax.lax.broadcasted_iota(jnp.int32, (r, r, S, 1), 2)
        seg3b = jax.lax.broadcasted_iota(jnp.int32, (r, S, 1), 1)
        d = 1
        while d < S:
            sMp = jnp.where(seg4 < d, eyeS, pltpu.roll(sM, shift=d, axis=2))
            sCp = jnp.where(seg3b < d, jnp.float32(0.0),
                            pltpu.roll(sC, shift=d, axis=1))
            sMn = sM[:, 0:1, :, :] * sMp[0:1, :, :, :]
            sacc = sM[:, 0, :, :] * jnp.broadcast_to(sCp[0:1, :, :],
                                                     (r, S, 1))
            for k in range(1, r):
                sMn = sMn + sM[:, k:k + 1, :, :] * sMp[k:k + 1, :, :, :]
                sacc = sacc + sM[:, k, :, :] * jnp.broadcast_to(
                    sCp[k:k + 1, :, :], (r, S, 1))
            sM = sMn
            sC = sacc + sC
            d *= 2
        # exclusive prefix: state BEFORE segment s, including chunk carry
        exM = jnp.where(seg4 < 1, eyeS, pltpu.roll(sM, shift=1, axis=2))
        exC = jnp.where(seg3b < 1, jnp.float32(0.0),
                        pltpu.roll(sC, shift=1, axis=1))
        sb = exC                                   # (r, S, 1)
        for k in range(r):
            sb = sb + exM[:, k, :, :] * s_in[k]
        # broadcast-apply: s = C_loc + M_loc @ state_before_my_segment
        s4 = C4
        for k in range(r):
            s4 = s4 + (jax.lax.slice_in_dim(M4, k, k + 1, axis=1)
                       .reshape(r, S, seg)
                       * jnp.broadcast_to(
                           jax.lax.slice_in_dim(sb, k, k + 1, axis=0),
                           (1, S, 1)))
        s = s4.reshape(r, K)
    else:
        s = C
        for k in range(r):
            s = s + M[:, k, :] * s_in[k]

    # s_prev: shift right one lane, first lane = incoming carry.
    lane_r = jax.lax.broadcasted_iota(jnp.int32, (r, K), 1)
    s_prev = jnp.where(lane_r < 1,
                       jnp.broadcast_to(s_in[:, None], (r, K)),
                       pltpu.roll(s, shift=1, axis=1))

    # x_i = c_i - W_i s_{i-1}
    x = c - w[:, 0, :] * jnp.broadcast_to(s_prev[0:1, :], (p, K))
    for k in range(1, r):
        x = x - w[:, k, :] * jnp.broadcast_to(s_prev[k:k + 1, :], (p, K))

    x_ref[:, :] = x                                # lane-major (p, K)
    carry_ref[:, 0] = s[:, K - 1]


def build_pallas_tri(T, panel: int = 16, dtype=np.float32,
                     chunk: int = 1024) -> "PallasTriFactor | None":
    """Prepare a banded lower-triangular scipy matrix for the fused kernel.

    Reuses ``build_reduced_scan_tri``'s packing (exact same math) and
    re-lays the operands lane-major + chunk-padded.  Returns None when the
    reach exceeds the panel (caller falls back, as in trisolve._build_tri).
    """
    from .trisolve import pack_reduced_scan_np

    if np.dtype(dtype) != np.float32:
        return None
    packed = pack_reduced_scan_np(T, panel=panel, dtype=np.float32)
    if packed is None:
        return None
    inv_np, w_np, n, p, r = packed
    nb = inv_np.shape[0]
    # Cap the chunk near the panel count: padding nb up to a 1024-lane
    # chunk would inflate a wide-panel factor's memory by up to 64x past
    # the gate _build_tri just checked (review r4).  128-aligned so the
    # kernel's segment doubling stays applicable.
    chunk = min(chunk, max(128, -(-nb // 128) * 128))
    nb_pad = -(-nb // chunk) * chunk
    inv = np.zeros((nb_pad, p, p), np.float32)
    inv[:nb] = inv_np
    w = np.zeros((nb_pad, p, r), np.float32)
    w[:nb] = w_np
    return PallasTriFactor(
        inv_t=jnp.asarray(np.ascontiguousarray(inv.transpose(1, 2, 0))),
        w_t=jnp.asarray(np.ascontiguousarray(w.transpose(1, 2, 0))),
        n=n, panel=p, r=r, nb=nb, chunk=chunk)


def pallas_tri_solve(tf: PallasTriFactor, b: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Solve T x = b with the fused kernel (natural-order vector I/O).

    The kernel-facing vector layout is lane-major (p, nb): a natural-order
    (nb, p) array tile-pads p up to 128 lanes in HBM (8x traffic at p=16,
    16x at p=8 — measured round 5), while (p, nb) packs exactly.  The
    reshape+transpose pairs here fuse into single packed XLA passes."""
    p, r, K = tf.panel, tf.r, tf.chunk
    nb_pad = tf.inv_t.shape[2]
    n_pad = nb_pad * p
    b32 = b.astype(jnp.float32)
    bt = (jnp.zeros(n_pad, jnp.float32).at[: tf.n].set(b32)
          .reshape(nb_pad, p).T)
    kernel = functools.partial(_fused_tri_kernel, p=p, r=r, K=K)
    x = pl.pallas_call(
        kernel,
        grid=(nb_pad // K,),
        in_specs=[
            pl.BlockSpec((p, p, K), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, r, K), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((p, K), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((p, K), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((p, nb_pad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.float32)],
        interpret=interpret,
    )(tf.inv_t, tf.w_t, bt)
    return x.T.reshape(-1)[: tf.n].astype(b.dtype)


def pallas_tri_solve_xla(tf: PallasTriFactor, b: jax.Array) -> jax.Array:
    """Pure-XLA evaluation of the same factor (CPU fallback / test oracle)."""
    p, r = tf.panel, tf.r
    nb_pad = tf.inv_t.shape[2]
    b32 = b.astype(jnp.float32)
    bt = (jnp.zeros(nb_pad * p, jnp.float32).at[: tf.n].set(b32)
          .reshape(nb_pad, p).T)
    c = jnp.einsum("ijb,jb->ib", tf.inv_t, bt)
    s = affine_lane_scan_reference(-tf.w_t[p - r:, :, :], c[p - r:, :])
    s_prev = jnp.concatenate(
        [jnp.zeros((r, 1), jnp.float32), s[:, :-1]], axis=1)
    x = c - jnp.einsum("ikb,kb->ib", tf.w_t, s_prev)
    return x.T.reshape(-1)[: tf.n].astype(b.dtype)
