"""Flat-layout Pallas kernel for BIDIAGONAL triangular solves (reach = 1).

The interleave-ordered bench factor is bidiagonal (subdiagonal reach 1 —
round-5 measurement), and the panel-inverse kernel (pallas_tri.py) is a
poor fit for it on two counts it cannot fix:

* its (nb, p) natural-order vector I/O either tile-pads p up to 128 lanes
  (8-16x hidden HBM traffic) or needs XLA transposes that materialize the
  padded form anyway (~0.2 ms measured per solve);
* its per-lane state ops run on (r, r, K) = (1, 1, K) shapes at 1/8
  sublane occupancy, leaving the kernel compute-bound at ~190-370 GB/s.

This kernel keeps everything in the natural FLAT layout: the length-N
chain is viewed as (8, L) — row r holds elements [rL, (r+1)L), a free
reshape of the packed 1-D vector — so every op runs on clean (8, K)
tiles at full occupancy.  Each of the 8 rows is an independent sub-chain
scanned left-to-right with a per-row VMEM carry; the cross-row stitching
uses the affine-map trick: the kernel also emits P_i (the running product
of the recurrence coefficients from the row start), so

    x_i = x0_i + P_i * s_row ,

where x0 is the zero-start solution of the row and s_row its true start
state (= previous row's end), recovered afterwards from the 8 row-end
summaries by an unrolled 8-step composition and applied as one fused
elementwise pass.  P underflow to 0 is benign (the recurrence genuinely
forgets its start at that horizon); sustained |a| > 1 element growth
could overflow P, but such a factor also overflows the panel-inverse
form — the solve-level device->host fallback covers both.

HBM traffic per solve: read a, invd, b (3N) + write x0, P (2N) in the
kernel, then read x0, P + write x (3N) in the fixup (which XLA fuses
into the consumer when possible) — ~8N bytes ~= 40 MB at N = 1.25M vs
~95 MB + transposes for the p=16 panel kernel.

Reference semantics: the L / L' solves inside opLDL2's composition
(/root/reference/ops/opLDL2.m:86, 165-167), specialized to reach-1
factors.
"""
from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.tree_util import register_dataclass

ROWS = 8          # sublane count: one independent sub-chain per sublane


@functools.partial(register_dataclass,
                   data_fields=["a2", "invd2", "head_a"],
                   meta_fields=["n", "L", "chunk"])
@dataclasses.dataclass(frozen=True)
class BidiagTriFactor:
    """Bidiagonal lower factor prepared for the flat-layout kernel."""

    a2: jax.Array      # (8, L) f32, a_i = -l_i / d_i; 1.0 at row heads so
    #                    the kernel's inclusive product is the TAIL product
    invd2: jax.Array   # (8, L) f32, 1 / d_i (1 in padding)
    head_a: jax.Array  # (8,) f32: the true a at each row head (fixup)
    n: int
    L: int
    chunk: int

    @property
    def panel(self) -> int:      # introspection parity with other factors
        return 1

    @property
    def r(self) -> int:
        return 1

    @property
    def nblocks(self) -> int:
        return self.n

    @property
    def work_nnz(self) -> int:
        return 3 * self.n

    @property
    def device_bytes(self) -> int:
        return int((self.a2.size + self.invd2.size)
                   * np.dtype(self.a2.dtype).itemsize)


def _bidiag_kernel(a_ref, invd_ref, b_ref, x0_ref, p_ref, carry_ref, *,
                   K: int):
    """One (8, K) chunk: per-row inclusive affine scan + prefix products.

    carry_ref: (8, 128) VMEM scratch; col 0 = row state at the end of the
    previous chunk (zero-start), col 1 = running P.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        carry_ref[:, :] = jnp.zeros((ROWS, 128), jnp.float32)
        carry_ref[:, 1] = jnp.ones((ROWS,), jnp.float32)

    A = a_ref[:, :]
    C = invd_ref[:, :] * b_ref[:, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, K), 1)
    seg = 128 if K % 128 == 0 and K > 128 else K
    d = 1
    while d < seg:
        Ap = jnp.where(lane % seg < d, jnp.float32(1.0),
                       pltpu.roll(A, shift=d, axis=1))
        Cp = jnp.where(lane % seg < d, jnp.float32(0.0),
                       pltpu.roll(C, shift=d, axis=1))
        C = A * Cp + C
        A = A * Ap
        d *= 2

    if seg < K:
        S = K // seg
        A4 = A.reshape(ROWS, S, seg)
        C4 = C.reshape(ROWS, S, seg)
        sA = jax.lax.slice_in_dim(A4, seg - 1, seg, axis=2)   # (8, S, 1)
        sC = jax.lax.slice_in_dim(C4, seg - 1, seg, axis=2)
        segi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, S, 1), 1)
        d = 1
        while d < S:
            sAp = jnp.where(segi < d, jnp.float32(1.0),
                            pltpu.roll(sA, shift=d, axis=1))
            sCp = jnp.where(segi < d, jnp.float32(0.0),
                            pltpu.roll(sC, shift=d, axis=1))
            sC = sA * sCp + sC
            sA = sA * sAp
            d *= 2
        # exclusive prefix across segments: state/product BEFORE segment s
        exA = jnp.where(segi < 1, jnp.float32(1.0),
                        pltpu.roll(sA, shift=1, axis=1))
        exC = jnp.where(segi < 1, jnp.float32(0.0),
                        pltpu.roll(sC, shift=1, axis=1))
        A = (A4 * jnp.broadcast_to(exA, (ROWS, S, seg))).reshape(ROWS, K)
        C = (C4 + A4 * jnp.broadcast_to(exC, (ROWS, S, seg))
             ).reshape(ROWS, K)

    s_in = carry_ref[:, 0]
    p_in = carry_ref[:, 1]
    x0 = C + A * jnp.broadcast_to(s_in[:, None], (ROWS, K))
    P = A * jnp.broadcast_to(p_in[:, None], (ROWS, K))
    x0_ref[:, :] = x0
    p_ref[:, :] = P
    carry_ref[:, 0] = x0[:, K - 1]
    carry_ref[:, 1] = P[:, K - 1]


def build_bidiag_tri(T, dtype=np.float32, chunk: int = 4096
                     ) -> BidiagTriFactor | None:
    """Prepare a scipy lower-BIDIAGONAL matrix (diag + first subdiagonal);
    None when T has entries elsewhere, a zero diagonal, or is too small
    for the 8-row split to pay."""
    import scipy.sparse as sp

    if np.dtype(dtype) != np.float32:
        return None
    T = sp.csr_matrix(T)
    n = T.shape[0]
    if n < 8 * chunk:
        return None
    coo = T.tocoo()
    off = coo.row - coo.col
    if coo.nnz and (off.min() < 0 or off.max() > 1):
        return None
    d = np.zeros(n)
    lo = np.zeros(n)                     # lo[i] multiplies x_{i-1} in row i
    d[coo.col[off == 0]] = coo.data[off == 0]
    lo[coo.row[off == 1]] = coo.data[off == 1]
    if np.any(d == 0.0):
        return None
    L = -(-n // (ROWS * chunk)) * chunk
    n_pad = ROWS * L
    a = np.zeros(n_pad, np.float32)
    invd = np.ones(n_pad, np.float32)
    a[1:n] = (-lo[1:] / d[1:]).astype(np.float32)
    invd[:n] = (1.0 / d).astype(np.float32)
    a2 = a.reshape(ROWS, L)
    # Row heads: the kernel scans each row zero-start, so the head's true
    # coefficient moves to the fixup and the in-kernel head a is set to
    # 1.0 — the inclusive product A_i then equals the TAIL product
    # prod_{j=rL+1..i} a_j, exactly the start-state sensitivity
    # dx_i/ds = a_{rL} * A_i the fixup needs.
    row_head_a = a2[:, 0].copy()
    row_head_a[0] = 0.0                  # global chain has no predecessor
    a2[:, 0] = 1.0
    return BidiagTriFactor(
        a2=jnp.asarray(a2), invd2=jnp.asarray(invd.reshape(ROWS, L)),
        head_a=jnp.asarray(row_head_a),
        n=int(n), L=int(L), chunk=int(chunk))


def bidiag_tri_solve(tf: BidiagTriFactor, b: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Solve T x = b: kernel scan + 8-step row stitch + fused fixup."""
    K = tf.chunk
    L = tf.L
    n_pad = ROWS * L
    b32 = b.astype(jnp.float32)
    b2 = jnp.zeros(n_pad, jnp.float32).at[: tf.n].set(b32).reshape(ROWS, L)
    kernel = functools.partial(_bidiag_kernel, K=K)
    x0, P = pl.pallas_call(
        kernel,
        grid=(L // K,),
        in_specs=[
            pl.BlockSpec((ROWS, K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, K), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, L), jnp.float32),
            jax.ShapeDtypeStruct((ROWS, L), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ROWS, 128), jnp.float32)],
        interpret=interpret,
    )(tf.a2, tf.invd2, b2)

    # Row stitch: s_prev_r (the true value just before row r) composes
    # through the true head coefficients; 8 scalar affine steps, then one
    # fused elementwise fixup pass.
    head_a = tf.head_a
    end_x = x0[:, L - 1]
    end_p = P[:, L - 1]
    starts = [jnp.zeros((), jnp.float32)]         # s_prev_0 = 0
    for r_ in range(1, ROWS):
        prev_end = end_x[r_ - 1] + end_p[r_ - 1] * (
            head_a[r_ - 1] * starts[r_ - 1])
        starts.append(prev_end)
    mult = jnp.stack(starts) * head_a             # a_{rL} * s_prev_r
    x = x0 + P * mult[:, None]
    return x.reshape(-1)[: tf.n].astype(b.dtype)
