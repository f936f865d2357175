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
                   meta_fields=["n", "L", "chunk", "reverse"])
@dataclasses.dataclass(frozen=True)
class BidiagTriFactor:
    """Bidiagonal factor prepared for the flat-layout kernel.

    ``reverse=False``: lower-bidiagonal, left-to-right scan
    (x_i = a_i x_{i-1} + c_i, a_i = -l_i/d_i).
    ``reverse=True``: UPPER-bidiagonal solved by the same kernel scanning
    right-to-left on natural-order arrays (x_i = a_i x_{i+1} + c_i,
    a_i = -u_i/d_i) — the runtime ``jnp.flip`` pair the reversed-matrix
    formulation needed (trisolve.py build_block_tri_upper) disappears."""

    a2: jax.Array      # (8, L) f32; 1.0 at row heads so the kernel's
    #                    inclusive product is the TAIL product
    invd2: jax.Array   # (8, L) f32, 1 / d_i (1 in padding)
    head_a: jax.Array  # (8,) f32: the true a at each row head (fixup)
    n: int
    L: int
    chunk: int
    reverse: bool = False

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


def _bidiag_kernel(a_ref, invd_ref, b_ref, head_ref, x0_ref, p_ref,
                   mult_ref, carry_ref, *, K: int, nchunks: int,
                   rev: bool = False):
    """One (8, K) chunk: per-row inclusive affine scan + prefix products.

    carry_ref: (8, 128) VMEM scratch; col 0 = row state at the end of the
    previous chunk (zero-start), col 1 = running P.  ``rev=True`` scans
    right-to-left (upper-bidiagonal solves) on natural-order lanes: the
    rolls flip sign, the masks move to segment ends, the carry edge is
    lane 0, and the CALLER's grid index map runs chunks last-to-first.

    The LAST grid step also performs the cross-row stitch in VMEM (the
    carry then holds every row's scan-end state): 8 dependent scalar
    steps that cost nanoseconds here but ~60 us as a chain of tiny
    sequential XLA ops on the host-program side (measured round 5).
    ``mult_ref`` (8, 128) receives the per-row fixup multiplier
    head_a[r] * start_r in column 0.
    """
    step = pl.program_id(0)

    @pl.when(step == 0)
    def _init():
        carry_ref[:, :] = jnp.zeros((ROWS, 128), jnp.float32)
        carry_ref[:, 1] = jnp.ones((ROWS,), jnp.float32)
        mult_ref[:, :] = jnp.zeros((ROWS, 128), jnp.float32)

    A = a_ref[:, :]
    C = invd_ref[:, :] * b_ref[:, :]

    lane = jax.lax.broadcasted_iota(jnp.int32, (ROWS, K), 1)
    seg = 128 if K % 128 == 0 and K > 128 else K

    def edge_mask(d):
        if rev:
            return lane % seg >= seg - d
        return lane % seg < d

    # pltpu.roll requires non-negative shifts: a reverse roll by d on an
    # axis of length X is the circular roll by X - d.
    def sh(d, length):
        return (length - d) if rev else d

    d = 1
    while d < seg:
        Ap = jnp.where(edge_mask(d), jnp.float32(1.0),
                       pltpu.roll(A, shift=sh(d, K), axis=1))
        Cp = jnp.where(edge_mask(d), jnp.float32(0.0),
                       pltpu.roll(C, shift=sh(d, K), axis=1))
        C = A * Cp + C
        A = A * Ap
        d *= 2

    if seg < K:
        S = K // seg
        A4 = A.reshape(ROWS, S, seg)
        C4 = C.reshape(ROWS, S, seg)
        edge = 0 if rev else seg - 1          # scan-end lane of a segment
        sA = jax.lax.slice_in_dim(A4, edge, edge + 1, axis=2)  # (8, S, 1)
        sC = jax.lax.slice_in_dim(C4, edge, edge + 1, axis=2)
        segi = jax.lax.broadcasted_iota(jnp.int32, (ROWS, S, 1), 1)

        def seg_mask(d):
            if rev:
                return segi >= S - d
            return segi < d

        d = 1
        while d < S:
            sAp = jnp.where(seg_mask(d), jnp.float32(1.0),
                            pltpu.roll(sA, shift=sh(d, S), axis=1))
            sCp = jnp.where(seg_mask(d), jnp.float32(0.0),
                            pltpu.roll(sC, shift=sh(d, S), axis=1))
            sC = sA * sCp + sC
            sA = sA * sAp
            d *= 2
        # exclusive prefix across segments: state/product BEFORE segment s
        # in scan order
        exA = jnp.where(seg_mask(1), jnp.float32(1.0),
                        pltpu.roll(sA, shift=sh(1, S), axis=1))
        exC = jnp.where(seg_mask(1), jnp.float32(0.0),
                        pltpu.roll(sC, shift=sh(1, S), axis=1))
        A = (A4 * jnp.broadcast_to(exA, (ROWS, S, seg))).reshape(ROWS, K)
        C = (C4 + A4 * jnp.broadcast_to(exC, (ROWS, S, seg))
             ).reshape(ROWS, K)

    s_in = carry_ref[:, 0]
    p_in = carry_ref[:, 1]
    x0 = C + A * jnp.broadcast_to(s_in[:, None], (ROWS, K))
    P = A * jnp.broadcast_to(p_in[:, None], (ROWS, K))
    x0_ref[:, :] = x0
    p_ref[:, :] = P
    out_edge = 0 if rev else K - 1
    carry_ref[:, 0] = x0[:, out_edge]
    carry_ref[:, 1] = P[:, out_edge]

    @pl.when(step == nchunks - 1)
    def _stitch():
        ex = carry_ref[:, 0]               # (8,) row scan-end values
        ep = carry_ref[:, 1]
        ha = head_ref[:, 0]
        starts = [None] * ROWS
        if rev:
            starts[ROWS - 1] = jnp.float32(0.0)
            order = range(ROWS - 2, -1, -1)
            nxt = 1
        else:
            starts[0] = jnp.float32(0.0)
            order = range(1, ROWS)
            nxt = -1
        for r_ in order:
            q = r_ + nxt
            starts[r_] = ex[q] + ep[q] * (ha[q] * starts[q])
        mult = jnp.stack(starts) * ha
        mult_ref[:, :] = jnp.broadcast_to(mult[:, None], (ROWS, 128))


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


def build_bidiag_tri_upper(U, dtype=np.float32, chunk: int = 4096
                           ) -> BidiagTriFactor | None:
    """Prepare a scipy UPPER-bidiagonal matrix (diag + first superdiag)
    for the reversed-direction kernel; None on the same gates as the
    lower build.  Natural-order arrays, no runtime flips."""
    import scipy.sparse as sp

    if np.dtype(dtype) != np.float32:
        return None
    U = sp.csr_matrix(U)
    n = U.shape[0]
    if n < 8 * chunk:
        return None
    coo = U.tocoo()
    off = coo.col - coo.row
    if coo.nnz and (off.min() < 0 or off.max() > 1):
        return None
    d = np.zeros(n)
    up = np.zeros(n)                 # up[i] multiplies x_{i+1} in row i
    d[coo.col[off == 0]] = coo.data[off == 0]
    up[coo.row[off == 1]] = coo.data[off == 1]
    if np.any(d == 0.0):
        return None
    L = -(-n // (ROWS * chunk)) * chunk
    n_pad = ROWS * L
    a = np.zeros(n_pad, np.float32)
    invd = np.ones(n_pad, np.float32)
    a[: n - 1] = (-up[:-1] / d[:-1]).astype(np.float32)
    invd[:n] = (1.0 / d).astype(np.float32)
    a2 = a.reshape(ROWS, L)
    # Row heads for the reversed scan sit at each row's RIGHT edge (the
    # coupling into the next row's left edge); same tail-product trick.
    row_head_a = a2[:, L - 1].copy()
    row_head_a[ROWS - 1] = 0.0       # global chain ends at the right
    a2[:, L - 1] = 1.0
    return BidiagTriFactor(
        a2=jnp.asarray(a2), invd2=jnp.asarray(invd.reshape(ROWS, L)),
        head_a=jnp.asarray(row_head_a),
        n=int(n), L=int(L), chunk=int(chunk), reverse=True)


def bidiag_tri_solve(tf: BidiagTriFactor, b: jax.Array,
                     interpret: bool = False) -> jax.Array:
    """Solve T x = b: kernel scan + 8-step row stitch + fused fixup."""
    K = tf.chunk
    L = tf.L
    rev = tf.reverse
    n_pad = ROWS * L
    nchunks = L // K
    b32 = b.astype(jnp.float32)
    b2 = jnp.zeros(n_pad, jnp.float32).at[: tf.n].set(b32).reshape(ROWS, L)
    head2 = jnp.broadcast_to(tf.head_a[:, None], (ROWS, 128))
    kernel = functools.partial(_bidiag_kernel, K=K, nchunks=nchunks,
                               rev=rev)
    if rev:
        def imap(i):
            return (0, nchunks - 1 - i)
    else:
        def imap(i):
            return (0, i)
    x0, P, mult = pl.pallas_call(
        kernel,
        grid=(nchunks,),
        in_specs=[
            pl.BlockSpec((ROWS, K), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, K), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, K), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((ROWS, K), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, K), imap, memory_space=pltpu.VMEM),
            pl.BlockSpec((ROWS, 128), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((ROWS, L), jnp.float32),
            jax.ShapeDtypeStruct((ROWS, L), jnp.float32),
            jax.ShapeDtypeStruct((ROWS, 128), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((ROWS, 128), jnp.float32)],
        interpret=interpret,
    )(tf.a2, tf.invd2, b2, head2)

    # Fixup: one fused elementwise pass (the stitch ran in-kernel).
    x = x0 + P * mult[:, :1]
    return x.reshape(-1)[: tf.n].astype(b.dtype)
