"""Round-4 perf experiments: where do the DIA SpMV and trisolve cycles go?

Hypotheses under test (VERDICT r3 weak #2):
  H1  (nb, 16, 16)-shaped einsum operands are tile-padded by XLA into
      (.., 128)-lane layouts, inflating HBM traffic ~8x.
  H2  the DIA shifted-slice chain fails to fuse into one pass.

Methodology: each op runs inside ``fori_loop(K)`` chains (data dependency
through the vector operand) for two K values; per-op = slope between them.
This cancels both the ~40 ms tunnel round-trip and any fixed dispatch cost.
Usage: python exp_layout.py [group ...]   groups: stream dia tri
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cpkrylov_tpu.utils.timing import sync  # noqa: E402


def slope_time(name, op, v0, K1=10, K2=410, reps=4, bytes_logical=None,
               extra=None):
    """op: v -> v (same shape/dtype).  Chain via fori_loop, time the slope."""
    walls = {}
    for K in (K1, K2):
        f = jax.jit(lambda v, K=K: jax.lax.fori_loop(
            0, K, lambda i, w: op(w), v))
        sync(f(v0))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(f(v0))
            best = min(best, time.perf_counter() - t0)
        walls[K] = best
    per = (walls[K2] - walls[K1]) / (K2 - K1)
    gbps = (bytes_logical / per / 1e9) if bytes_logical else float("nan")
    print(f"{name:44s} {per*1e3:8.3f} ms/op   {gbps:7.1f} GB/s-logical"
          + (f"   {extra}" if extra else ""))
    return per


def main(groups):
    n = 1_000_000
    nd = 7
    rng = np.random.default_rng(0)
    data = jnp.asarray(rng.standard_normal((nd, n)), jnp.float32)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    offsets = (-3, -2, -1, 0, 1, 2, 3)

    if "stream" in groups:
        slope_time("A stream axpy 1x(4MB rw)",
                   lambda v: v * jnp.float32(1.0000001) + jnp.float32(0.5),
                   x, bytes_logical=8e6)
        slope_time("A2 stream axpy 1x(28MB rw)",
                   lambda d: d * jnp.float32(1.0000001) + jnp.float32(0.5),
                   data, bytes_logical=56e6)

    if "dia" in groups:
        def dia_dyn(v):
            xp = jnp.pad(v, (3, 3))
            acc = jnp.zeros(n, jnp.float32)
            for k, off in enumerate(offsets):
                acc = acc + data[k] * jax.lax.dynamic_slice_in_dim(
                    xp, 3 + off, n)
            return acc
        slope_time("B dia matvec dynamic_slice", dia_dyn, x,
                   bytes_logical=(nd * n * 4 + 8 * n))

        def dia_static(v):
            xp = jnp.pad(v, (3, 3))
            acc = data[0] * xp[0:n]
            for k in range(1, nd):
                acc = acc + data[k] * xp[k:k + n]
            return acc
        slope_time("C dia matvec static slices", dia_static, x,
                   bytes_logical=(nd * n * 4 + 8 * n))

        def dia_roll(v):
            acc = data[3] * v
            for k, off in enumerate(offsets):
                if off != 0:
                    acc = acc + data[k] * jnp.roll(v, -off)
            return acc
        slope_time("C2 dia matvec jnp.roll", dia_roll, x,
                   bytes_logical=(nd * n * 4 + 8 * n))

        # D. 2D layout: x as (rows, 512); off-by-row shifts are row slices,
        # intra-row shifts handled by also multiplying shifted columns.
        # Simplest correct 2D variant: keep 3 shifted copies of x columns.
        x2 = x.reshape(-1, 500)

        def dia2d(v2):
            # shift by +-1..3 along flattened order == roll rows by 0 with
            # column shift, plus boundary column from adjacent row.
            out = data[3].reshape(-1, 500) * v2
            for k, off in enumerate(offsets):
                if off == 0:
                    continue
                sh = jnp.roll(v2.reshape(-1), -off).reshape(-1, 500)
                out = out + data[k].reshape(-1, 500) * sh
            return out
        slope_time("D dia matvec 2D roll", dia2d, x2,
                   bytes_logical=(nd * n * 4 + 8 * n))

    if any(g.startswith("tri") for g in groups):
        nb, p, r = n // 16, 16, 8
        inv = jnp.asarray(rng.standard_normal((nb, p, p)), jnp.float32)
        b2 = jnp.asarray(rng.standard_normal((nb, p)), jnp.float32)
        sel = [g[4:] for g in groups if g.startswith("tri:")]
        want = (lambda tag: not sel or tag in sel)
        if want("E"): slope_time("E einsum bij,bj->bi (nb,16,16)",
                   lambda bb: jnp.einsum("bij,bj->bi", inv, bb), b2,
                   K1=4, K2=24,
                   bytes_logical=(inv.size * 4 + 2 * b2.size * 4))

        inv_t = jnp.asarray(np.ascontiguousarray(
            np.asarray(inv).transpose(1, 2, 0)))
        b2_t = jnp.asarray(np.asarray(b2).T)
        if want("F"): slope_time("F einsum ijb,jb->ib (16,16,nb)",
                   lambda bt: jnp.einsum("ijb,jb->ib", inv_t, bt), b2_t,
                   K1=4, K2=24,
                   bytes_logical=(inv.size * 4 + 2 * b2.size * 4))

        # F2: transposed layout via unrolled FMA (no einsum/dot at all)
        def fma_t(bt):
            outs = []
            for i in range(p):
                acc = inv_t[i, 0] * bt[0]
                for j in range(1, p):
                    acc = acc + inv_t[i, j] * bt[j]
                outs.append(acc)
            return jnp.stack(outs)
        if want("F2"): slope_time("F2 unrolled FMA (16,16,nb)", fma_t, b2_t,
                   K1=4, K2=24,
                   bytes_logical=(inv.size * 4 + 2 * b2.size * 4))

        mr = jnp.asarray(rng.standard_normal((nb, r, r)) * 0.1, jnp.float32)
        cr = jnp.asarray(rng.standard_normal((nb, r)), jnp.float32)

        def combine(a, bb):
            ma, ca = a
            mb, cb = bb
            return mb @ ma, jnp.einsum("...ij,...j->...i", mb, ca) + cb

        if want("G"): slope_time("G assoc_scan (nb,8,8) batch-major",
                   lambda c: jax.lax.associative_scan(combine, (mr, c))[1],
                   cr, K1=4, K2=24,
                   bytes_logical=(mr.size * 4 * 2 + cr.size * 4 * 2))

        from cpkrylov_tpu.precond.trisolve import (ReducedScanTriFactor,
                                                   reduced_scan_tri_solve)
        w = jnp.asarray(rng.standard_normal((nb, p, r)) * 0.1, jnp.float32)
        tf = ReducedScanTriFactor(inv_diag=inv, w_blocks=w, n=n, panel=p, r=r)
        if want("H"): slope_time("H reduced_scan_tri_solve current",
                   lambda v: reduced_scan_tri_solve(tf, v), x,
                   K1=4, K2=24,
                   bytes_logical=(inv.size * 4 + w.size * 4 + 2 * n * 4))


if __name__ == "__main__":
    groups = sys.argv[1:] or ["stream", "dia", "tri"]
    main(groups)
