"""Lane-major trisolve layout experiment.

(nb, p, p) jit-argument operands get tile-padded ((16,16) trailing dims ->
(16,128) tiles = 8x HBM traffic).  Storing them lane-major — (p, p, nb),
trailing dim nb — pads <0.1% and every op is an FMA over nb-length lanes.
Measures the full reduced-scan solve in both layouts, operands as jit
ARGUMENTS (the production condition).
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cpkrylov_tpu.utils.timing import sync  # noqa: E402


def slope(name, step, x0, op, K1=4, K2=44, reps=3):
    @jax.jit
    def loop(x, op, K):
        return jax.lax.fori_loop(0, K, lambda i, v: step(v, op), x)
    walls = {}
    for K in (K1, K2):
        sync(loop(x0, op, K))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(loop(x0, op, K))
            best = min(best, time.perf_counter() - t0)
        walls[K] = best
    per = (walls[K2] - walls[K1]) / (K2 - K1)
    print(f"{name:46s} {per*1e3:9.3f} ms/op", flush=True)
    return per


def lane_solve(op, b):
    """Reduced-state scan solve, lane-major layout: inv_t (p,p,nb),
    w_t (p,r,nb).  b natural (nb*p,) -> x natural."""
    inv_t, w_t = op
    p, _, nb = inv_t.shape
    r = w_t.shape[1]
    b_t = b.reshape(nb, p).T                       # (p, nb)
    c = jnp.einsum("ijb,jb->ib", inv_t, b_t)       # (p, nb)
    mr = -w_t[p - r:, :, :]                        # (r, r, nb)
    cr = c[p - r:, None, :]                        # (r, 1, nb)

    def combine(a, bb):
        ma, ca = a
        mb, cb = bb
        return (jnp.einsum("ikb,kjb->ijb", mb, ma),
                jnp.einsum("ikb,kjb->ijb", mb, ca) + cb)

    _, s = jax.lax.associative_scan(combine, (mr, cr), axis=2)
    s = s[:, 0, :]                                 # (r, nb)
    s_prev = jnp.concatenate([jnp.zeros((r, 1), b.dtype), s[:, :-1]], axis=1)
    x = c - jnp.einsum("ijb,jb->ib", w_t, s_prev)
    return x.T.reshape(-1)


def main():
    rng = np.random.default_rng(0)
    n = 1_250_000          # N = n + m of the bench system
    p, r = 16, 8
    nb = n // p
    inv = rng.standard_normal((nb, p, p)).astype(np.float32)
    w = (rng.standard_normal((nb, p, r)) * 0.1).astype(np.float32)
    b = jnp.asarray(rng.standard_normal(nb * p), jnp.float32)

    from cpkrylov_tpu.precond.trisolve import (ReducedScanTriFactor,
                                               reduced_scan_tri_solve)
    tf = ReducedScanTriFactor(inv_diag=jnp.asarray(inv),
                              w_blocks=jnp.asarray(w),
                              n=n, panel=p, r=r)

    inv_t = jnp.asarray(np.ascontiguousarray(inv.transpose(1, 2, 0)))
    w_t = jnp.asarray(np.ascontiguousarray(w.transpose(1, 2, 0)))
    lane_op = (inv_t, w_t)
    # correctness vs reference first
    x_ref = np.asarray(jax.jit(reduced_scan_tri_solve)(tf, b))
    x_lane = np.asarray(jax.jit(lane_solve)(lane_op, b))
    err = np.linalg.norm(x_ref - x_lane) / np.linalg.norm(x_ref)
    print(f"lane vs batch rel diff: {err:.2e}")
    slope("lane-major (p,p,nb) argument", lambda v, op: lane_solve(op, v),
          b, lane_op)

    # variant: skip the output transpose (stay lane-major end to end)
    def lane_solve_nt(op, bt):
        inv_t, w_t = op
        p, _, nb = inv_t.shape
        r = w_t.shape[1]
        c = jnp.einsum("ijb,jb->ib", inv_t, bt)

        def combine(a, bb):
            ma, ca = a
            mb, cb = bb
            return (jnp.einsum("ikb,kjb->ijb", mb, ma),
                    jnp.einsum("ikb,kjb->ijb", mb, ca) + cb)

        mr = -w_t[p - r:, :, :]
        _, s = jax.lax.associative_scan(combine, (mr, c[p - r:, None, :]),
                                        axis=2)
        s = s[:, 0, :]
        s_prev = jnp.concatenate([jnp.zeros((r, 1), bt.dtype), s[:, :-1]],
                                 axis=1)
        return c - jnp.einsum("ijb,jb->ib", w_t, s_prev)
    bt = b.reshape(nb, p).T
    slope("lane-major, no transposes", lambda v, op: lane_solve_nt(op, v),
          bt, lane_op)


if __name__ == "__main__":
    main()
