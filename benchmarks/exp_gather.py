"""Measure gather/scatter and while_loop overhead — the remaining suspects
for the 10.9 ms/iter observed inside the jitted solve loop."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cpkrylov_tpu.utils.timing import sync  # noqa: E402


def slope(name, op, v0, K1=4, K2=44, reps=4, gbytes=None):
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
    msg = f"{name:44s} {per*1e3:9.3f} ms/op"
    if gbytes:
        msg += f"   {gbytes/per/1e9:7.1f} GB/s"
    print(msg)
    return per


def main():
    rng = np.random.default_rng(0)
    N = 1_250_000

    # 1. random-permutation gather (the FactorApply pin/pout)
    perm = jnp.asarray(rng.permutation(N).astype(np.int32))
    x = jnp.asarray(rng.standard_normal(N), jnp.float32)
    slope("gather perm 1.25M", lambda v: v[perm], x, gbytes=N * 8)

    # 2. near-banded permutation (RCM-like locality)
    loc = np.arange(N) + rng.integers(-64, 64, N)
    loc = np.argsort(loc, kind="stable").astype(np.int32)
    slope("gather local-perm 1.25M", lambda v: v[jnp.asarray(loc)], x,
          gbytes=N * 8)

    # 3. jnp.flip
    slope("flip 1.25M", lambda v: jnp.flip(v), x, gbytes=N * 8)

    # 4. while_loop per-iteration overhead: trivial body
    def wl_overhead(K):
        def f(v):
            def cond(c):
                return c[0] < K
            def body(c):
                return (c[0] + 1, c[1] * jnp.float32(1.000001))
            return jax.lax.while_loop(cond, body, (jnp.int32(0), v))[1]
        return f
    small = jnp.ones(8, jnp.float32)
    walls = {}
    for K in (10, 1010):
        f = jax.jit(wl_overhead(K))
        sync(f(small))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            sync(f(small))
            best = min(best, time.perf_counter() - t0)
        walls[K] = best
    per = (walls[1010] - walls[10]) / 1000
    print(f"{'while_loop trivial body':44s} {per*1e3:9.4f} ms/iter")

    # 5. fori_loop trivial body
    walls = {}
    for K in (10, 1010):
        f = jax.jit(lambda v, K=K: jax.lax.fori_loop(
            0, K, lambda i, w: w * jnp.float32(1.000001), v))
        sync(f(small))
        best = float("inf")
        for _ in range(4):
            t0 = time.perf_counter()
            sync(f(small))
            best = min(best, time.perf_counter() - t0)
        walls[K] = best
    per = (walls[1010] - walls[10]) / 1000
    print(f"{'fori_loop trivial body':44s} {per*1e3:9.4f} ms/iter")


if __name__ == "__main__":
    main()
