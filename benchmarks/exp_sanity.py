"""Sanity-check the slope-timing methodology against known hardware rates.

v5e: ~197 TFLOP/s bf16 / ~49 TFLOP/s f32 MXU, ~819 GB/s HBM.  If slope
timing is honest, a big matmul chain should land near the FLOP ceiling and
a big-array axpy chain near the HBM ceiling.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cpkrylov_tpu.utils.timing import sync  # noqa: E402


def slope(name, op, v0, K1, K2, reps=4, flops=None, gbytes=None):
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
    msg = f"{name:40s} {per*1e3:9.3f} ms/op"
    if flops:
        msg += f"   {flops/per/1e12:7.2f} TFLOP/s"
    if gbytes:
        msg += f"   {gbytes/per/1e9:7.1f} GB/s"
    print(msg)
    return per


def main():
    rng = np.random.default_rng(0)

    # 1. f32 matmul 4096^3: 137 GFLOP/op
    a = jnp.asarray(rng.standard_normal((4096, 4096)), jnp.float32)
    slope("matmul f32 4096^3", lambda v: a @ v, a, 2, 12,
          flops=2 * 4096**3)

    # 2. bf16 matmul
    ab = a.astype(jnp.bfloat16)
    slope("matmul bf16 4096^3", lambda v: (a @ v.astype(jnp.float32)).astype(jnp.bfloat16), ab, 2, 12,
          flops=2 * 4096**3)

    # 3. axpy on 200 MB (can't cache): r+w = 400 MB/op
    big = jnp.asarray(rng.standard_normal(50_000_000), jnp.float32)
    slope("axpy 50M f32 (400MB rw)",
          lambda v: v * jnp.float32(1.0000001) + jnp.float32(0.5),
          big, 4, 44, gbytes=4e8)

    # 4. sum-reduce 200 MB: read 200MB/op -> chain via scalar add trick
    def red(v):
        s = jnp.sum(v)
        return v + s * jnp.float32(1e-30)
    slope("sum+axpy 50M f32 (600MB rw)", red, big, 4, 44, gbytes=6e8)

    # 5. the 28MB axpy again at bigger K spread
    data = jnp.asarray(rng.standard_normal((7, 1_000_000)), jnp.float32)
    slope("axpy 7M f32 (56MB rw)",
          lambda v: v * jnp.float32(1.0000001) + jnp.float32(0.5),
          data, 10, 1010, gbytes=56e6)


if __name__ == "__main__":
    main()
