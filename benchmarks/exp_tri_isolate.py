"""Isolate the fused trisolve kernel from its XLA I/O glue.

Times (two-point slope, operands as jit arguments):
  a) full pallas_tri_solve (reshape+transpose glue included)
  b) raw pallas_call on pre-transposed (p, nb) operands
  c) the glue alone (reshape+transpose in, transpose+reshape out)
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import scipy.sparse as sp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from cpkrylov_tpu.precond.pallas_tri import (_fused_tri_kernel,
                                             build_pallas_tri,
                                             pallas_tri_solve)
from cpkrylov_tpu.utils.timing import sync


def slope(fn, args, k1=50, k2=250):
    @functools.partial(jax.jit, static_argnames=("k",))
    def g(args, v, k):
        def body(i, w):
            return fn(args, w + jnp.float32(1e-30) * i)
        return jax.lax.fori_loop(0, k, body, v)

    v0 = args[-1]
    ts = {}
    for k in (k1, k2):
        sync(g(args[:-1], v0, k))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(g(args[:-1], v0, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1)


def banded_lower(n, reach, seed=0):
    rng = np.random.default_rng(seed)
    diags = [np.full(n, 2.0)]
    offs = [0]
    for k in range(1, reach + 1):
        diags.append(rng.standard_normal(n - k) * 0.3)
        offs.append(-k)
    return sp.diags(diags, offs, format="csr")


def main():
    N = 1_250_000
    T = banded_lower(N, 1, seed=1)
    out = {}
    for p in (8, 16):
        tf = build_pallas_tri(T, panel=p, dtype=np.float32)
        K = tf.chunk
        nb_pad = tf.inv_t.shape[2]
        x0 = jnp.asarray(np.random.default_rng(0)
                         .standard_normal(N).astype(np.float32))

        per_full = slope(lambda a, v: pallas_tri_solve(a[0], v), (tf, x0))

        kern = functools.partial(_fused_tri_kernel, p=p, r=tf.r, K=K)

        def raw(a, bt):
            tfa = a[0]
            return pl.pallas_call(
                kern,
                grid=(nb_pad // K,),
                in_specs=[
                    pl.BlockSpec((p, p, K), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((p, tf.r, K), lambda i: (0, 0, i),
                                 memory_space=pltpu.VMEM),
                    pl.BlockSpec((p, K), lambda i: (0, i),
                                 memory_space=pltpu.VMEM),
                ],
                out_specs=pl.BlockSpec((p, K), lambda i: (0, i),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((p, nb_pad), jnp.float32),
                scratch_shapes=[pltpu.VMEM((tf.r, 128), jnp.float32)],
            )(tfa.inv_t, tfa.w_t, bt)

        bt0 = jnp.zeros((p, nb_pad), jnp.float32)
        per_raw = slope(lambda a, v: raw(a, v), (tf, bt0))

        def glue(_, v):
            bt = (jnp.zeros(nb_pad * p, jnp.float32).at[:N].set(v)
                  .reshape(nb_pad, p).T)
            return bt.T.reshape(-1)[:N]

        per_glue = slope(glue, ((), x0))

        mb = (tf.device_bytes + 2 * 4 * N) / 1e6
        out[f"p{p}"] = {
            "full_ms": round(per_full * 1e3, 4),
            "raw_kernel_ms": round(per_raw * 1e3, 4),
            "glue_ms": round(per_glue * 1e3, 4),
            "bytes_mb": round(mb, 1),
            "raw_gbps": round(mb * 1e6 / per_raw / 1e9, 1),
        }
        print(p, out[f"p{p}"], flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
