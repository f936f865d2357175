"""Trisolve kernel efficiency vs panel size on the bench factor.

The fused Pallas trisolve reads inv_t (N*p*4 bytes) + w_t per solve; the
panel hugs the reach (p0 = 16 today).  This experiment slope-times the
kernel at p = 8/16/32 on the REAL bench K_P factor to find which layout
runs closest to the 652 GB/s measured streaming ceiling — the factor read
is the largest single term of the per-iteration byte budget.
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

from cpkrylov_tpu.precond import ldl_host
from cpkrylov_tpu.precond.cp import assemble_kp, make_preconditioner
from cpkrylov_tpu.precond.pallas_tri import build_pallas_tri, pallas_tri_solve
from cpkrylov_tpu.utils import fixtures
from cpkrylov_tpu.utils.timing import sync


def slope(solve_fn, tf, x, k1=50, k2=250):
    """Two-point slope with the factor passed as a jit ARGUMENT — a closure
    constant may be repacked by XLA and measures a different layout."""
    @functools.partial(jax.jit, static_argnames=("k",))
    def g(tf, v, k):
        def body(i, w):
            return solve_fn(tf, w + jnp.float32(1e-30) * i)
        return jax.lax.fori_loop(0, k, body, v)

    ts = {}
    for k in (k1, k2):
        sync(g(tf, x, k))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(g(tf, x, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1)


def main():
    n, m = 1_000_000, 250_000
    sysm = fixtures.banded_saddle_system(n, m, bandwidth=3, with_oracle=False)
    M = make_preconditioner(sysm.G, sysm.B, sysm.C, dtype=np.float32)
    tf1 = M.factor.tf1
    print("current tf1:", type(tf1).__name__,
          "p", tf1.panel, "r", tf1.r, "nb", tf1.nb,
          "bytes", tf1.device_bytes, flush=True)

    # Rebuild the triangular matrix the factor solves (L + I, factor order)
    ksp = assemble_kp(sysm.G, sysm.B, sysm.C)
    N = ksp.shape[0]
    signs = np.concatenate([np.ones(n), -np.ones(m)])
    from cpkrylov_tpu.precond.permute import interleave_candidates
    from cpkrylov_tpu.precond.cp import _perm_bandwidth
    base = None
    best_bw = None
    for cand in interleave_candidates(n, m):
        bw = _perm_bandwidth(ksp, cand.perm)
        if bw <= 128 and (best_bw is None or bw < best_bw):
            best_bw, base = bw, cand
    fac = ldl_host.factorize(ksp, ordering=base.perm if base is not None
                             else "rcm", pivot_signs=signs)
    L1 = (fac.L + sp.identity(N, format="csc")).tocsr()
    coo = L1.tocoo()
    reach = int((coo.row - coo.col).max())
    print("factor reach", reach, flush=True)

    out = {"reach": reach}
    x = jnp.asarray(np.random.default_rng(0).standard_normal(N)
                    .astype(np.float32))
    for p in (8, 16, 32):
        if reach > p:
            out[f"p{p}"] = "reach exceeds panel"
            continue
        tf = build_pallas_tri(L1, panel=p, dtype=np.float32)
        if tf is None:
            out[f"p{p}"] = "build rejected"
            continue
        per = slope(pallas_tri_solve, tf, x)
        byts = tf.device_bytes + 2 * 4 * N
        out[f"p{p}"] = {
            "r": tf.r, "ms": round(per * 1e3, 4),
            "bytes_mb": round(byts / 1e6, 1),
            "gbps": round(byts / per / 1e9, 1),
        }
        print(p, out[f"p{p}"], flush=True)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
