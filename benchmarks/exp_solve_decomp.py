"""Slope-time the REAL production hot-loop stages at bench scale (n=1M).

Two-point slope methodology (t(K2)-t(K1))/(K2-K1) with the operand pytree
passed as a jit argument, cancelling the ~40 ms tunnel round trip that
polluted DEVICE_MICRO r3.  Decomposes M.apply stage by stage to find where
the observed ~10.9 ms/iter of the jitted solve loop actually goes.
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
        # Traced bound -> ONE compile serves both chain lengths.
        return jax.lax.fori_loop(0, K, lambda i, v: step(v, op), x,
                                 unroll=False)
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


def main():
    from cpkrylov_tpu import PrecondOptions
    from cpkrylov_tpu.driver import _maybe_pack_pgell
    from cpkrylov_tpu.ops import spmv
    from cpkrylov_tpu.precond.cp import make_preconditioner
    from cpkrylov_tpu.precond.trisolve import tri_solve
    from cpkrylov_tpu.utils import fixtures

    dtype = np.float32
    n, m = 1_000_000, 250_000
    N = n + m
    sysm = fixtures.banded_saddle_system(n, m, bandwidth=3, with_oracle=False)
    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)
    t0 = time.perf_counter()
    M = make_preconditioner(sysm.G, sysm.B, sysm.C, options=popts,
                            dtype=dtype)
    print(f"ptime {time.perf_counter()-t0:.1f}s  "
          f"pin={type(M.factor.pin).__name__} "
          f"pout={type(M.factor.pout).__name__} "
          f"tf1={type(M.factor.tf1).__name__} "
          f"kp={type(M.kp).__name__} factor_nitref={M.factor_nitref}")
    fa = M.factor
    if hasattr(fa.pin, "second"):
        print(f"  pin composed: {type(fa.pin.first).__name__} + "
              f"{type(fa.pin.second).__name__}")
        if hasattr(fa.pin.second, "offsets"):
            print(f"  residual DiaPermute ndiag={len(fa.pin.second.offsets)}"
                  f" / inv {len(fa.pin.second.inv_offsets)}")

    a_dev = _maybe_pack_pgell(sysm.A, "auto", 2048, dtype)
    print(f"a_dev={type(a_dev).__name__}")
    x_n = jnp.ones(n, dtype)
    x_N = jnp.ones(N, dtype)

    slope("A spmv (packed)", lambda v, op: spmv.matvec(op, v), x_n, a_dev)
    slope("KP spmv", lambda v, op: spmv.matvec(op, v), x_N, M.kp)
    slope("pin.apply", lambda v, op: op.pin.apply(v), x_N, fa)
    slope("pout.apply_inv", lambda v, op: op.pout.apply_inv(v), x_N, fa)
    slope("tf1 trisolve", lambda v, op: tri_solve(op.tf1, v), x_N, fa)
    slope("tf2 trisolve", lambda v, op: tri_solve(op.tf2, v), x_N, fa)
    slope("dinv scale", lambda v, op: op._apply_dinv(v), x_N, fa)
    slope("factor.solve (full)", lambda v, op: op.solve(v), x_N, fa)
    slope("M._direct_solve", lambda v, op: op._direct_solve(v), x_N, M)

    # Full lean M.apply (as used by the mixed inner solve)
    import dataclasses as dc
    lean = dc.replace(M, options=dc.replace(
        M.options, nitref=0, force_itref=False, residual_update=False))

    def apply_lean(v, op):
        st = op.init_state(v.dtype)
        _, y, _ = op.apply(st, v)
        return y
    slope("M.apply lean", apply_lean, x_N, lean)

    def apply_full(v, op):
        st = op.init_state(v.dtype)
        _, y, _ = op.apply(st, v)
        return y
    slope("M.apply GHN+itref1", apply_full, x_N, M, K1=2, K2=12)


if __name__ == "__main__":
    main()
