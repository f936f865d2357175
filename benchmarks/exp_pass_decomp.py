"""Decompose the device-resident mixed solve's per-PASS fixed cost.

In-program fori repetition (two-point slope over R) of each pipeline
stage on the bench system: the factor solve, the lean M apply, the df64
outer residual matvec, the shift+init-only solve core (itmax=0), and the
full outer pass.  Identifies where the ~2 ms per-pass fixed cost lives
(round-5: passes are 40% of the steady-state solve after the bidiag
trisolve landed).
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import dataclasses as dc

import jax
import jax.numpy as jnp

from cpkrylov_tpu import PrecondOptions, SolverOptions
from cpkrylov_tpu.driver import _solve_core_impl
from cpkrylov_tpu.mixed import (_lean_inner_options, _mixed_device_core_impl,
                                prepare_mixed_device)
from cpkrylov_tpu.precond.cp import make_preconditioner
from cpkrylov_tpu.utils import fixtures
from cpkrylov_tpu.utils.timing import sync


def slope(make_g, k1=20, k2=100):
    ts = {}
    for k in (k1, k2):
        g = make_g(k)
        sync(g())
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(g())
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    return (ts[k2] - ts[k1]) / (k2 - k1)


def main():
    n, m = 1_000_000, 250_000
    sysm = fixtures.banded_saddle_system(n, m, bandwidth=3, with_oracle=False)
    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)
    opts = SolverOptions(atol=0.0, rtol=1e-6, itmax=200, stagwin=25)
    M = make_preconditioner(sysm.G, sysm.B, sysm.C, options=popts,
                            dtype=np.float32)
    solver = prepare_mixed_device(
        "cpminres", sysm.b, sysm.A, sysm.B, sysm.C,
        _lean_inner_options(M, True), opts, inner_stagwin=25)
    b_hi, b_lo, Kdf, A_op, C_op, B_op, M32 = solver.args
    method = solver.method
    N = n + m
    out = {}

    def vec_chain(fn):
        def make(k):
            @jax.jit
            def g(v, *rest):
                def body(i, w):
                    return fn(w + jnp.float32(1e-30) * i, *rest)
                return jax.lax.fori_loop(0, k, body, v)
            return functools.partial(g, b_hi, *())
        return make

    # 1. factor solve
    out["factor_solve_ms"] = round(slope(vec_chain(
        lambda w: M32.factor.solve(w))) * 1e3, 3)

    # 2. lean M.apply (state carried)
    def apply_fn(w):
        st = M32.init_state(w.dtype)
        _, y, _ = M32.apply(st, w)
        return y
    out["m_apply_lean_ms"] = round(slope(vec_chain(apply_fn)) * 1e3, 3)

    # 3. df64 outer residual matvec
    def kdf_fn(w):
        yh, yl = Kdf.matvec((w, jnp.zeros_like(w)))
        return yh + 1e-30 * yl
    out["kdf_matvec_ms"] = round(slope(vec_chain(kdf_fn)) * 1e3, 3)

    # 4. solve core with itmax=0 (shift + kernel init + unshift only)
    opts0 = dc.replace(solver.inner_opts, itmax=0, rtol=0.0, atol=0.0,
                       stagwin=0)

    def core0(w):
        res, x1, x2 = _solve_core_impl(method, w, A_op, C_op, B_op, M32,
                                       opts0, True)
        return jnp.concatenate([x1, x2]) + res.resid_history[0] * 0
    out["solve_core_itmax0_ms"] = round(slope(vec_chain(core0)) * 1e3, 3)

    # 5. one full outer pass, itmax=0 inner
    def pass0(w):
        xh, xl, hist, it, kk, sv = _mixed_device_core_impl(
            method, w, b_lo, Kdf, A_op, C_op, B_op, M32, opts0,
            np.float32(0.0), 1)
        return xh + hist[kk] * 0
    out["outer_pass_itmax0_ms"] = round(slope(vec_chain(pass0)) * 1e3, 3)

    # 6. one full outer pass with 3 inner iters (marginal anchor)
    opts3 = dc.replace(opts0, itmax=3)

    def pass3(w):
        xh, xl, hist, it, kk, sv = _mixed_device_core_impl(
            method, w, b_lo, Kdf, A_op, C_op, B_op, M32, opts3,
            np.float32(0.0), 1)
        return xh + hist[kk] * 0
    out["outer_pass_itmax3_ms"] = round(slope(vec_chain(pass3)) * 1e3, 3)
    out["marginal_per_iter_ms"] = round(
        (out["outer_pass_itmax3_ms"] - out["outer_pass_itmax0_ms"]) / 3, 3)

    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
