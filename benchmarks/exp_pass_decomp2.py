"""Verified per-pass / per-iteration decomposition of the device solve.

Measurement rules learned the hard way this round:
* output-fed chains (feeding a solve's solution back as the next rhs)
  change CONVERGENCE behavior — capped inner loops may break down after
  one iteration on the weird rhs, making marginals look ~0;
* index-perturbed rhs (b + i * 1e-30, which rounds to b exactly in f32)
  keeps every chain step numerically identical while preventing XLA from
  hoisting the loop body;
* every variant's actual inner-iteration count is FETCHED from the same
  program before its slope is trusted.
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
from cpkrylov_tpu.mixed import (_lean_inner_options, _mixed_device_core_impl,
                                prepare_mixed_device)
from cpkrylov_tpu.precond.cp import make_preconditioner
from cpkrylov_tpu.utils import fixtures
from cpkrylov_tpu.utils.timing import sync


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
    out = {}

    def variant(iopts, stop, max_outer):
        def run(bh):
            return _mixed_device_core_impl(
                method, bh, b_lo, Kdf, A_op, C_op, B_op, M32, iopts,
                stop, max_outer)

        @functools.partial(jax.jit, static_argnames=("k",))
        def chain(k):
            def body(i, acc):
                xh, xl, hist, it, kk, sv = run(b_hi + jnp.float32(1e-30) * i)
                return acc + xh[0] + hist[kk] + it.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, k, body, jnp.float32(0.0))

        # verify what this variant actually executes
        _, _, _, it, kk, _ = jax.device_get(jax.jit(run)(b_hi))
        iters = [int(v) for v in it[: int(kk)]]
        ts = {}
        for k in (20, 100):
            sync(chain(k))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                sync(chain(k))
                best = min(best, time.perf_counter() - t0)
            ts[k] = best
        return (ts[100] - ts[20]) / 80, iters

    lean0 = dc.replace(solver.inner_opts, atol=0.0, rtol=0.0, itmax=0,
                       stagwin=0)
    t0_, it0 = variant(lean0, np.float32(0.0), 1)
    out["pass_itmax0"] = {"ms": round(t0_ * 1e3, 3), "iters": it0}
    t7_, it7 = variant(dc.replace(lean0, itmax=7), np.float32(0.0), 1)
    out["pass_itmax7"] = {"ms": round(t7_ * 1e3, 3), "iters": it7}
    ran7 = sum(it7)
    out["marginal_per_iter_ms"] = round((t7_ - t0_) / max(ran7, 1) * 1e3, 3)
    tf_, itf = variant(solver.inner_opts, solver.args_stop,
                       solver.max_outer)
    out["full_solve"] = {"ms": round(tf_ * 1e3, 3), "iters": itf}
    fixed = t0_
    marg = (t7_ - t0_) / max(ran7, 1)
    model = len(itf) * fixed + sum(itf) * marg
    out["model_check_ms"] = round(model * 1e3, 3)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
