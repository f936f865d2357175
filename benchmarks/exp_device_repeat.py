"""Device-only per-solve time via IN-PROGRAM repetition.

CAVEAT (round-5 finding, after this script's first use): index-only
perturbation (b + i * 1e-30) leaves chain iterations data-independent, so
the scheduler can overlap adjacent solves and the slope can exceed the
serial rate (even HBM peak for small working sets).  bench.py's
overhead_decomposition now uses STRICTLY SERIAL chains (rhs depends on
the previous output); this script is kept for the pipelined-throughput
view, which is also what the dispatch-slope steady state measures.

The pipelined-dispatch slope (bench.py steady state) includes the
per-dispatch host cost of the axon tunnel (arg serialization + RPC),
which round-5 capped-iteration runs exposed as ~13 ms/dispatch — an
artifact a metal-attached chip does not pay per launch (~100 us).  This
experiment removes it entirely: one jitted program runs the WHOLE
device-resident mixed solve R times (fori_loop), so a two-point slope
over R measures pure device execution per solve.

The loop body perturbs b_hi by i * 1e-30 (a denormal-scale no-op for
convergence) so XLA cannot hoist the loop-invariant solve out of the
fori_loop.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

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
    assert solver is not None
    method = solver.method
    args = solver.args
    inner_opts = solver.inner_opts
    stop = solver.args_stop
    max_outer = solver.max_outer

    def run_R(R):
        @jax.jit
        def g(b_hi, b_lo, Kdf, A_op, C_op, B_op, Mp):
            def body(i, acc):
                bh = b_hi + jnp.float32(1e-30) * i   # defeat hoisting
                xh, xl, hist, it, k, solved = _mixed_device_core_impl(
                    method, bh, b_lo, Kdf, A_op, C_op, B_op, Mp,
                    inner_opts, stop, max_outer)
                return acc + xh[0] + hist[k] + it.sum().astype(jnp.float32)
            return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
        return g

    out = {}

    # Device marginal per INNER iteration + device fixed per pass: capped
    # variants (rtol=0 forces exactly itmax iterations, max_outer=1) run
    # R times in-program; slopes over (R, itmax).
    import dataclasses as dc
    cap_walls = {}
    for cap in (3, 13):
        iopts = dc.replace(inner_opts, atol=0.0, rtol=0.0, itmax=cap,
                           stagwin=0)

        def run_cap(R, iopts=iopts):
            @jax.jit
            def g(b_hi, b_lo, Kdf, A_op, C_op, B_op, Mp):
                def body(i, acc):
                    bh = b_hi + jnp.float32(1e-30) * i
                    xh, xl, hist, it, k, solved = _mixed_device_core_impl(
                        method, bh, b_lo, Kdf, A_op, C_op, B_op, Mp,
                        iopts, np.float32(0.0), 1)
                    return acc + xh[0] + hist[k] + it.sum().astype(jnp.float32)
                return jax.lax.fori_loop(0, R, body, jnp.float32(0.0))
            return g

        ws = {}
        for R in (1, 5):
            g = run_cap(R)
            sync(g(*args))
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                sync(g(*args))
                best = min(best, time.perf_counter() - t0)
            ws[R] = best
        cap_walls[cap] = (ws[5] - ws[1]) / 4
        out[f"device_per_pass_cap{cap}_ms"] = round(cap_walls[cap] * 1e3, 3)
    per_iter = (cap_walls[13] - cap_walls[3]) / 10
    out["device_marginal_per_iter_ms"] = round(per_iter * 1e3, 3)
    out["device_fixed_per_pass_ms"] = round(
        (cap_walls[3] - 3 * per_iter) * 1e3, 3)

    walls = {}
    for R in (1, 5):
        g = run_R(R)
        sync(g(*args))                       # compile
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(g(*args))
            best = min(best, time.perf_counter() - t0)
        walls[R] = best
        out[f"wall_R{R}_s"] = round(best, 4)
    per_solve = (walls[5] - walls[1]) / 4
    out["device_only_per_solve_ms"] = round(per_solve * 1e3, 3)

    # reference: the dispatch-slope number for comparison
    sync(solver.dispatch())
    dwalls = {}
    for S in (1, 9):
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            outs = [solver.dispatch() for _ in range(S)]
            sync(outs[-1][0])
            best = min(best, time.perf_counter() - t0)
        dwalls[S] = best
    out["dispatch_slope_per_solve_ms"] = round((dwalls[9] - dwalls[1]) / 8 * 1e3, 3)

    # and what the solve actually did
    xh, xl, hist, it, k, solved = jax.device_get(solver.dispatch())
    out["inner_iters"] = [int(v) for v in it if v]
    out["outer_passes"] = int(k)
    out["solved"] = bool(solved)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
