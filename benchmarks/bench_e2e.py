"""End-to-end solve benchmarks on the attached accelerator.

Prints one JSON line per configuration:
  {"bench": ..., "method": ..., "n": ..., "m": ..., "mode": ...,
   "solved": ..., "iters": ..., "time_s": ..., "nnz_per_s": ...}

Covers BASELINE.md's time-to-tol metric on:
  * the reference's shipped cvxqp1_m fixture (f64 parity mode + f32 mixed),
  * a large banded SQD system (production-scale single-chip run).

Run:  python benchmarks/bench_e2e.py [--large-n 1000000] [--skip-f64-large]
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _emit(**kw):
    print(json.dumps(kw), flush=True)


def _bench_mixed(name, sys_, method, opts, popts, repeats=2):
    from cpkrylov_tpu import solve_mixed
    from cpkrylov_tpu.utils.profiling import work_model

    out = solve_mixed(method, sys_.b, sys_.A, sys_.B, sys_.C, sys_.G,
                      opts=opts, precond_opts=popts)   # warm-up + compile
    best = out.stime
    for _ in range(repeats):
        o = solve_mixed(method, sys_.b, sys_.A, sys_.B, sys_.C, sys_.G,
                        opts=opts, precond_opts=popts)
        best = min(best, o.stime)
    _emit(bench=name, method=method, n=sys_.n, m=sys_.m, mode="mixed-f32",
          solved=bool(out.solved), iters=int(out.niters),
          outer=int(out.nouter), time_s=round(best, 4),
          final_resid=float(out.resid_history[-1]))
    return out


def _bench_f64(name, sys_, method, opts, popts, repeats=2):
    import jax
    jax.config.update("jax_enable_x64", True)
    from cpkrylov_tpu.utils.profiling import profile_solve

    prof = profile_solve(method, sys_.b, sys_.A, sys_.B, sys_.C, sys_.G,
                         opts=opts, precond_opts=popts, repeats=repeats,
                         dtype=np.float64)
    _emit(bench=name, method=method, n=sys_.n, m=sys_.m, mode="f64",
          solved=bool(prof.solved), iters=prof.niters,
          time_s=round(prof.stime, 4),
          nnz_per_s=round(prof.nnz_per_s, 1),
          compile_s=round(prof.compile_time, 2))
    return prof


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--large-n", type=int, default=1_000_000)
    ap.add_argument("--large-m", type=int, default=250_000)
    ap.add_argument("--skip-f64-large", action="store_true")
    ap.add_argument("--skip-fixture", action="store_true")
    args = ap.parse_args()

    import jax
    jax.config.update("jax_enable_x64", True)
    from cpkrylov_tpu import PrecondOptions, SolverOptions
    from cpkrylov_tpu.utils import fixtures

    _emit(bench="device", kind=str(jax.devices()[0].device_kind),
          platform=jax.devices()[0].platform)

    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)

    if not args.skip_fixture:
        f = fixtures.load_fixture("cvxqp1_m")
        _bench_f64("cvxqp1_m", f, "cpminres",
                   SolverOptions(atol=1e-6, rtol=1e-6, itmax=500), popts)
        _bench_mixed("cvxqp1_m", f, "cpminres",
                     SolverOptions(atol=1e-8, rtol=1e-8, itmax=500), popts)

    # Large banded system: production-scale single-chip workload.
    t0 = time.perf_counter()
    big = fixtures.banded_saddle_system(args.large_n, args.large_m,
                                        bandwidth=3, with_oracle=False)
    _emit(bench="large_build", n=big.n, m=big.m,
          nnz=int(big.A.nnz + 2 * big.B.nnz + big.C.nnz),
          build_s=round(time.perf_counter() - t0, 1))
    lopts = SolverOptions(atol=1e-8, rtol=1e-8, itmax=300)
    _bench_mixed("banded_large", big, "cpminres", lopts, popts, repeats=1)
    if not args.skip_f64_large:
        _bench_f64("banded_large", big, "cpminres",
                   SolverOptions(atol=1e-6, rtol=1e-6, itmax=300), popts,
                   repeats=1)


if __name__ == "__main__":
    main()
