"""Profiling / tracing / observability for solves (SURVEY.md §5).

The reference's only instrumentation is ``tic/toc`` around the
preconditioner build and the solve (reg_cpkrylov.m:128-132, 150, 175-178).
Here profiling is a first-class subsystem:

* ``trace(logdir)`` — ``jax.profiler`` trace context for TensorBoard /
  Perfetto inspection of the compiled solve (XLA op-level timeline).
* ``profile_solve(...)`` — compile-excluded wall-clock timing of a solve
  with an nnz-based work model: reports iterations/s and effective nnz/s
  (the north-star throughput metric) from the per-iteration cost breakdown
  of SURVEY.md §3.2 (2 SpMVs + 1 preconditioner application + refinement).
* ``work_model(...)`` — the static per-iteration work accounting itself,
  usable on its own for roofline estimates.
"""
from __future__ import annotations

import contextlib
import dataclasses
import time

import numpy as np


@contextlib.contextmanager
def trace(logdir: str):
    """``jax.profiler`` trace over the enclosed block (device timeline)."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass(frozen=True)
class WorkModel:
    """Static per-iteration work in nonzeros touched (SURVEY.md §3.2)."""

    nnz_a: int              # A*v
    nnz_c: int              # C*q
    nnz_factor: int         # one direct solve: trisolves + diag + perms
    nnz_kp: int             # one K_P SpMV (refinement residual / GHN cache)
    solves_per_iter: float  # direct solves per iteration (incl. refinement)
    kp_spmv_per_iter: float

    @property
    def nnz_per_iter(self) -> float:
        return (self.nnz_a + self.nnz_c
                + self.solves_per_iter * self.nnz_factor
                + self.kp_spmv_per_iter * self.nnz_kp)


def _factor_nnz(M) -> int:
    """Arithmetic volume of one direct solve (each trisolve factor reports
    its own work model: ELL off-panels + dense panels, or scan levels).

    A distributed SchurFactor runs TWO local solves plus the interface
    correction per application (schur.py SchurFactor.solve); its work is
    summed over the device stack."""
    import jax

    f = M.factor
    if hasattr(f, "local_factor"):          # parallel.schur.SchurFactor
        lf0 = jax.tree_util.tree_map(lambda a: a[0], f.local_factor)
        ndev = int(f.a_ds_data.shape[0])
        local = lf0.tf1.work_nnz + lf0.tf2.work_nnz + lf0.dinv.shape[0]
        ads = int(np.prod(f.a_ds_data.shape[1:]))
        return ndev * (2 * local + 2 * ads) + int(f.s) * int(f.s)
    return f.tf1.work_nnz + f.tf2.work_nnz + f.dinv.shape[0]


def work_model(M, nnz_a: int, nnz_c: int) -> WorkModel:
    """Work model for a solve with preconditioner ``M`` (CPPrecond)."""
    opts = M.options
    # Each direct solve internally runs factor_nitref refinement passes
    # (cp.py _direct_solve), each costing one K_P SpMV + one factor solve.
    per_direct_solves = 1 + M.factor_nitref
    per_direct_kp = M.factor_nitref
    # The kernel performs one M.apply per iteration; opts.nitref adds up to
    # nitref outer refinement passes (always taken when force_itref).
    outer = opts.nitref if opts.force_itref else 0
    kp_spmv = per_direct_kp * (1 + outer) + (1 if opts.nitref > 0 else 0) \
        + outer + (1 if opts.residual_update else 0)
    return WorkModel(
        nnz_a=int(nnz_a), nnz_c=int(nnz_c),
        nnz_factor=_factor_nnz(M), nnz_kp=int(M.kp.nnz),
        solves_per_iter=float(per_direct_solves * (1 + outer)),
        kp_spmv_per_iter=float(kp_spmv),
    )


@dataclasses.dataclass(frozen=True)
class SolveProfile:
    """Measured solve performance (compile time excluded)."""

    method: str
    niters: int
    solved: bool
    ptime: float            # preconditioner build (host factorization)
    compile_time: float     # first-call tracing + XLA compilation
    stime: float            # steady-state solve wall clock (best of repeats)
    iters_per_s: float
    nnz_per_s: float        # work-model nnz / stime — north-star metric
    work: WorkModel

    def summary(self) -> str:
        return (f"{self.method}: {self.niters} iters in {self.stime:.4f}s "
                f"({self.iters_per_s:.1f} it/s, {self.nnz_per_s:.3g} nnz/s; "
                f"compile {self.compile_time:.2f}s, "
                f"precond build {self.ptime:.2f}s)")


def profile_solve(method, b, A, B, C, G, *, opts=None, precond_opts=None,
                  repeats: int = 3, trace_dir: str | None = None,
                  **solve_kwargs) -> SolveProfile:
    """Profile ``cpkrylov_tpu.solve``: warm-up (compile), then timed runs.

    The first call pays XLA compilation (reported separately as
    ``compile_time``); ``stime`` is the best of ``repeats`` subsequent runs.
    When ``trace_dir`` is given, one traced run is captured for TensorBoard.
    """
    import scipy.sparse as sp

    from ..driver import solve
    from ..precond.cp import make_preconditioner

    dtype = solve_kwargs.get("dtype") or np.asarray(b).dtype
    t0 = time.perf_counter()
    M = make_preconditioner(G, B, C, options=precond_opts, dtype=dtype)
    ptime = time.perf_counter() - t0

    out0 = solve(method, b, A, B, C, G, opts=opts,
                 precond_opts=precond_opts, M=M, **solve_kwargs)
    compile_time = out0.stime  # first call includes tracing + compilation
    best = float("inf")
    for _ in range(max(1, repeats)):
        t1 = time.perf_counter()
        out = solve(method, b, A, B, C, G, opts=opts,
                    precond_opts=precond_opts, M=M, **solve_kwargs)
        best = min(best, time.perf_counter() - t1)
    if trace_dir is not None:
        with trace(trace_dir):
            solve(method, b, A, B, C, G, opts=opts,
                  precond_opts=precond_opts, M=M, **solve_kwargs)

    nnz_a = A.nnz if sp.issparse(A) else int(np.count_nonzero(
        np.asarray(A))) if hasattr(A, "__array__") else 0
    nnz_c = C.nnz if sp.issparse(C) else int(np.count_nonzero(np.asarray(C)))
    work = work_model(M, nnz_a, nnz_c)

    niters = int(out.niters)
    return SolveProfile(
        method=method if isinstance(method, str) else method.__name__,
        niters=niters, solved=bool(out.solved), ptime=ptime,
        compile_time=compile_time, stime=best,
        iters_per_s=niters / best if best > 0 else float("inf"),
        nnz_per_s=niters * work.nnz_per_iter / best if best > 0 else 0.0,
        work=work,
    )
