"""Per-phase dissection of the flagship bench workload (VERDICT r2 item 2).

Splits the bench wall clock into host phases (fixture build, factorization,
device packing, PGELL pack of A) and *warm device* phases (A SpMV, K_P SpMV,
factor trisolve pair, full preconditioner apply, whole warm solve), each
measured with a jitted K-rep dependence chain so the ~35-40 ms axon-tunnel
sync latency amortizes away.

Writes benchmarks/PROFILE_PHASES.json and prints the table.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def timed(label, fn, record):
    t0 = time.perf_counter()
    out = fn()
    dt = time.perf_counter() - t0
    record[label] = round(dt, 4)
    print(f"  [host] {label:<34s} {dt*1e3:10.1f} ms", flush=True)
    return out


def time_device(label, step, x0, op, record, reps=60):
    """Time a (y, op)->y device op with a jitted dependence chain of `reps`
    calls.  The operand pytree is a jit ARGUMENT — closing over it would
    bake the arrays into the HLO as constants and overflow the axon
    remote_compile request at production sizes."""
    import jax
    from cpkrylov_tpu.utils.timing import sync

    @jax.jit
    def loop(x, o, k):
        return jax.lax.fori_loop(0, k, lambda i, v: step(v, o), x)

    # Two-point slope: cancels the ~40 ms tunnel dispatch+fetch cost that
    # polluted the round-3 numbers (single synced call divided by reps).
    k1, k2 = max(2, reps // 5), reps * 2
    sync(loop(x0, op, k1))           # compile + first run
    walls = {}
    for k in (k1, k2):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(loop(x0, op, k))
            best = min(best, time.perf_counter() - t0)
        walls[k] = best
    dt = max((walls[k2] - walls[k1]) / (k2 - k1), 1e-9)
    record[label] = round(dt * 1e3, 4)
    print(f"  [dev ] {label:<34s} {dt*1e3:10.3f} ms/call", flush=True)
    return dt


def main() -> None:
    import jax
    import jax.numpy as jnp

    from cpkrylov_tpu import PrecondOptions, SolverOptions
    from cpkrylov_tpu.driver import _maybe_pack_pgell, _solve_core
    from cpkrylov_tpu.operators.linop import aslinearoperator
    from cpkrylov_tpu.ops import spmv
    from cpkrylov_tpu.ops.formats import csr_from_scipy
    from cpkrylov_tpu.precond.cp import make_preconditioner
    from cpkrylov_tpu.utils import fixtures
    from cpkrylov_tpu.utils.timing import sync

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = np.float32 if on_tpu else np.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    n, m = (1_000_000, 250_000) if on_tpu else (100_000, 25_000)

    host = {}
    devrec = {}
    print(f"device={dev.device_kind} n={n} m={m} dtype={np.dtype(dtype).name}")

    sysm = timed("fixture_build", lambda: fixtures.banded_saddle_system(
        n, m, bandwidth=3, with_oracle=False), host)

    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)
    M = timed("make_preconditioner(total)", lambda: make_preconditioner(
        sysm.G, sysm.B, sysm.C, options=popts, dtype=dtype), host)
    host["factor_nitref"] = M.factor_nitref
    host["tf1_kind"] = type(M.factor.tf1).__name__
    host["tf2_kind"] = type(M.factor.tf2).__name__
    host["kp_format"] = type(M.kp).__name__

    a_dev = timed("pack_A_pgell(host+transfer)", lambda: _maybe_pack_pgell(
        sysm.A, "auto", 2048, dtype), host)
    if a_dev is None:
        a_dev = csr_from_scipy(sysm.A.tocsr(), dtype=dtype)
    host["a_format"] = type(a_dev).__name__
    timed("device_put_sync(A)", lambda: sync(
        jax.tree_util.tree_leaves(a_dev)[0]), host)

    c_dev = csr_from_scipy(sysm.C.tocsr(), dtype=dtype)
    b_dev = jnp.asarray(sysm.b, dtype=dtype)
    N = n + m

    # --- warm device phases -------------------------------------------------
    x_n = jnp.ones(n, dtype)
    x_N = jnp.ones(N, dtype)

    t_a = time_device("A_spmv", lambda v, mt: spmv.matvec(mt, v), x_n,
                      a_dev, devrec)
    t_kp = time_device("KP_spmv", lambda v, kp: spmv.matvec(kp, v), x_N,
                       M.kp, devrec)
    t_f = time_device("factor_solve(2 trisolves)",
                      lambda v, fa: fa.solve(v), x_N, M.factor, devrec)
    mstate = M.init_state(dtype)

    def apply_step(v, mm):
        _, y, _ = mm.apply(mstate, v)
        return y

    t_ap = time_device("M_apply(full, nitref=1 forced)", apply_step, x_N,
                       M, devrec, reps=30)
    # Reduction cost: one coupled dot (the recurrences do ~4-6 of these
    # per iteration) — broadcast back so the chain stays y->y.
    t_dot = time_device(
        "coupled_dot(1.25M)",
        lambda v, _: v * (jnp.vdot(v[:n], v[:n])
                          + jnp.vdot(v[n:], v[n:])) * 1e-30 + v,
        x_N, None, devrec)

    # --- whole warm solve (A prepacked, M prebuilt) -------------------------
    A_op = aslinearoperator(a_dev, dtype=dtype)
    C_op = aslinearoperator(c_dev, dtype=dtype)
    B_op = aslinearoperator(sysm.B, dtype=dtype)
    # Loose-stop forced-iteration leg (rtol=1e-4 recurrence estimate):
    # f32 exits on the indefiniteness guard near its floor — recorded with
    # istatus for context; the CONVERGING production path is bench.py's
    # device-resident mixed solve at rtol=1e-6.
    opts = SolverOptions(atol=0.0, rtol=1e-4, itmax=50, stagwin=25)

    res, x1, x2 = _solve_core("cpminres", b_dev, A_op, C_op, B_op, M, opts,
                              True)
    sync(x1)
    iters = int(res.niters)
    t0 = time.perf_counter()
    res, x1, x2 = _solve_core("cpminres", b_dev, A_op, C_op, B_op, M, opts,
                              True)
    sync(x1)
    t_solve = time.perf_counter() - t0
    devrec["warm_solve_total_ms"] = round(t_solve * 1e3, 2)
    devrec["warm_solve_iters"] = iters
    devrec["warm_solve_ms_per_iter"] = round(t_solve / max(iters, 1) * 1e3, 3)
    devrec["warm_solve_istatus"] = int(res.istatus)
    hist = np.asarray(res.resid_history)
    devrec["final_rel_resid"] = float(hist[~np.isnan(hist)][-1]
                                      / hist[0]) if hist.size else None
    print(f"  [dev ] warm solve: {iters} iters, {t_solve*1e3:.1f} ms total, "
          f"{t_solve/max(iters,1)*1e3:.2f} ms/iter, istatus={res.istatus}")

    # Model: expected per-iteration device time from measured phase times.
    solves = 1 + popts.nitref          # direct apply + forced itref pass
    model = (t_a + 2 * t_kp            # A spmv + GHN cache + itref residual
             + solves * (t_f * (1 + M.factor_nitref)
                         + M.factor_nitref * t_kp))
    devrec["modeled_ms_per_iter"] = round(model * 1e3, 3)

    report = {"device": str(dev.device_kind), "n": n, "m": m,
              "dtype": np.dtype(dtype).name, "host_phases_s": host,
              "device_phases_ms": devrec}
    out = pathlib.Path(__file__).parent / "PROFILE_PHASES.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps(report, indent=1))


if __name__ == "__main__":
    main()
