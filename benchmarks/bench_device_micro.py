"""Isolated device microbenchmarks: SpMV formats + trisolve factor forms.

VERDICT r2 item 3: record which factor form the production preconditioner
selects and what each costs on the device, as a committed JSON artifact.
Times every op with a jitted K-rep dependence chain (one sync at the end)
so tunnel round-trip latency amortizes; reports ms/call and achieved GB/s
against each operand's own HBM byte model.

Usage:
    python benchmarks/bench_device_micro.py [--rows 1000000] [--reps 20]

Writes benchmarks/DEVICE_MICRO.json.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def chain(step):
    """Jitted dependence chain with a TRACED trip count: one compile serves
    both chain lengths of the slope measurement.  The operand pytree is a
    jit ARGUMENT (a closure would bake ~100s of MB of factor data into the
    compile request as HLO constants — the axon remote_compile endpoint
    413s)."""
    import jax

    @jax.jit
    def loop(x, op, reps):
        return jax.lax.fori_loop(0, reps, lambda i, v: step(v, op), x)

    return loop


def timeit(label, step, x0, op, reps, record, bytes_per_call=None):
    """Two-point slope timing: per-call = (t(K2) - t(K1)) / (K2 - K1).

    Round-3 methodology divided ONE synced call by the chain length, which
    folded the ~40 ms tunnel round trip into every number (~2 ms/call of
    phantom cost at reps=20) and made every op look bandwidth-starved.
    The slope cancels all fixed dispatch/fetch costs (VERDICT r3 weak #2
    was diagnosed from those polluted numbers)."""
    from cpkrylov_tpu.utils.timing import sync

    loop = chain(step)
    k1, k2 = max(2, reps // 5), reps * 2
    t0 = time.perf_counter()
    sync(loop(x0, op, k1))                 # compile + upload + first run
    cold = time.perf_counter() - t0
    walls = {}
    for k in (k1, k2):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            sync(loop(x0, op, k))
            best = min(best, time.perf_counter() - t0)
        walls[k] = best
    dt = (walls[k2] - walls[k1]) / (k2 - k1)
    dt = max(dt, 1e-9)
    entry = {"ms_per_call": round(dt * 1e3, 4),
             "cold_s": round(cold, 2),
             "method": f"slope k={k1}..{k2}"}
    if bytes_per_call:
        entry["gbps"] = round(bytes_per_call / dt / 1e9, 2)
        entry["bytes_per_call"] = int(bytes_per_call)
        if entry["gbps"] > 800:
            entry["note"] = (
                "apparent rate exceeds HBM peak: the chain repeats one op "
                "with loop-invariant operands small enough for XLA's VMEM "
                "assignment (v5e: 128 MB), so this measures VMEM-resident "
                "throughput, not HBM streaming; a cold/large-size run "
                "streams at ~460-590 GB/s (exp_vmem_res probe, round 5)")
    record[label] = entry
    print(f"  {label:<38s} {dt*1e3:9.3f} ms/call"
          + (f"  {entry['gbps']:8.1f} GB/s" if bytes_per_call else ""),
          flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=1_000_000)
    ap.add_argument("--reps", type=int, default=60)
    ap.add_argument("--skip-pgell", action="store_true",
                    help="skip the PGELL Pallas timing (slow upload)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from cpkrylov_tpu import PrecondOptions
    from cpkrylov_tpu.ops import spmv
    from cpkrylov_tpu.ops.dia import pack_sym_dia
    from cpkrylov_tpu.ops.formats import csr_from_scipy
    from cpkrylov_tpu.ops.pgell import pack_sym_pgell
    from cpkrylov_tpu.precond.cp import make_preconditioner
    from cpkrylov_tpu.precond.trisolve import tri_solve
    from cpkrylov_tpu.utils import fixtures
    from cpkrylov_tpu.utils.timing import sync

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = np.float32 if on_tpu else np.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    itemsize = np.dtype(dtype).itemsize

    n = args.rows
    m = n // 4
    N = n + m
    print(f"device={dev.device_kind} n={n} m={m} dtype={np.dtype(dtype).name}")
    sysm = fixtures.banded_saddle_system(n, m, bandwidth=3, with_oracle=False)
    nnz_a = int(sysm.A.nnz)
    rec: dict = {"device": str(dev.device_kind), "n": n, "m": m,
                 "dtype": np.dtype(dtype).name, "nnz_a": nnz_a, "ops": {}}
    ops = rec["ops"]
    x_n = jnp.ones(n, dtype)
    x_N = jnp.ones(N, dtype)

    # --- A SpMV formats ----------------------------------------------------
    vec3 = 3.0 * itemsize * n
    a_dia = pack_sym_dia(sysm.A, dtype=dtype)
    if a_dia is not None:
        sync(a_dia)
        timeit(f"A_spmv[{type(a_dia).__name__}]",
               lambda v, mt: spmv.matvec(mt, v), x_n, a_dia,
               args.reps, ops, a_dia.device_bytes + vec3)
        rec["dia_ndiag"] = getattr(a_dia, "inner", a_dia).ndiag
        if on_tpu and not hasattr(a_dia, "inner"):
            from cpkrylov_tpu.ops.pallas_dia import pack_pallas_dia

            a_pd = pack_pallas_dia(a_dia)
            if a_pd is not None:
                sync(a_pd)
                timeit("A_spmv[PallasDIA]",
                       lambda v, mt: spmv.matvec(mt, v), x_n, a_pd,
                       args.reps, ops, a_pd.device_bytes + vec3)
    a_csr = csr_from_scipy(sysm.A.tocsr(), dtype=dtype)
    sync(a_csr)
    timeit("A_spmv[CSR-XLA]", lambda v, mt: spmv.matvec(mt, v), x_n, a_csr,
           args.reps, ops, nnz_a * (itemsize + 8) + vec3)
    if not args.skip_pgell:
        a_pg = pack_sym_pgell(sysm.A, dtype=dtype)
        if a_pg is not None:
            sync(a_pg)
            timeit("A_spmv[sym-PGELL]", lambda v, mt: spmv.matvec(mt, v),
                   x_n, a_pg, args.reps, ops, a_pg.device_bytes + vec3)

    # --- preconditioner: production selection ------------------------------
    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)
    t0 = time.perf_counter()
    M = make_preconditioner(sysm.G, sysm.B, sysm.C, options=popts,
                            dtype=dtype)
    rec["ptime_s"] = round(time.perf_counter() - t0, 2)
    tf1, tf2 = M.factor.tf1, M.factor.tf2
    for name, tf in (("tf1", tf1), ("tf2", tf2)):
        info = {"kind": type(tf).__name__,
                "panel": getattr(tf, "panel", None),
                "r": getattr(tf, "r", None),
                "nblocks": getattr(tf, "nblocks", None),
                "device_mb": round(sum(
                    a.size * np.dtype(a.dtype).itemsize
                    for a in jax.tree_util.tree_leaves(tf)) / 1e6, 1)}
        rec[name] = info
    rec["kp_format"] = type(M.kp).__name__
    rec["factor_nitref"] = int(M.factor_nitref)
    sync(M.factor, M.kp)

    def tf_bytes(tf):
        return sum(a.size * np.dtype(a.dtype).itemsize
                   for a in jax.tree_util.tree_leaves(tf))

    timeit("trisolve[tf1]", lambda v, tf: tri_solve(tf, v), x_N, tf1,
           args.reps, ops, tf_bytes(tf1) + 2 * itemsize * N)
    timeit("trisolve[tf2]", lambda v, tf: tri_solve(tf, v), x_N, tf2,
           args.reps, ops, tf_bytes(tf2) + 2 * itemsize * N)
    fa_bytes = (tf_bytes(tf1) + tf_bytes(tf2) + 7 * itemsize * N)
    timeit("factor_solve(full)", lambda v, fa: fa.solve(v), x_N, M.factor,
           args.reps, ops, fa_bytes)
    kp_bytes = (M.kp.device_bytes if hasattr(M.kp, "device_bytes")
                else M.kp.data.size * (itemsize + 8))
    timeit("KP_spmv", lambda v, kp: spmv.matvec(kp, v), x_N, M.kp,
           args.reps, ops, kp_bytes + 3 * itemsize * N)
    mstate = M.init_state(dtype)
    solves = 1 + M.factor_nitref
    ap_bytes = ((1 + popts.nitref) * solves * fa_bytes
                + (1 + popts.nitref + M.factor_nitref) * kp_bytes)
    timeit("M_apply(full)", lambda v, mm: mm.apply(mstate, v)[1], x_N, M,
           max(4, args.reps // 2), ops, ap_bytes)
    # Lean configuration: the mixed-precision inner solves' per-iteration
    # preconditioner cost (no GHN, no per-application refinement) — the
    # number the VERDICT r3 item-3 target (M_apply <= 9 ms at n=1M) is
    # about.
    import dataclasses as _dc

    M_lean = _dc.replace(M, options=_dc.replace(
        M.options, nitref=0, force_itref=False, residual_update=False))
    timeit("M_apply(lean)", lambda v, mm: mm.apply(mstate, v)[1], x_N,
           M_lean, args.reps, ops,
           fa_bytes + (kp_bytes if M.factor_nitref else 0))

    out = pathlib.Path(__file__).parent / "DEVICE_MICRO.json"
    out.write_text(json.dumps(rec, indent=1))
    print(json.dumps({"wrote": str(out)}))


if __name__ == "__main__":
    main()
