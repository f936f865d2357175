"""Composite benchmark: SpMV + preconditioner-apply throughput (nnz/s per
chip) and time-to-tol on a production-scale banded saddle-point solve — the
BASELINE.json metric ("SpMV+precond-apply nnz/s per chip; time-to-tol").

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}; the full
breakdown (time-to-tol, iterations, bytes/iter, achieved GB/s, speed-of-light
fraction) is written to benchmarks/BENCH_REPORT.json.

Honesty notes (round-1 fix):
  * ``block_until_ready`` is a NO-OP on the axon TPU tunnel (measured: a
    512 MB x 20-op chain "blocks" in 0.5 ms, executes in seconds).  Every
    timing here ends with a one-element host fetch (utils/timing.sync); the
    ~35-40 ms tunnel round trip is negligible against multi-second solves.
  * ``vs_baseline`` is the achieved-HBM-bandwidth fraction divided by the
    0.70-of-speed-of-light target, so it is physically capped at ~1.43.
    The byte model charges the *actual device array sizes* touched per
    iteration (PGELL slot padding included), not an idealized per-nnz cost.
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

# Peak HBM bandwidth per chip for speed-of-light accounting.
_BW_BYTES = {
    "tpu v5 lite": 819e9,   # v5e
    "tpu v5": 2765e9,       # v5p
    "tpu v4": 1228e9,
    "cpu": 50e9,            # ballpark, keeps vs_baseline meaningful on CPU
}


def _chip_bandwidth(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in _BW_BYTES.items():
        if key in kind:
            return bw
    return _BW_BYTES["cpu"]


def _mat_bytes(mat, nrows: int) -> float:
    """HBM bytes one matvec reads: matrix arrays + ~3 vector passes."""
    if hasattr(mat, "device_bytes"):          # PGELL / SymPermuted
        m = mat.device_bytes
    elif hasattr(mat, "data"):                # CSR: data + col idx + row ids
        m = mat.data.size * (np.dtype(mat.data.dtype).itemsize + 8)
    elif hasattr(mat, "diag"):
        m = mat.diag.size * np.dtype(mat.diag.dtype).itemsize
    else:
        m = 0
    itemsize = 4
    return float(m) + 3.0 * itemsize * nrows


def _factor_traffic(tf) -> float:
    """HBM bytes one triangular solve reads/writes for a prepared factor."""
    isz = 4
    if hasattr(tf, "w_blocks"):   # ReducedScanTriFactor: r-state scan
        nb = tf.nblocks
        levels = max(1, int(np.ceil(np.log2(max(nb, 2)))))
        itemsize = np.dtype(tf.w_blocks.dtype).itemsize
        per_level = nb * tf.r * tf.r * itemsize
        return float(tf.inv_diag.size * itemsize
                     + 2.0 * tf.w_blocks.size * itemsize
                     + 2.0 * per_level * levels)
    if hasattr(tf, "m_blocks"):               # ScanTriFactor: log-depth scan
        nb = tf.nblocks
        levels = max(1, int(np.ceil(np.log2(max(nb, 2)))))
        per_level = tf.m_blocks.size * np.dtype(tf.m_blocks.dtype).itemsize
        return float(tf.inv_diag.size * isz + 2.0 * per_level * levels)
    # BlockTriFactor: dense panel inverses + ELL off-entries, read once.
    return float(tf.inv_diag.size * isz
                 + tf.off_data.size * (isz + 4)      # values + int32 cols
                 + 2.0 * tf.off_cols.shape[0] * isz)  # rhs/x vector passes


def _bytes_per_iter(M, a_mat, c_mat, work) -> float:
    """Composite per-iteration HBM traffic of the CPMINRES hot loop."""
    n, m = M.n, M.m
    N = n + m
    per_solve = (_factor_traffic(M.factor.tf1) + _factor_traffic(M.factor.tf2)
                 + 3.0 * 4 * N          # dinv scale + 2 permutation gathers
                 + 4.0 * 4 * N)         # gather/scatter index + operand
    kp_bytes = _mat_bytes(M.kp, N)
    vec = 4.0 * N
    return (_mat_bytes(a_mat, n) + _mat_bytes(c_mat, m)
            + work.solves_per_iter * per_solve
            + work.kp_spmv_per_iter * kp_bytes
            + 12.0 * vec)               # recurrence axpys/dots (~4 passes)


def main() -> None:
    import jax

    from cpkrylov_tpu import PrecondOptions, SolverOptions, solve
    from cpkrylov_tpu.precond.cp import make_preconditioner
    from cpkrylov_tpu.utils import fixtures
    from cpkrylov_tpu.utils.profiling import work_model
    from cpkrylov_tpu.utils.timing import sync

    dev = jax.devices()[0]
    on_tpu = dev.platform != "cpu"
    dtype = np.float32 if on_tpu else np.float64
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)

    n, m = (1_000_000, 250_000) if on_tpu else (100_000, 25_000)
    sysm = fixtures.banded_saddle_system(n, m, bandwidth=3, with_oracle=False)
    nnz_a = int(sysm.A.nnz)
    nnz_c = int(sysm.C.nnz)

    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)
    opts = SolverOptions(atol=0.0, rtol=1e-4, itmax=200,
                         stagwin=25 if on_tpu else 0)

    M = make_preconditioner(sysm.G, sysm.B, sysm.C, options=popts,
                            dtype=dtype)
    kw = dict(opts=opts, precond_opts=popts, M=M, dtype=dtype)

    out = solve("cpminres", sysm.b, sysm.A, sysm.B, sysm.C, sysm.G, **kw)
    sync(out.x1)                                   # compile + warm-up
    best = float("inf")
    iters = int(out.niters)
    for _ in range(2):
        t0 = time.perf_counter()
        out = solve("cpminres", sysm.b, sysm.A, sysm.B, sysm.C, sysm.G, **kw)
        best = min(best, time.perf_counter() - t0)  # solve() syncs internally

    work = work_model(M, nnz_a, nnz_c)
    nnz_per_s = iters * work.nnz_per_iter / best

    # Device layout actually used for A in this solve (PGELL on TPU f32).
    from cpkrylov_tpu.driver import _maybe_pack_pgell
    a_dev = _maybe_pack_pgell(sysm.A, "auto", 2048, dtype)
    if a_dev is None:
        from cpkrylov_tpu.ops.formats import csr_from_scipy
        a_dev = csr_from_scipy(sysm.A.tocsr(), dtype=dtype)
    from cpkrylov_tpu.ops.formats import csr_from_scipy
    c_dev = csr_from_scipy(sysm.C.tocsr(), dtype=dtype)

    bpi = _bytes_per_iter(M, a_dev, c_dev, work)
    achieved_gbps = bpi * iters / best / 1e9
    bw = _chip_bandwidth(dev)
    sol_fraction = achieved_gbps * 1e9 / bw
    vs_baseline = sol_fraction / 0.70

    report = {
        "device": str(dev.device_kind),
        "workload": f"banded_saddle n={n} m={m} bw=3, CPMINRES "
                    f"rtol=1e-4, residual_update+nitref=1 (f{np.dtype(dtype).itemsize*8})",
        "solved": bool(out.solved),
        "iters": iters,
        "time_to_tol_s": round(best, 4),
        "final_resid": float(out.resid_history[-1]),
        "work_nnz_per_iter": float(work.nnz_per_iter),
        "composite_gnnz_per_s": round(nnz_per_s / 1e9, 4),
        "bytes_per_iter": float(bpi),
        "achieved_gbps": round(achieved_gbps, 2),
        "hbm_peak_gbps": bw / 1e9,
        "sol_fraction": round(sol_fraction, 4),
        "a_format": type(a_dev).__name__,
        "kp_format": type(M.kp).__name__,
    }
    rpt_path = pathlib.Path(__file__).parent / "benchmarks" / "BENCH_REPORT.json"
    try:
        rpt_path.write_text(json.dumps(report, indent=1))
    except OSError:
        pass

    print(json.dumps({
        "metric": f"spmv_precond_composite_nnz_per_s[{dev.device_kind}]",
        "value": round(nnz_per_s / 1e9, 4),
        "unit": "Gnnz/s",
        "vs_baseline": round(vs_baseline, 4),
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as exc:  # noqa: BLE001 — bench must always emit a line
        print(json.dumps({
            "metric": "bench_error",
            "value": 0.0,
            "unit": f"error: {type(exc).__name__}: {exc}"[:200],
            "vs_baseline": 0.0,
        }))
        sys.exit(0)
