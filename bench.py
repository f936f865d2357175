"""Benchmark: SpMV throughput (nnz/s) per chip — the north-star kernel metric.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}

``vs_baseline`` is measured nnz/s divided by the BASELINE.md target of 70%
of speed-of-light, where SoL is the HBM-bandwidth bound for ELL SpMV
(data + column-index reads + operand gather + amortized result write).
A value >= 1.0 means the per-chip target is met.

Runs on whatever backend the environment provides (the graft driver runs it
on one real TPU chip via the axon plugin); falls back to CPU only if no
accelerator is available.
"""
from __future__ import annotations

import json
import sys
import time

import numpy as np


# Rough HBM bandwidth per chip for SoL accounting.
_BW_BYTES = {
    "tpu v5 lite": 819e9,   # v5e: ~819 GB/s
    "tpu v5": 1228e9,       # v5p: ~1.2 TB/s (overridden by exact match above)
    "tpu v4": 1200e9,
    "cpu": 50e9,            # ballpark, keeps vs_baseline meaningful on CPU
}


def _chip_bandwidth(device) -> float:
    kind = getattr(device, "device_kind", "cpu").lower()
    for key, bw in _BW_BYTES.items():
        if key in kind:
            return bw
    return _BW_BYTES["cpu"]


def _build_ell(rows: int, k: int, band: int, dtype, seed: int = 0):
    """Banded random ELL matrix: locality comparable to an RCM-ordered KKT."""
    rng = np.random.default_rng(seed)
    data = rng.standard_normal((rows, k)).astype(dtype)
    offs = rng.integers(-band, band + 1, size=(rows, k))
    cols = (np.arange(rows)[:, None] + offs).clip(0, rows - 1).astype(np.int32)
    return data, cols


def main() -> None:
    import jax
    import jax.numpy as jnp

    dev = jax.devices()[0]
    on_tpu = "tpu" in getattr(dev, "device_kind", "cpu").lower() or \
        dev.platform not in ("cpu",)
    dtype = np.float32

    rows = 1 << 20 if on_tpu else 1 << 16
    k = 8
    band = 1024
    nnz = rows * k

    x0 = jnp.asarray(np.random.default_rng(1).standard_normal(rows)
                     .astype(dtype))

    if on_tpu:
        # Pallas PGELL kernel (the production TPU path).
        import scipy.sparse as sp

        from cpkrylov_tpu.ops.pgell import pack_pgell
        from cpkrylov_tpu.ops.pallas_spmv import pgell_matvec

        data_np, cols_np = _build_ell(rows, k, band, dtype)
        r = np.repeat(np.arange(rows), k)
        A = sp.csr_matrix(
            (data_np.reshape(-1), (r, cols_np.reshape(-1))),
            shape=(rows, rows))
        nnz = A.nnz
        mat = pack_pgell(A, tile_rows=2048, dtype=dtype)

        def spmv(x):
            return pgell_matvec(mat, x)
    else:
        data_np, cols_np = _build_ell(rows, k, band, dtype)
        data = jnp.asarray(data_np)
        cols = jnp.asarray(cols_np)

        @jax.jit
        def spmv(x):
            return (data * jnp.take(x, cols, mode="clip")).sum(axis=1)

    # Warmup / compile.
    spmv(x0).block_until_ready()

    # Chain each repetition's operand to the previous result so no rep can
    # be elided or overlapped away: the measured time is a true serial
    # dependency chain of `reps` SpMVs (values are N(0,1) with k=8 per row,
    # so the iterated norm stays finite in f32 over 50 applications).
    reps = 50
    y = x0
    t0 = time.perf_counter()
    for _ in range(reps):
        y = spmv(y)
    y.block_until_ready()
    elapsed = time.perf_counter() - t0

    total_nnz = nnz * reps
    nnz_per_s = total_nnz / elapsed

    # SoL model: per nnz, read 4B data + 4B col index + 4B gathered operand,
    # plus 4B/k amortized result write.
    bytes_per_nnz = 4 + 4 + 4 + 4.0 / k
    sol = _chip_bandwidth(dev) / bytes_per_nnz
    target = 0.70 * sol

    print(json.dumps({
        "metric": f"pgell_spmv_nnz_per_s[{dev.device_kind}]"
                  if on_tpu else f"ell_spmv_nnz_per_s[{dev.device_kind}]",
        "value": round(nnz_per_s / 1e9, 3),
        "unit": "Gnnz/s",
        "vs_baseline": round(nnz_per_s / target, 3),
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
