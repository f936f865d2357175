"""Isolated device microbenchmarks: dense-bandwidth baseline, trisolve
pieces, and PGELL kernel scaling (VERDICT r2 items 2-3).

Everything here is sized by command-line flags so individual pieces can be
probed without the 10-minute full-bench setup.  Writes/updates
benchmarks/PROFILE_TRISOLVE.json.
"""
from __future__ import annotations

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def bench_dev(label, fn, x0, record, reps=10):
    import jax
    from cpkrylov_tpu.utils.timing import sync

    @jax.jit
    def loop(x):
        return jax.lax.fori_loop(0, reps, lambda i, v: fn(v), x)

    t0 = time.perf_counter()
    out = loop(x0)
    sync(out)
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    out = loop(x0)
    sync(out)
    dt = (time.perf_counter() - t0) / reps
    record[label] = {"ms": round(dt * 1e3, 4),
                     "compile_s": round(compile_s, 1)}
    print(f"  {label:<44s} {dt*1e3:10.3f} ms/call "
          f"(compile {compile_s:.1f}s)", flush=True)
    return dt


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--m", type=int, default=250_000)
    ap.add_argument("--reps", type=int, default=10)
    ap.add_argument("--parts", default="dense,tri,spmv",
                    help="comma list: dense,tri,tripieces,spmv")
    args = ap.parse_args()
    parts = set(args.parts.split(","))

    import jax
    import jax.numpy as jnp

    record = {"n": args.n, "m": args.m}
    dev = jax.devices()[0]
    print(f"device={dev.device_kind}")

    if "dense" in parts:
        # HBM bandwidth baseline: big elementwise op, read+write 2x size.
        for mb in (64, 512):
            nel = mb * 1024 * 1024 // 4
            x = jnp.ones((nel,), jnp.float32)
            dt = bench_dev(f"dense_axpy_{mb}MB", lambda v: v * 1.0001 + 0.5,
                           x, record, reps=args.reps)
            record[f"dense_axpy_{mb}MB"]["gbps"] = round(
                2 * nel * 4 / dt / 1e9, 1)
        # matmul roofline probe
        a = jnp.ones((4096, 4096), jnp.bfloat16)
        dt = bench_dev("matmul_4096_bf16", lambda v: (v @ v).astype(v.dtype),
                       a, record, reps=args.reps)
        record["matmul_4096_bf16"]["tflops"] = round(
            2 * 4096**3 / dt / 1e12, 1)

    if "tri" in parts or "tripieces" in parts:
        from cpkrylov_tpu.precond import ldl_host
        from cpkrylov_tpu.precond.cp import assemble_kp, build_factor_apply
        from cpkrylov_tpu.precond.trisolve import (
            ReducedScanTriFactor, reduced_scan_tri_solve, tri_solve)
        from cpkrylov_tpu.utils import fixtures

        t0 = time.perf_counter()
        sysm = fixtures.banded_saddle_system(args.n, args.m, bandwidth=3,
                                             with_oracle=False)
        ksp = assemble_kp(sysm.G, sysm.B, sysm.C)
        signs = np.concatenate([np.ones(args.n), -np.ones(args.m)])
        fac = ldl_host.factorize(ksp, method="auto", ordering="rcm",
                                 pivot_signs=signs)
        fa = build_factor_apply(fac, args.n + args.m, 256, np.float32)
        record["factor_setup_s"] = round(time.perf_counter() - t0, 1)
        for name, tf in (("tf1", fa.tf1), ("tf2", fa.tf2)):
            info = {"kind": type(tf).__name__, "nblocks": tf.nblocks,
                    "panel": tf.panel}
            if hasattr(tf, "r"):
                info["r"] = tf.r
            if hasattr(tf, "inv_diag"):
                info["inv_diag_mb"] = round(
                    tf.inv_diag.size * tf.inv_diag.dtype.itemsize / 2**20, 1)
            record[name] = info
        print("  tf1/tf2:", record["tf1"], record["tf2"], flush=True)

        N = args.n + args.m
        z = jnp.ones(N, jnp.float32)

        if "tripieces" in parts and isinstance(fa.tf1, ReducedScanTriFactor):
            tf = fa.tf1
            b2 = jnp.ones((tf.nblocks, tf.panel), jnp.float32)

            def einsum_only(v):
                return jnp.einsum("bij,bj->bi", tf.inv_diag, v)

            bench_dev("tri_einsum_inv_diag_only", einsum_only, b2, record,
                      reps=args.reps)

            mr = -tf.w_blocks[:, tf.panel - tf.r:, :]

            def scan_only(c):
                cr = c[:, :tf.r]

                def combine(a, bb):
                    ma, ca = a
                    mb, cb = bb
                    return mb @ ma, jnp.einsum("...ij,...j->...i", mb, ca) + cb

                _, s = jax.lax.associative_scan(combine, (mr, cr))
                return jnp.concatenate(
                    [s, jnp.zeros((tf.nblocks, tf.panel - tf.r))], axis=1)

            bench_dev("tri_scan_only", scan_only, b2, record, reps=args.reps)
            bench_dev("tri_reduced_solve_tf1",
                      lambda v: reduced_scan_tri_solve(tf, v), z, record,
                      reps=args.reps)

        if "tri" in parts:
            bench_dev("tri_solve_tf1", lambda v: tri_solve(fa.tf1, v), z,
                      record, reps=args.reps)
            bench_dev("factor_apply_full", lambda v: fa.solve(v), z, record,
                      reps=args.reps)

    if "spmv" in parts:
        import scipy.sparse as sp
        from cpkrylov_tpu.ops import spmv as spops
        from cpkrylov_tpu.ops.formats import csr_from_scipy
        from cpkrylov_tpu.ops.pgell import pack_sym_pgell
        from cpkrylov_tpu.utils import fixtures

        sysm = fixtures.banded_saddle_system(args.n, args.m, bandwidth=3,
                                             with_oracle=False)
        A = sp.csr_matrix(sysm.A)
        pg = pack_sym_pgell(A, tile_rows=2048, dtype=np.float32)
        if pg is not None:
            inner = pg.inner
            record["pgell_A"] = {
                "ntiles": inner.ntiles, "s_rows": inner.s_rows,
                "wp": inner.wp, "depth": inner.depth,
                "rng_len": inner.rng_len,
                "density": round(inner.nnz_density, 3),
                "device_mb": round(inner.device_bytes / 2**20, 1)}
            print("  pgell_A:", record["pgell_A"], flush=True)
            x = jnp.ones(args.n, jnp.float32)
            bench_dev("pgell_A_spmv", lambda v: spops.matvec(pg, v), x,
                      record, reps=args.reps)
            bench_dev("pgell_A_inner_only",
                      lambda v: spops.pgell_dispatch(
                          inner, v[:args.n]).astype(v.dtype),
                      x, record, reps=args.reps)
        csr = csr_from_scipy(A, dtype=np.float32)
        x = jnp.ones(args.n, jnp.float32)
        bench_dev("csr_A_spmv(xla)", lambda v: spops.csr_matvec(csr, v), x,
                  record, reps=args.reps)

    out = pathlib.Path(__file__).parent / "PROFILE_TRISOLVE.json"
    out.write_text(json.dumps(record, indent=1))
    print(json.dumps(record, indent=1))


if __name__ == "__main__":
    main()
