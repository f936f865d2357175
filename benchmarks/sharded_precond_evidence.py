"""HLO evidence for the fully-sharded preconditioner path (VERDICT r4 #4).

Compiles the 8-device ``dist_solve`` under the REFERENCE-PARITY options
(residual_update=True, nitref=1, force_itref=True — cpk_exprog1.m:87-92)
with a Schur-sharded factor + row-partitioned K_P blocks, and records
every collective in the while body of the optimized HLO.  Done-criterion:
NO O(N) all-gather inside the loop — the only collectives are the halo
collective-permutes (edge-width), the s-sized interface psums of the
Schur solve, and scalar psums from the fused dot products.

Also compiles the FLAGSHIP ``dist_cpminres`` with a lean Schur factor
(its sharded m_apply, r5) for the same check.

Writes benchmarks/SHARDED_PRECOND_HLO.json.
"""
from __future__ import annotations

import json
import pathlib
import re
import sys

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def _collectives(hlo: str, n_vec_elems: int):
    """Classify collective ops; flag any whose payload is O(N)."""
    lines = [ln.strip() for ln in hlo.splitlines()
             if re.search(r"collective-permute|all-reduce|all-gather|"
                          r"reduce-scatter|all-to-all", ln)]
    rows = []
    big = []
    for ln in lines:
        m = re.search(r"(f32|f64)\[([\d,]*)\]", ln)
        elems = 1
        if m and m.group(2):
            elems = int(np.prod([int(v) for v in m.group(2).split(",")]))
        kind = re.search(r"(collective-permute|all-reduce|all-gather|"
                         r"reduce-scatter|all-to-all)", ln).group(1)
        rows.append({"kind": kind, "elems": elems,
                     "excerpt": ln[:160]})
        # O(N) = within 4x of a full n- or m-vector
        if elems * 4 >= n_vec_elems:
            big.append(rows[-1])
    return rows, big


def main() -> None:
    import os

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + " --xla_force_host_platform_device_count=8")
    import dataclasses as dc

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)

    from jax.sharding import Mesh

    from cpkrylov_tpu import PrecondOptions, SolverOptions
    from cpkrylov_tpu.parallel import dist_cpminres, partition_blocks, \
        shard_vector
    from cpkrylov_tpu.parallel.schur import plan_schur_precond
    from cpkrylov_tpu.parallel.solve import (_MAPPED_CACHE, dist_solve,
                                             plan_dist)
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    ndev = 8
    n, m = 4096, 1024
    sysm = banded_saddle_system(n, m, bandwidth=3, with_oracle=False,
                                b_mode="slope", g_mode="banded")
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))
    report = {"ndev": ndev, "n": n, "m": m}

    # --- generic driver, reference-parity options -----------------------
    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)
    opts = SolverOptions(atol=1e-6, rtol=1e-6, itmax=60)
    Ms = plan_schur_precond(sysm.G, sysm.B, sysm.C, ndev, options=popts,
                            panel=16)
    assert Ms.factor.has_shard_plan
    res, x1, x2 = dist_solve(mesh, "cpminres", sysm.b, sysm.A, sysm.B,
                             sysm.C, sysm.G, opts=opts, M=Ms)
    report["dist_solve_ghn_itref"] = {
        "solved": bool(res.solved), "iters": int(res.niters)}
    # the compiled executable was cached during the call above
    [(key, mapped)] = [(k, v) for k, v in _MAPPED_CACHE.items()
                       if k[2] == "cpminres"]
    plan = plan_dist(sysm.A, sysm.B, sysm.C, ndev, dtype=np.float64,
                     halo=True, G=sysm.G)
    b1_sh = shard_vector(sysm.b[:n].copy(), ndev, plan.blocks.n_loc)
    b2_sh = shard_vector(sysm.b[n:].copy(), ndev, plan.blocks.m_loc)
    # rebuild operands exactly as dist_solve does to lower the same program
    hlo = None
    try:
        # jax caches compiled executables on the jitted callable; lower a
        # fresh trace with the same closure for the HLO text
        import inspect  # noqa: F401

        hlo = mapped.lower(  # type: ignore[attr-defined]
            *_operands_for(plan, Ms, b1_sh, b2_sh)).compile().as_text()
    except Exception as exc:  # pragma: no cover
        report["dist_solve_lower_error"] = str(exc)[:200]
    if hlo is not None:
        rows, big = _collectives(hlo, n)
        report["dist_solve_collectives"] = rows
        report["dist_solve_big_collectives"] = big
        report["dist_solve_no_ON_allgather"] = not any(
            r["kind"] == "all-gather" for r in big)

    # --- flagship dist_cpminres, lean Schur -----------------------------
    Ml = plan_schur_precond(sysm.G, sysm.B, sysm.C, ndev,
                            options=PrecondOptions(nitref=0), panel=16)
    Ml = dc.replace(Ml, factor_nitref=0)
    blocks = partition_blocks(sysm.A, sysm.B, sysm.C, ndev)
    b_sh = shard_vector(sysm.b[:n].copy(), ndev, blocks.n_loc)
    from cpkrylov_tpu.parallel import plan_halo_block

    halo_a = plan_halo_block(sysm.A, ndev, blocks.n_loc, blocks.n_loc)
    halo_c = plan_halo_block(sysm.C, ndev, blocks.m_loc, blocks.m_loc)
    low = jax.jit(lambda b: dist_cpminres(
        mesh, blocks, Ml, b, opts, halo_a=halo_a, halo_c=halo_c)).lower(b_sh)
    hlo2 = low.compile().as_text()
    rows2, big2 = _collectives(hlo2, n)
    report["dist_cpminres_collectives"] = rows2
    report["dist_cpminres_big_collectives"] = big2
    report["dist_cpminres_no_ON_allgather"] = not any(
        r["kind"] == "all-gather" for r in big2)

    out = pathlib.Path(__file__).parent / "SHARDED_PRECOND_HLO.json"
    out.write_text(json.dumps(report, indent=1))
    print(json.dumps({k: v for k, v in report.items()
                      if not k.endswith("collectives")}, indent=1))
    print("wrote", out)


def _operands_for(plan, M, b1_sh, b2_sh):
    import jax.numpy as jnp
    import numpy as np

    blocks = plan.blocks
    zeros = jnp.zeros((blocks.ndev, 1, 1), np.float64)
    izeros = jnp.zeros((blocks.ndev, 1, 1), np.int32)

    def h_operand(name):
        hb = plan.halos[name]
        if hb is None:
            return zeros, izeros
        return hb.data, hb.cols

    g_ops = plan.g if plan.g is not None else (zeros, izeros)
    return (blocks.a_data, blocks.a_cols, blocks.b_data, blocks.b_cols,
            blocks.bt_data, blocks.bt_cols, blocks.c_data, blocks.c_cols,
            *h_operand("a"), *h_operand("b"), *h_operand("bt"),
            *h_operand("c"), *g_ops, *h_operand("g"), M, b1_sh, b2_sh)


if __name__ == "__main__":
    main()
