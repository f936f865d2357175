"""TPU fixture-parity artifact: the reference's shipped fixtures solved
f32-mixed on the chip to the f64 true-residual contract.

Regenerates benchmarks/TPU_FIXTURE_PARITY.json (round-4 artifact; round-5
adds the iteration-inflation accounting VERDICT r4 item 6 asks for:
total inner iterations vs the f64 reference baseline, target <= 1.5x).
"""
from __future__ import annotations

import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


def main() -> None:
    import jax
    import scipy.sparse.linalg as spla

    from cpkrylov_tpu import PrecondOptions, SolverOptions, solve_mixed
    from cpkrylov_tpu.utils import fixtures

    dev = jax.devices()[0]
    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)
    rows = []
    for name, method, kw, f64_iters in (
            ("cvxqp1_m", "cpminres", dict(), 53),
            ("cvxqp2_s", "cpgmres", dict(restart=100), 127)):
        f = fixtures.load_fixture(name)
        xref = spla.spsolve(f.K.tocsc(), f.b)
        opts = SolverOptions(atol=0.0, rtol=1e-6, itmax=500, **kw)
        t0 = time.perf_counter()
        out = solve_mixed(method, f.b, f.A, f.B, f.C, f.G, opts=opts,
                          precond_opts=popts)
        wall = time.perf_counter() - t0
        x = out.x
        rel = float(np.linalg.norm(x - xref) / np.linalg.norm(xref))
        row = {
            "fixture": name, "method": method, "solved": bool(out.solved),
            "total_inner_iters": int(out.niters),
            "outer_passes": int(out.nouter),
            "rel_err_vs_direct": rel,
            "wall_s": round(wall, 2),
            "f64_reference_iters": f64_iters,
            "inflation_vs_f64": round(int(out.niters) / f64_iters, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    path = pathlib.Path(__file__).parent / "TPU_FIXTURE_PARITY.json"
    path.write_text(json.dumps({
        "device": str(dev.device_kind),
        "path": "f32 TPU mixed refinement (device caches warm after first "
                "call; wall includes compile on first fixture use in this "
                "process)",
        "contract": "f64 TRUE residual <= 1e-6 * ||b|| (stronger than the "
                    "reference's recurrence criterion)",
        "rows": rows,
    }, indent=1))
    print("wrote", path)


if __name__ == "__main__":
    main()
