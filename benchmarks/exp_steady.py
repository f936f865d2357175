"""Probe the device-resident mixed solve: dispatch pipelining + per-solve
device time on the prepared solver."""
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main():
    import jax

    from cpkrylov_tpu import PrecondOptions, SolverOptions
    from cpkrylov_tpu.mixed import prepare_mixed_device, _lean_inner_options
    from cpkrylov_tpu.precond.cp import make_preconditioner
    from cpkrylov_tpu.utils import fixtures
    from cpkrylov_tpu.utils.timing import sync

    n, m = 1_000_000, 250_000
    sysm = fixtures.banded_saddle_system(n, m, bandwidth=3, with_oracle=False)
    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)
    opts = SolverOptions(atol=0.0, rtol=1e-6, itmax=200, stagwin=25)
    t0 = time.perf_counter()
    M = make_preconditioner(sysm.G, sysm.B, sysm.C, options=popts,
                            dtype=np.float32)
    M = _lean_inner_options(M, True)
    print(f"ptime {time.perf_counter()-t0:.1f}s")

    t0 = time.perf_counter()
    solver = prepare_mixed_device("cpminres", sysm.b, sysm.A, sysm.B,
                                  sysm.C, M, opts, inner_stagwin=25)
    print(f"prepare {time.perf_counter()-t0:.1f}s  "
          f"{'OK' if solver else 'REJECTED'}")
    if solver is None:
        return

    t0 = time.perf_counter()
    out = solver.dispatch()
    sync(out[0])
    print(f"compile+first {time.perf_counter()-t0:.1f}s  "
          f"nouter={int(out[4])} iters={np.asarray(out[3])}")

    for S in (1, 2, 5, 9):
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            outs = [solver.dispatch() for _ in range(S)]
            sync(outs[-1][0])
            best = min(best, time.perf_counter() - t0)
        print(f"S={S}: wall {best*1e3:8.1f} ms   per-solve "
              f"{best/S*1e3:7.1f} ms")


if __name__ == "__main__":
    main()
