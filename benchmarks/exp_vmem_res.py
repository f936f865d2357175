"""Does an apparently super-HBM-peak chain rate mean VMEM residency?

Round-5 probe: the DEVICE_MICRO PallasDIA A-SpMV chain read >1.2 TB/s —
above the 819 GB/s nominal HBM peak.  This sweep times the same op at
sizes that cannot fit VMEM: at n=4M (144 MB working set) the rate falls
to ~590 GB/s and at n=16M to ~374 GB/s, i.e. ordinary HBM streaming.
The 1M-row chain's operands (28 MB of diagonals) fit the v5e's 128 MB
VMEM and are loop-invariant across the fori chain, so XLA's alternate-
memory assignment can keep them resident — the chain then measures
VMEM-resident throughput.  DEVICE_MICRO rows above the measured stream
ceiling carry a note pointing here.
"""
import sys, time, functools
sys.path.insert(0, "/root/repo")
import numpy as np, jax, jax.numpy as jnp
from cpkrylov_tpu.utils import fixtures
from cpkrylov_tpu.driver import _maybe_pack_pgell
from cpkrylov_tpu.operators.linop import aslinearoperator
from cpkrylov_tpu.utils.timing import sync

@functools.partial(jax.jit, static_argnames=("k",))
def loop(x, op, k):
    return jax.lax.fori_loop(0, k, lambda i, v: op.matvec(v), x)

for n in (1_000_000, 4_000_000, 16_000_000):
    m = n // 4
    sysm = fixtures.banded_saddle_system(n, m, bandwidth=3, with_oracle=False)
    a_dev = _maybe_pack_pgell(sysm.A, "auto", 2048, np.float32)
    op = aslinearoperator(a_dev, dtype=np.float32)
    mb = (7 * n * 4 + 2 * n * 4) / 1e6
    x = jnp.asarray(np.random.default_rng(0).standard_normal(n).astype(np.float32))
    ts = {}
    for k in (20, 100):
        sync(loop(x, op, k))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter(); sync(loop(x, op, k))
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    per = (ts[100] - ts[20]) / 80
    print(f"n={n}: {per*1e3:.4f} ms/spmv, model {mb:.0f} MB -> {mb*1e6/per/1e9:.0f} GB/s", flush=True)
