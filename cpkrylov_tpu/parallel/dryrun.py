"""Multi-chip dry run: tiny distributed CP-MINRES over an n-device mesh.

Used by the graft driver (with ``xla_force_host_platform_device_count``) to
validate that the row-partitioned sharding compiles and executes without N
real chips.
"""
from __future__ import annotations

import numpy as np


def run_dryrun(n_devices: int) -> None:
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()[:n_devices]
    if len(devices) < n_devices:
        raise RuntimeError(
            f"need {n_devices} devices, found {len(devices)}")

    from ..config import SolverOptions
    from ..precond.cp import make_preconditioner
    from ..utils.fixtures import random_sqd_system
    from .cpminres import dist_cpminres
    from .partition import partition_blocks, shard_vector, unshard_vector

    dtype = np.dtype(jax.dtypes.canonicalize_dtype(np.float64))
    sys_ = random_sqd_system(8 * n_devices, 3 * n_devices, seed=7,
                             delta=1e-2)
    mesh = Mesh(np.array(devices), ("rows",))

    M = make_preconditioner(sys_.G, sys_.B, sys_.C, panel=8, dtype=dtype)
    blocks = partition_blocks(sys_.A, sys_.B, sys_.C, n_devices, dtype=dtype)
    b1 = sys_.b[: sys_.n].astype(dtype)
    b_sh = shard_vector(b1, n_devices, blocks.n_loc)

    opts = SolverOptions(itmax=8)
    x_sh, y_sh, k, resid, hist = jax.jit(
        lambda b: dist_cpminres(mesh, blocks, M, b, opts)
    )(b_sh)
    x = np.asarray(unshard_vector(x_sh, sys_.n))
    assert np.isfinite(x).all(), "distributed solve produced non-finite x"
    assert int(k) >= 1, "distributed solve did not iterate"

    # generic family path: any serial kernel under shard_map (solve.py);
    # exercise the Arnoldi side with a tiny restarted GMRES.
    from .solve import dist_solve

    res, x1, x2 = dist_solve(
        mesh, "cpgmres", sys_.b, sys_.A, sys_.B, sys_.C, sys_.G,
        opts=SolverOptions(itmax=8, restart=4), panel=8, dtype=dtype)
    assert np.isfinite(np.asarray(x1)).all()
    assert int(res.niters) >= 1
