"""Auxiliary-subsystem tests: checkpointing, IO, validation/debug, and the
Maros-Meszaros-style IPM KKT sweep (BASELINE.json configs[2] and [3])."""
import os

import numpy as np
import pytest
import scipy.sparse.linalg as spla

from cpkrylov_tpu import (PrecondOptions, SolverOptions, aslinearoperator,
                          make_preconditioner, solve)
from cpkrylov_tpu.utils.checkpoint import load_pytree, save_pytree
from cpkrylov_tpu.utils.debug import ValidationError, validate_system
from cpkrylov_tpu.utils.fixtures import ipm_kkt_system, random_sqd_system


# ---------------------------------------------------------------------------
# checkpoint / resume
# ---------------------------------------------------------------------------

def test_preconditioner_checkpoint_roundtrip(tmp_path):
    import jax.numpy as jnp

    s = random_sqd_system(60, 25, seed=2, delta=1e-2)
    M = make_preconditioner(s.G, s.B, s.C, panel=16)
    path = os.path.join(tmp_path, "precond.npz")
    save_pytree(M, path)
    M2 = load_pytree(M, path)
    z = np.random.default_rng(0).standard_normal(85)
    y1 = np.asarray(M._direct_solve(jnp.asarray(z)))
    y2 = np.asarray(M2._direct_solve(jnp.asarray(z)))
    np.testing.assert_array_equal(y1, y2)
    # reuse the restored preconditioner in a full solve
    out = solve("cpminres", s.b, s.A, s.B, s.C, s.G, M=M2)
    assert out.solved


def test_checkpoint_structure_mismatch(tmp_path):
    s = random_sqd_system(30, 10, seed=3)
    M = make_preconditioner(s.G, s.B, s.C, panel=8)
    path = os.path.join(tmp_path, "p.npz")
    save_pytree(M, path)
    other = make_preconditioner(s.G, s.B, s.C, panel=8,
                                options=PrecondOptions(nitref=7))
    with pytest.raises(ValueError, match="mismatch"):
        load_pytree(other, path)


# ---------------------------------------------------------------------------
# IO
# ---------------------------------------------------------------------------

def test_matrix_market_roundtrip(tmp_path):
    from cpkrylov_tpu.ops.io import load_matrix_market, save_matrix_market

    s = random_sqd_system(20, 8, seed=5)
    path = os.path.join(tmp_path, "k.mtx")
    save_matrix_market(path, s.K)
    back = load_matrix_market(path)
    assert abs(s.K - back).max() < 1e-12


def test_load_mat_fixture():
    from cpkrylov_tpu.ops.io import load_mat

    path = "/root/reference/examples/cvxqp1_m_2x2_symm_iter10.mat"
    if not os.path.exists(path):
        pytest.skip("reference fixture unavailable")
    d = load_mat(path)
    assert d["K"].shape == (5500, 5500)
    assert int(d["nH"]) == 3000


# ---------------------------------------------------------------------------
# validation / debug
# ---------------------------------------------------------------------------

def test_validate_catches_bad_shapes():
    s = random_sqd_system(30, 10, seed=1)
    with pytest.raises(ValidationError, match="expected"):
        validate_system(s.A, s.B[:, :-1], s.C, s.G)
    with pytest.raises(ValidationError, match="symmetric"):
        import scipy.sparse as sp

        Cbad = s.C.tolil()
        Cbad[0, 5] = 1.0
        validate_system(s.A, s.B, Cbad.tocsr(), s.G)


def test_driver_debug_mode():
    s = random_sqd_system(40, 15, seed=6, delta=1e-2)
    out = solve("cpminres", s.b, s.A, s.B, s.C, s.G, debug=True, panel=16)
    assert out.solved


# ---------------------------------------------------------------------------
# Maros-Meszaros-style sweep (configs[2]) and operator-A (configs[3])
# ---------------------------------------------------------------------------

SWEEP = [
    dict(n=150, m=60, mu=1e-2, seed=0),
    dict(n=150, m=60, mu=1e-4, seed=1),
    dict(n=200, m=50, mu=1e-3, seed=2),
    dict(n=120, m=120, mu=1e-2, seed=3),   # square constraint block
]


@pytest.mark.parametrize("cfg", SWEEP)
@pytest.mark.parametrize("name", ["cpminres", "cpcg", "cpcglanczos",
                                  "cpsymmlq"])
def test_ipm_kkt_sweep(cfg, name):
    s = ipm_kkt_system(**cfg)
    out = solve(name, s.b, s.A, s.B, s.C, s.G, panel=64,
                opts=SolverOptions(atol=1e-6, rtol=1e-6, itmax=800),
                precond_opts=PrecondOptions(residual_update=True, nitref=1,
                                            force_itref=True))
    x_ref = spla.spsolve(s.K.tocsc(), s.b)
    rel = np.linalg.norm(np.asarray(out.x) - x_ref) / np.linalg.norm(x_ref)
    if out.solved:
        assert rel < 1e-3, (s.name, name, rel)
    else:
        # honest status on the hard instances
        assert out.istatus != 0, (s.name, name)


def test_operator_only_A_with_itref():
    # BASELINE.json configs[3]: operator-only leading block + itref on an
    # ill-conditioned system.
    import jax.numpy as jnp

    s = ipm_kkt_system(n=150, m=60, mu=1e-5, seed=9)
    Adense = jnp.asarray(s.A.toarray())
    A_op = aslinearoperator(lambda v: Adense @ v, shape=(150, 150))
    out = solve("cpminres", s.b, A_op, s.B, s.C, s.G, panel=64,
                opts=SolverOptions(atol=1e-6, rtol=1e-6, itmax=800),
                precond_opts=PrecondOptions(residual_update=True, nitref=2,
                                            force_itref=True))
    x_ref = spla.spsolve(s.K.tocsc(), s.b)
    rel = np.linalg.norm(np.asarray(out.x) - x_ref) / np.linalg.norm(x_ref)
    assert out.solved and rel < 1e-2, (bool(out.solved), rel)


def test_function_operator_wrap_is_cached():
    """Repeated aslinearoperator(f) on the same callable must return the
    SAME operator object: ``fn`` is a static (meta) field, so a fresh
    closure per call would retrace _solve_core on every operator-A solve."""
    def f(v):
        return 2.0 * v

    op1 = aslinearoperator(f, shape=(8, 8))
    op2 = aslinearoperator(f, shape=(8, 8))
    assert op1 is op2

    def g(v):
        return 3.0 * v

    assert aslinearoperator(g, shape=(8, 8)) is not op1


def test_operator_A_second_solve_hits_jit_cache():
    """Two solves with the same user callable must compile exactly once."""
    from cpkrylov_tpu import driver
    import jax.numpy as jnp

    s = ipm_kkt_system(n=80, m=30, mu=1e-2, seed=4)
    Adense = jnp.asarray(s.A.toarray())

    def amv(v):
        return Adense @ v

    opts = SolverOptions(atol=1e-6, rtol=1e-6, itmax=300)
    M = make_preconditioner(s.G, s.B, s.C, panel=64)
    out1 = solve("cpminres", s.b, aslinearoperator(amv, shape=(80, 80)),
                 s.B, s.C, s.G, opts=opts, M=M)
    size_after_first = None
    if hasattr(driver._solve_core, "_cache_size"):
        size_after_first = driver._solve_core._cache_size()
    out2 = solve("cpminres", s.b, aslinearoperator(amv, shape=(80, 80)),
                 s.B, s.C, s.G, opts=opts, M=M)
    assert bool(out1.solved) == bool(out2.solved)
    assert out1.niters == out2.niters
    if size_after_first is not None:
        assert driver._solve_core._cache_size() == size_after_first


def test_profile_solve_reports_throughput():
    """Profiling subsystem (SURVEY.md §5): compile-excluded timing + nnz/s."""
    from cpkrylov_tpu.utils.profiling import profile_solve

    s = ipm_kkt_system(n=150, m=60, mu=1e-2, seed=0)
    prof = profile_solve("cpminres", s.b, s.A, s.B, s.C, s.G, repeats=2,
                         opts=SolverOptions(atol=1e-6, rtol=1e-6, itmax=400))
    assert prof.solved
    assert prof.niters > 0
    assert prof.stime > 0 and prof.stime <= prof.compile_time
    assert prof.nnz_per_s > 0
    assert prof.work.nnz_per_iter >= prof.work.nnz_a + prof.work.nnz_c
    assert "nnz/s" in prof.summary()


def test_profiler_trace_writes_events(tmp_path):
    """jax.profiler trace context produces a trace directory."""
    import jax.numpy as jnp

    from cpkrylov_tpu.utils.profiling import trace

    logdir = str(tmp_path / "trace")
    with trace(logdir):
        jnp.ones(128).sum().block_until_ready()
    import os

    found = [f for _, _, fs in os.walk(logdir) for f in fs]
    assert found, "no trace events written"


# ---------------------------------------------------------------------------
# device-form cache: fingerprint coverage + eviction (advisor r4/r5)
# ---------------------------------------------------------------------------

def test_host_fingerprint_sees_any_entry_change():
    """The fingerprint must change when ANY entry changes — strided
    sampling alone deterministically misses updates between sample
    positions (e.g. a few IPM regularization entries)."""
    import scipy.sparse as sp

    from cpkrylov_tpu.operators.linop import host_fingerprint

    rng = np.random.default_rng(3)
    A = sp.random(500, 500, density=0.02, format="csr", random_state=3)
    fp0 = host_fingerprint(A)
    # touch ONE entry at a position a 64-sample stride will skip
    A.data[1] += 1e-3
    assert host_fingerprint(A) != fp0
    A.data[1] -= 1e-3
    assert host_fingerprint(A) == fp0
    del rng


def test_cache_device_form_replaces_stale_entry():
    """A changed fingerprint REPLACES the cache entry instead of accreting
    a new key: long in-place-update loops must hold one pinned device copy
    per (object, key), not one per historical content state."""
    import scipy.sparse as sp

    from cpkrylov_tpu.operators.linop import (_DEV_CACHE, cache_device_form,
                                              host_fingerprint)

    A = sp.random(64, 64, density=0.1, format="csr", random_state=5)
    keys_for = lambda obj: [k for k in _DEV_CACHE if k[0] == id(obj)]
    builds = []

    def build():
        builds.append(1)
        return A.data.sum()

    v1 = cache_device_form(A, ("t5",), build, fingerprint=host_fingerprint(A))
    v1b = cache_device_form(A, ("t5",), build, fingerprint=host_fingerprint(A))
    assert v1 == v1b and len(builds) == 1
    n_keys = len(keys_for(A))
    for _ in range(4):                       # IPM-style in-place updates
        A.data *= 1.01
        cache_device_form(A, ("t5",), build, fingerprint=host_fingerprint(A))
    assert len(builds) == 5                  # rebuilt per content change
    assert len(keys_for(A)) == n_keys        # ...but no key accretion
