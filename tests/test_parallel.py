"""Distributed solver tests on the 8-virtual-device CPU mesh."""
import jax
import numpy as np
import pytest
from jax.sharding import Mesh

from cpkrylov_tpu import SolverOptions, solve
from cpkrylov_tpu.parallel import (dist_cpminres, partition_blocks,
                                   shard_vector, unshard_vector)
from cpkrylov_tpu.precond.cp import make_preconditioner
from cpkrylov_tpu.utils.fixtures import random_sqd_system


@pytest.mark.parametrize("ndev", [1, 2,
                                  pytest.param(8, marks=pytest.mark.slow)])
def test_dist_cpminres_matches_serial(ndev):
    devices = jax.devices()[:ndev]
    sys_ = random_sqd_system(96, 40, seed=17, delta=1e-2)
    mesh = Mesh(np.array(devices), ("rows",))

    M = make_preconditioner(sys_.G, sys_.B, sys_.C, panel=16)
    blocks = partition_blocks(sys_.A, sys_.B, sys_.C, ndev)
    b1 = sys_.b[: sys_.n].copy()
    b_sh = shard_vector(b1, ndev, blocks.n_loc)
    opts = SolverOptions(atol=1e-8, rtol=1e-8, itmax=200)

    x_sh, y_sh, k, resid, hist = dist_cpminres(mesh, blocks, M, b_sh, opts)
    x = np.asarray(unshard_vector(x_sh, sys_.n))
    y = np.asarray(unshard_vector(y_sh, sys_.m))

    # serial kernel on the same (unshifted) system
    from cpkrylov_tpu.solvers.cpminres import cpminres
    import jax.numpy as jnp

    res = cpminres(jnp.asarray(b1), sys_.A.toarray(), sys_.C.toarray(), M,
                   opts)
    # Reduction order differs (ELL gather-sum vs dense matmul, psum order),
    # and a stop tolerance on the roundoff knife edge can shift the exit by
    # many tail iterations; count parity is only meaningful at ndev=1.
    if ndev == 1:
        assert abs(int(k) - int(res.niters)) <= 1, (int(k), int(res.niters))
    stop = opts.atol + opts.rtol * float(np.asarray(hist)[0])
    # knife-edge exits (indefiniteness guard one iteration past serial
    # convergence) can leave the estimate slightly above the tolerance
    assert float(resid) <= 10 * stop, (float(resid), stop)
    np.testing.assert_allclose(x, np.asarray(res.x), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(y, np.asarray(res.y), rtol=1e-6, atol=1e-8)
    h_d = np.asarray(hist)
    h_s = np.asarray(res.resid_history)
    # roundoff differences amplify along the recurrence; early history
    # must agree tightly, later entries drift.
    ncmp = min(5, int(k), int(res.niters))
    np.testing.assert_allclose(h_d[:ncmp], h_s[:ncmp], rtol=1e-4)


def test_dryrun_entrypoint_driver_conditions():
    """Run ``dryrun_multichip(8)`` in a fresh process WITHOUT conftest's jax
    reconfiguration, reproducing the graft driver's invocation: 8 virtual CPU
    devices and x64 NOT pre-enabled.  Round 3's gate regression (dryrun
    silently running f32, VERDICT r3 weak #1) was invisible to the in-process
    test precisely because conftest had already enabled x64; this subprocess
    form is red if ``run_dryrun`` stops self-configuring the backend."""
    import os
    import subprocess
    import sys

    env = dict(os.environ)
    env.pop("JAX_ENABLE_X64", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.run(
        [sys.executable, "-c",
         "import __graft_entry__ as g; g.dryrun_multichip(8); print('OK')"],
        cwd=repo, env=env, capture_output=True, text=True, timeout=900)
    assert proc.returncode == 0, (proc.stderr or proc.stdout)[-2000:]
    assert "OK" in proc.stdout


@pytest.mark.parametrize("ndev", [2,
                                  pytest.param(8, marks=pytest.mark.slow)])
def test_halo_spmv_matches_allgather(ndev):
    from cpkrylov_tpu.parallel import dist_cpminres, plan_halo_block
    from cpkrylov_tpu.precond.cp import make_preconditioner
    import scipy.sparse as sp

    # banded system so the halo stays narrow
    rng_ = np.random.default_rng(4)
    n, m = 128, 64
    diags = [rng_.standard_normal(n) for _ in range(3)]
    A = sp.diags([np.abs(diags[0]) + 4, diags[1][:-1], diags[1][:-1],
                  diags[2][:-3], diags[2][:-3]],
                 [0, 1, -1, 3, -3]).tocsr()
    B = sp.diags([np.ones(m), 0.5 * np.ones(m)], [0, 2],
                 shape=(m, n)).tocsr()
    C = sp.identity(m).tocsr() * 1e-2
    G = sp.diags(A.diagonal()).tocsr()
    K = sp.bmat([[A, B.T], [B, -C]], format="csr")
    b = rng_.standard_normal(n + m)

    devices = jax.devices()[:ndev]
    mesh = Mesh(np.array(devices), ("rows",))
    M = make_preconditioner(G, B, C, panel=16)
    blocks = partition_blocks(A, B, C, ndev)
    b_sh = shard_vector(b[:n].copy(), ndev, blocks.n_loc)
    opts = SolverOptions(atol=1e-10, rtol=1e-10, itmax=150)

    halo_a = plan_halo_block(A, ndev, blocks.n_loc, blocks.n_loc)
    halo_c = plan_halo_block(C, ndev, blocks.m_loc, blocks.m_loc)
    assert halo_a.halo <= 3 and halo_c.halo == 0

    xg, yg, kg, rg, _ = dist_cpminres(mesh, blocks, M, b_sh, opts)
    xh, yh, kh, rh, _ = dist_cpminres(mesh, blocks, M, b_sh, opts,
                                      halo_a=halo_a, halo_c=halo_c)
    np.testing.assert_allclose(np.asarray(xh), np.asarray(xg),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(yh), np.asarray(yg),
                               rtol=1e-8, atol=1e-10)


ALL_KERNELS = ["cpminres", "cpcg", "cpcglanczos", "cpsymmlq", "cpgmres",
               "cpdqgmres"]


@pytest.mark.slow
@pytest.mark.parametrize("method", ALL_KERNELS)
def test_dist_solve_family_matches_serial(method):
    """Generic shard_map adapter: every kernel, sharded matrices, 8 devices.

    The random rhs has b2 != 0, so the driver's RHS-shift path
    (reg_cpkrylov.m:152-160) runs inside the shard_map region too.
    """
    from cpkrylov_tpu.parallel.solve import dist_solve

    sys_ = random_sqd_system(96, 40, seed=17, delta=1e-2)
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    opts = SolverOptions(atol=1e-6, rtol=1e-6, itmax=200, restart=30, mem=20)

    res, x1, x2 = dist_solve(mesh, method, sys_.b, sys_.A, sys_.B, sys_.C,
                             sys_.G, opts=opts, panel=16)
    out = solve(method, sys_.b, sys_.A, sys_.B, sys_.C, sys_.G, opts=opts,
                panel=16)
    assert bool(res.solved) and out.solved
    assert int(res.niters) == out.niters
    np.testing.assert_allclose(np.asarray(x1), np.asarray(out.x1),
                               rtol=1e-8, atol=1e-10)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(out.x2),
                               rtol=1e-8, atol=1e-10)


def test_dist_solve_nonsymmetric_gmres():
    """Nonsymmetric A through the distributed Arnoldi path."""
    import scipy.sparse.linalg as spla

    from cpkrylov_tpu.parallel.solve import dist_solve

    sys_ = random_sqd_system(80, 32, seed=3, delta=1e-2, nonsymmetric=True)
    xref = spla.spsolve(sys_.K.tocsc(), sys_.b)
    mesh = Mesh(np.array(jax.devices()[:4]), ("rows",))
    opts = SolverOptions(atol=1e-8, rtol=1e-8, itmax=300, restart=40)

    res, x1, x2 = dist_solve(mesh, "cpgmres", sys_.b, sys_.A, sys_.B,
                             sys_.C, sys_.G, opts=opts, panel=16)
    xfull = np.concatenate([np.asarray(x1), np.asarray(x2)])
    err = np.linalg.norm(xfull - xref) / np.linalg.norm(xref)
    assert bool(res.solved)
    assert err < 1e-6, err


@pytest.mark.parametrize("ndev", [2, pytest.param(4, marks=pytest.mark.slow),
                                  pytest.param(8, marks=pytest.mark.slow)])
@pytest.mark.parametrize("g_mode", ["diag", "banded"])
def test_schur_solve_is_exact(ndev, g_mode):
    """Distributed Schur K_P solve == scipy direct solve, machine precision."""
    import jax.numpy as jnp
    import scipy.sparse.linalg as spla
    from jax.sharding import PartitionSpec as P

    from cpkrylov_tpu.parallel.schur import plan_schur_precond
    from cpkrylov_tpu.parallel.solve import precond_spec
    from cpkrylov_tpu.precond.cp import assemble_kp
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    s_ = banded_saddle_system(400, 100, bandwidth=3, seed=1, g_mode=g_mode)
    M = plan_schur_precond(s_.G, s_.B, s_.C, ndev, panel=16)
    ksp = assemble_kp(s_.G, s_.B, s_.C).tocsc()
    rng_ = np.random.default_rng(0)
    z = rng_.standard_normal(500)
    yref = spla.spsolve(ksp, z)

    mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))

    def body(M_loc, z_full):
        st = M_loc.init_state(z_full.dtype)
        _, y, _ = M_loc.apply(st, z_full)
        return y

    mapped = jax.shard_map(body, mesh=mesh,
                           in_specs=(precond_spec(M), P()), out_specs=P(),
                           check_vma=False)
    y = np.asarray(mapped(M, jnp.asarray(z)))
    err = np.linalg.norm(y - yref) / np.linalg.norm(yref)
    assert err < 1e-12, err


def test_schur_dist_solve_iteration_parity():
    """Exact distributed preconditioner => same iteration counts as serial."""
    import scipy.sparse.linalg as spla

    from cpkrylov_tpu.parallel.schur import plan_schur_precond
    from cpkrylov_tpu.parallel.solve import dist_solve
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    s_ = banded_saddle_system(400, 100, bandwidth=3, seed=1, g_mode="banded")
    xref = spla.spsolve(s_.K.tocsc(), s_.b)
    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    opts = SolverOptions(atol=1e-6, rtol=1e-6, itmax=300, restart=40)
    Ms = plan_schur_precond(s_.G, s_.B, s_.C, 8, panel=16)
    # cpcg coverage comes from the slow-marked family sweep; two methods
    # keep this default-run test under ~17 s on the 2-core box
    for method in ("cpminres", "cpgmres"):
        res, x1, x2 = dist_solve(mesh, method, s_.b, s_.A, s_.B, s_.C,
                                 s_.G, opts=opts, M=Ms)
        out = solve(method, s_.b, s_.A, s_.B, s_.C, s_.G, opts=opts,
                    panel=16)
        assert int(res.niters) == out.niters, method
        xfull = np.concatenate([np.asarray(x1), np.asarray(x2)])
        err = np.linalg.norm(xfull - xref) / np.linalg.norm(xref)
        assert err < 1e-4, (method, err)


@pytest.mark.slow
def test_schur_dist_cpminres_matches_replicated():
    """Fully-sharded CP-MINRES: Schur factor vs replicated factor."""
    from cpkrylov_tpu.parallel.schur import plan_schur_precond
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    ndev = 8
    s_ = banded_saddle_system(400, 100, bandwidth=3, seed=1, g_mode="banded")
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))
    Ms = plan_schur_precond(s_.G, s_.B, s_.C, ndev, panel=16)
    Mr = make_preconditioner(s_.G, s_.B, s_.C, panel=16)
    blocks = partition_blocks(s_.A, s_.B, s_.C, ndev)
    b_sh = shard_vector(s_.b[:400].copy(), ndev, blocks.n_loc)
    opts = SolverOptions(atol=1e-6, rtol=1e-6, itmax=200)
    xs, _, ks, _, _ = dist_cpminres(mesh, blocks, Ms, b_sh, opts)
    xr, _, kr, _, _ = dist_cpminres(mesh, blocks, Mr, b_sh, opts)
    assert int(ks) == int(kr)
    np.testing.assert_allclose(np.asarray(unshard_vector(xs, 400)),
                               np.asarray(unshard_vector(xr, 400)),
                               rtol=1e-5, atol=1e-9)


def test_schur_rejects_wide_interface():
    from cpkrylov_tpu.parallel.schur import plan_schur_precond
    from cpkrylov_tpu.utils.fixtures import random_sqd_system

    # dense-ish random system: RCM cannot localize it
    s_ = random_sqd_system(64, 24, density=0.4, seed=0)
    with pytest.raises(ValueError, match="interface"):
        plan_schur_precond(s_.G, s_.B, s_.C, 4, panel=16, max_interface=4)


def test_halo_plan_rejects_wide_reach():
    import scipy.sparse as sp
    from cpkrylov_tpu.parallel import plan_halo_block

    # a dense row reaches across all chunks
    A = sp.lil_matrix((64, 64))
    A[0, :] = 1.0
    A = A.tocsr()
    with pytest.raises(ValueError, match="halo width"):
        plan_halo_block(A, 4, 16, 16, max_halo=8)


@pytest.mark.parametrize("method", ["cpminres", "cpgmres"])
def test_dist_solve_halo_path(method):
    """On a banded system every block gets a halo plan (edge-only ppermutes
    instead of all-gather, SURVEY.md §2.4) and iteration counts still match
    the serial kernel exactly."""
    from cpkrylov_tpu.parallel.solve import dist_solve, plan_dist
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    sys_ = banded_saddle_system(512, 128, bandwidth=3, with_oracle=False)
    plan = plan_dist(sys_.A, sys_.B, sys_.C, 8, halo=True)
    # The hot-loop blocks (A*v, C*q every iteration, cpminres.m:187-188)
    # must ride the halo path; the rectangular B/B' (used once per solve in
    # the shift and the manifold check) may fall back to all-gather when
    # their pattern does not align with the m_loc/n_loc chunk ratio.
    assert plan.halos["a"] is not None and plan.halos["c"] is not None

    mesh = Mesh(np.array(jax.devices()[:8]), ("rows",))
    opts = SolverOptions(itmax=300, restart=40)
    res, x1, x2 = dist_solve(mesh, method, sys_.b, sys_.A, sys_.B, sys_.C,
                             sys_.G, opts=opts, panel=64, halo=True)
    out = solve(method, sys_.b, sys_.A, sys_.B, sys_.C, sys_.G, opts=opts,
                panel=64)
    assert bool(res.solved) and out.solved
    assert int(res.niters) == out.niters
    np.testing.assert_allclose(np.asarray(x1), np.asarray(out.x1),
                               rtol=1e-7, atol=1e-9)


@pytest.mark.parametrize("ndev", [2,
                                  pytest.param(8, marks=pytest.mark.slow)])
def test_dist_solve_mixed_reaches_f64_tolerance(ndev):
    """Distributed mixed precision (VERDICT r3 item 7): f32 sharded inner
    solves + f64 outer true-residual refinement reach rtol=1e-6 (and
    beyond) on the virtual mesh — BASELINE.json configs[4] semantics."""
    import scipy.sparse as sp

    from cpkrylov_tpu.parallel import dist_solve_mixed
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    sysm = banded_saddle_system(2048, 512, bandwidth=3, with_oracle=False)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))
    opts = SolverOptions(atol=0.0, rtol=1e-10, itmax=300)

    out = dist_solve_mixed(mesh, "cpminres", sysm.b, sysm.A, sysm.B,
                           sysm.C, sysm.G, opts=opts)
    assert out.solved, (out.nouter, out.resid_history)
    K = sp.bmat([[sysm.A, sysm.B.T], [sysm.B, -sysm.C]]).tocsr()
    r = sysm.b - K @ out.x
    assert np.linalg.norm(r) <= 1e-10 * np.linalg.norm(sysm.b)
    # the inner truly ran in f32 on shards: more than one outer pass used
    assert out.nouter >= 1 and out.niters > 0


def test_dist_mixed_cache_tracks_inplace_updates():
    """Distributed analogue of test_mixed_cache_tracks_inplace_updates
    (advisor r4, medium): mutating A.data IN PLACE between two
    dist_solve_mixed calls must not serve stale host-f64 blocks or a stale
    partition plan — the second solve's f64 true residual is computed
    against the NEW system."""
    import scipy.sparse as sp

    from cpkrylov_tpu.parallel import dist_solve_mixed
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    sysm = banded_saddle_system(1024, 256, bandwidth=3, with_oracle=False)
    mesh = Mesh(np.array(jax.devices()[:2]), ("rows",))
    opts = SolverOptions(atol=0.0, rtol=1e-10, itmax=300)

    out1 = dist_solve_mixed(mesh, "cpminres", sysm.b, sysm.A, sysm.B,
                            sysm.C, sysm.G, opts=opts)
    assert out1.solved

    # in-place value change on the SAME objects (same sparsity pattern)
    sysm.A.data *= 1.5
    sysm.G = sp.diags(sysm.A.diagonal()).tocsr()
    out2 = dist_solve_mixed(mesh, "cpminres", sysm.b, sysm.A, sysm.B,
                            sysm.C, sysm.G, opts=opts)
    assert out2.solved
    K2 = sp.bmat([[sysm.A, sysm.B.T], [sysm.B, -sysm.C]]).tocsr()
    r2 = sysm.b - K2 @ out2.x
    assert np.linalg.norm(r2) <= 1e-10 * np.linalg.norm(sysm.b), (
        "stale cached blocks/plan: residual checked against the old A")


def test_schur_sharded_apply_matches_gather_path():
    """Schur-native sharded preconditioner apply (VERDICT r3 item 6): same
    numerics as the all-gather path, with per-apply comms O(N/ndev + s)
    instead of O(N)."""
    import dataclasses as dc

    import jax.numpy as jnp
    from jax.sharding import PartitionSpec as P

    from cpkrylov_tpu import PrecondOptions
    from cpkrylov_tpu.parallel.schur import plan_schur_precond
    from cpkrylov_tpu.parallel.solve import AXIS, precond_spec
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    from cpkrylov_tpu.parallel.solve import shard_map

    ndev = 8
    # slope-matched B + banded G: chunk-aligned riffle ordering AND a
    # nonzero Schur interface (diagonal G would decouple the chunks
    # entirely)
    sysm = banded_saddle_system(2048, 512, bandwidth=3, with_oracle=False,
                                b_mode="slope", g_mode="banded")
    n, m = 2048, 512
    M = plan_schur_precond(sysm.G, sysm.B, sysm.C, ndev,
                           options=PrecondOptions(nitref=0))
    M = dc.replace(M, factor_nitref=0)
    f = M.factor
    assert f.has_shard_plan, "sharded-exchange plan should exist (banded)"
    assert f.s > 0, "banded G should produce a nonzero interface"

    # comms-volume assertion: halo + interface exchange per apply is at
    # least ndev-fold smaller than the all-gather's O(N) per device
    per_apply = 2 * (f.shard_hx + f.shard_hy) + 2 * f.s
    assert per_apply * ndev < (n + m), (per_apply, f.s, f.shard_hx,
                                        f.shard_hy)

    mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))
    n_loc, m_loc = f.shard_nloc, f.shard_mloc
    rng_ = np.random.default_rng(7)
    z = rng_.standard_normal(n + m)
    zx = np.zeros(ndev * n_loc)
    zx[:n] = z[:n]
    zy = np.zeros(ndev * m_loc)
    zy[:m] = z[n:]

    def body(fac, zx_loc, zy_loc):
        yn, ym = fac.solve_sharded(zx_loc, zy_loc)
        yfull = fac.solve(jax.lax.all_gather(
            jnp.concatenate([zx_loc, zy_loc]), AXIS, tiled=True)[:0]
            if False else jnp.concatenate([
                jax.lax.all_gather(zx_loc, AXIS, tiled=True)[:n],
                jax.lax.all_gather(zy_loc, AXIS, tiled=True)[:m]]))
        return yn, ym, yfull

    fspec = f.partition_spec()
    out = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(fspec, P(AXIS), P(AXIS)),
        out_specs=(P(AXIS), P(AXIS), P()),
        check_vma=False,
    ))(f, jnp.asarray(zx), jnp.asarray(zy))
    yn, ym, yfull = (np.asarray(o) for o in out)
    np.testing.assert_allclose(yn[:n], yfull[:n], rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(ym[:m], yfull[n:n + m], rtol=1e-10,
                               atol=1e-12)


def test_dist_solve_uses_sharded_schur_apply():
    """End-to-end: dist_solve with a lean Schur preconditioner takes the
    sharded apply path and retains iteration parity with the serial solve."""
    import dataclasses as dc

    from cpkrylov_tpu import PrecondOptions
    from cpkrylov_tpu.parallel.schur import plan_schur_precond
    from cpkrylov_tpu.parallel.solve import dist_solve
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    ndev = 8
    sysm = banded_saddle_system(2048, 512, bandwidth=3, with_oracle=False,
                                b_mode="slope", g_mode="banded")
    M = plan_schur_precond(sysm.G, sysm.B, sysm.C, ndev,
                           options=PrecondOptions(nitref=0))
    M = dc.replace(M, factor_nitref=0)
    assert M.factor.has_shard_plan
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))
    # rtol=1e-6: at 1e-8 this knife-edge system trips the indefiniteness
    # guard in SERIAL too (nitref=0 factor accuracy floor)
    opts = SolverOptions(atol=0.0, rtol=1e-6, itmax=300)

    res, x1, x2 = dist_solve(mesh, "cpminres", sysm.b, sysm.A, sysm.B,
                             sysm.C, sysm.G, opts=opts, M=M)
    ser = solve("cpminres", sysm.b, sysm.A, sysm.B, sysm.C, sysm.G,
                opts=opts, precond_opts=PrecondOptions(nitref=0))
    assert bool(res.solved) and ser.solved
    assert abs(int(res.niters) - ser.niters) <= 1
    rel = (np.linalg.norm(np.asarray(x1) - np.asarray(ser.x1))
           / np.linalg.norm(np.asarray(ser.x1)))
    assert rel < 1e-6, rel


def test_dist_solve_ghn_itref_sharded_parity():
    """Reference-parity options (residual_update + nitref=1 + force_itref,
    cpk_exprog1.m:87-92) through the FULLY-SHARDED preconditioner path
    (VERDICT r4 item 4a): with a Schur factor + partitioned K_P blocks the
    GHN caches live sharded and every K_P SpMV runs on shards — iteration
    count and solution must match the serial solve."""
    import dataclasses as dc

    import scipy.sparse.linalg as spla

    from cpkrylov_tpu import PrecondOptions
    from cpkrylov_tpu.parallel.schur import plan_schur_precond
    from cpkrylov_tpu.parallel.solve import dist_solve
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    ndev = 8
    import scipy.sparse as sp

    s_ = banded_saddle_system(2048, 512, bandwidth=3, with_oracle=False,
                              b_mode="slope", g_mode="banded")
    K = sp.bmat([[s_.A, s_.B.T], [s_.B, -s_.C]], format="csc")
    xref = spla.spsolve(K, s_.b)
    mesh = Mesh(np.array(jax.devices()[:ndev]), ("rows",))
    popts = PrecondOptions(residual_update=True, nitref=1, force_itref=True)
    opts = SolverOptions(atol=1e-6, rtol=1e-6, itmax=300, restart=40)
    Ms = plan_schur_precond(s_.G, s_.B, s_.C, ndev, options=popts, panel=16)
    assert Ms.factor.has_shard_plan
    for method in ("cpminres", "cpgmres"):
        res, x1, x2 = dist_solve(mesh, method, s_.b, s_.A, s_.B, s_.C,
                                 s_.G, opts=opts, M=Ms)
        out = solve(method, s_.b, s_.A, s_.B, s_.C, s_.G, opts=opts,
                    precond_opts=popts, panel=16)
        assert abs(int(res.niters) - int(out.niters)) <= 1, method
        xfull = np.concatenate([np.asarray(x1), np.asarray(x2)])
        err = np.linalg.norm(xfull - xref) / np.linalg.norm(xref)
        assert err < 1e-4, (method, err)
