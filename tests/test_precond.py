"""Preconditioner tests: native LDL, blocked trisolve, and opLDL2 semantics
(GHN residual update + iterative refinement) against scipy oracles."""
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from cpkrylov_tpu.config import PrecondOptions
from cpkrylov_tpu.precond import (build_block_tri, build_block_tri_upper,
                                  block_tri_solve, make_preconditioner,
                                  assemble_kp)
from cpkrylov_tpu.precond import ldl_host
from cpkrylov_tpu.utils.fixtures import random_sqd_system


def _sqd_matrix(n, m, rng, delta=1e-2):
    sys_ = random_sqd_system(n, m, seed=int(rng.integers(1 << 30)),
                             delta=delta)
    return assemble_kp(sys_.G, sys_.B, sys_.C)


# ---------------------------------------------------------------------------
# Native LDL^T
# ---------------------------------------------------------------------------

def test_native_ldl_reconstructs(rng):
    K = _sqd_matrix(40, 15, rng)
    f = ldl_host.ldl_factor(K, ordering="rcm")
    n = K.shape[0]
    L = (f.L + sp.identity(n)).toarray()
    rec = L @ np.diag(f.d) @ L.T
    Kp = K[f.perm][:, f.perm].toarray()
    np.testing.assert_allclose(rec, Kp, rtol=1e-10, atol=1e-10)
    assert f.nperturbed == 0


def test_native_ldl_natural_ordering(rng):
    K = _sqd_matrix(25, 10, rng)
    f = ldl_host.ldl_factor(K, ordering="natural")
    n = K.shape[0]
    L = (f.L + sp.identity(n)).toarray()
    np.testing.assert_allclose(L @ np.diag(f.d) @ L.T, K.toarray(),
                               rtol=1e-10, atol=1e-10)


def test_native_ldl_pivot_signs(rng):
    # SQD: first n pivots positive, last m negative under natural order.
    K = _sqd_matrix(30, 12, rng)
    f = ldl_host.ldl_factor(K, ordering="natural",
                            pivot_signs=np.r_[np.ones(30), -np.ones(12)])
    assert f.nperturbed == 0
    assert (f.d[:30] > 0).all() and (f.d[30:] < 0).all()


# ---------------------------------------------------------------------------
# Blocked triangular solve
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("panel", [4, 16, 64])
def test_block_tri_solve_lower(rng, panel):
    n = 50
    L = sp.tril(sp.random(n, n, density=0.2, random_state=rng), k=-1) \
        + sp.identity(n) * 3.0
    b = rng.standard_normal(n)
    tf = build_block_tri(L.tocsr(), panel=panel)
    x = np.asarray(block_tri_solve(tf, b))
    np.testing.assert_allclose(x, spla.spsolve_triangular(L.tocsr(), b,
                                                          lower=True),
                               rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("panel", [8, 32])
def test_block_tri_solve_upper(rng, panel):
    n = 45
    U = sp.triu(sp.random(n, n, density=0.2, random_state=rng), k=1) \
        + sp.identity(n) * 2.0
    b = rng.standard_normal(n)
    tf = build_block_tri_upper(U.tocsr(), panel=panel)
    # upper solve = rev . lower-solve(rev U rev) . rev  (see trisolve.py)
    x = np.asarray(block_tri_solve(tf, b[::-1].copy()))[::-1]
    np.testing.assert_allclose(
        x, spla.spsolve_triangular(U.tocsr(), b, lower=False),
        rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("band", [1, 3, 17])
@pytest.mark.parametrize("panel", [32, 128])
def test_scan_tri_solve_matches_sequential(rng, band, panel):
    """The parallel-prefix (associative-scan) solve must agree with the
    sequential blocked substitution on banded factors."""
    from cpkrylov_tpu.precond.trisolve import (build_scan_tri,
                                               scan_tri_solve, tri_solve)

    n = 700
    diags = [3.0 + rng.random(n)]
    offsets = [0]
    for off in range(1, band + 1):
        diags.append(rng.random(n - off) * 0.4)
        offsets.append(-off)
    T = sp.diags(diags, offsets, format="csr")
    b = rng.standard_normal(n)
    tf = build_scan_tri(T, panel=panel)
    assert tf is not None
    x = np.asarray(scan_tri_solve(tf, b))
    xref = spla.spsolve_triangular(T.tocsr(), b, lower=True)
    np.testing.assert_allclose(x, xref, rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(tri_solve(tf, b)), xref,
                               rtol=1e-10, atol=1e-12)


def test_scan_tri_rejects_wide_reach(rng):
    from cpkrylov_tpu.precond.trisolve import build_scan_tri

    n = 400
    T = (sp.identity(n) * 2.0
         + sp.diags([rng.random(n - 150)], [-150])).tocsr()
    assert build_scan_tri(T, panel=128) is None


def test_banded_system_uses_scan_factor():
    """Banded SQD systems must get the scan factor automatically and still
    solve to tolerance through the full driver."""
    from cpkrylov_tpu import SolverOptions, make_preconditioner, solve
    from cpkrylov_tpu.precond.trisolve import ReducedScanTriFactor
    from cpkrylov_tpu.utils import fixtures

    sys_ = fixtures.banded_saddle_system(4000, 1000, bandwidth=3)
    M = make_preconditioner(sys_.G, sys_.B, sys_.C)
    assert isinstance(M.factor.tf1, ReducedScanTriFactor)
    assert isinstance(M.factor.tf2, ReducedScanTriFactor)
    out = solve("cpminres", sys_.b, sys_.A, sys_.B, sys_.C, sys_.G,
                opts=SolverOptions(itmax=300), M=M)
    assert out.solved
    resid = np.linalg.norm(sys_.b - sys_.K @ np.asarray(out.x))
    assert resid <= 1e-5 * np.linalg.norm(sys_.b)


# ---------------------------------------------------------------------------
# Full preconditioner: direct solve path
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("backend", ["ldl", "lu"])
def test_factor_solve_matches_spsolve(rng, backend):
    import jax.numpy as jnp

    sys_ = random_sqd_system(60, 25, seed=7)
    M = make_preconditioner(sys_.G, sys_.B, sys_.C, backend=backend,
                            panel=32,
                            options=PrecondOptions(nitref=0))
    K = assemble_kp(sys_.G, sys_.B, sys_.C)
    z = rng.standard_normal(85)
    y = np.asarray(M.factor.solve(jnp.asarray(z)))
    y_ref = spla.spsolve(K.tocsc(), z)
    np.testing.assert_allclose(y, y_ref, rtol=1e-8, atol=1e-8)


def _oracle_apply(K_lu, Ksp, n, m, opts: PrecondOptions, state, z):
    """Numpy transcription of opLDL2.multiply (opLDL2.m:161-188)."""
    aty, cy = state
    if opts.residual_update:
        zz = np.concatenate([z[:n] - aty, z[n:] - cy])
    else:
        zz = z
    y = K_lu(zz)
    if opts.residual_update:
        gv = Ksp @ np.concatenate([np.zeros(n), y[n:]])
        state = (gv[:n], gv[n:])
    if opts.nitref > 0:
        r = z - Ksp @ y
        rnorm, xnorm = np.linalg.norm(r), np.linalg.norm(z)
        nit = 0
        while nit < opts.nitref and (rnorm >= opts.itref_tol * xnorm
                                     or opts.force_itref):
            y = y + K_lu(r)
            r = z - Ksp @ y
            rnorm = np.linalg.norm(r)
            nit += 1
    return state, y


@pytest.mark.parametrize("popts", [
    PrecondOptions(nitref=0),
    PrecondOptions(nitref=3, itref_tol=1e-8),
    PrecondOptions(nitref=1, force_itref=True, residual_update=True),
    PrecondOptions(nitref=2, residual_update=True),
])
def test_apply_matches_opldl2_oracle(rng, popts):
    import jax.numpy as jnp

    sys_ = random_sqd_system(40, 18, seed=11)
    M = make_preconditioner(sys_.G, sys_.B, sys_.C, backend="ldl", panel=16,
                            options=popts)
    Ksp = assemble_kp(sys_.G, sys_.B, sys_.C).tocsc()
    lu = spla.splu(Ksp)
    n, m = 40, 18

    state_dev = M.init_state(np.float64)
    state_ref = (np.zeros(n), np.zeros(m))
    # three consecutive applications exercise the GHN cache coupling
    for i in range(3):
        z = rng.standard_normal(n + m)
        state_dev, y_dev, _ = M.apply(state_dev, jnp.asarray(z))
        state_ref, y_ref = _oracle_apply(lu.solve, Ksp, n, m, popts,
                                         state_ref, z)
        np.testing.assert_allclose(np.asarray(y_dev), y_ref, rtol=1e-9,
                                   atol=1e-10, err_msg=f"application {i}")


def test_opldl2_api_parity_extras():
    """divide / double() / transpose equivalents (opLDL2.m:120-195)."""
    import jax.numpy as jnp

    from cpkrylov_tpu.utils.fixtures import random_sqd_system

    s = random_sqd_system(48, 16, seed=5, delta=1e-2)
    M = make_preconditioner(s.G, s.B, s.C, panel=16)
    N = s.n + s.m
    rng_ = np.random.default_rng(0)
    z = jnp.asarray(rng_.standard_normal(N))

    # divide: mul_kp(apply(z)) == z  (solve then multiply round-trips)
    st = M.init_state(z.dtype)
    _, y, _ = M.apply(st, z)
    np.testing.assert_allclose(np.asarray(M.mul_kp(y)), np.asarray(z),
                               rtol=1e-8, atol=1e-9)

    # double(): dense inverse times K_P is the identity
    inv = np.asarray(M.to_dense_inverse())
    import scipy.sparse as sp

    KP = sp.bmat([[s.G, s.B.T], [s.B, -s.C]]).toarray()
    np.testing.assert_allclose(inv @ KP, np.eye(N), atol=1e-7)

    # transpose: symmetric operator is its own transpose
    assert M.T is M and M.transpose() is M


# ---------------------------------------------------------------------------
# 2x2 block pivoting (VERDICT r1 item 3)
# ---------------------------------------------------------------------------

def _reconstruct_ldl(fac, n):
    import scipy.sparse as sp

    L1 = (fac.L + sp.identity(n)).tocsc()
    B = sp.diags(fac.d).tolil()
    if fac.e is not None:
        for p in np.nonzero(fac.e)[0]:
            B[p, p + 1] = fac.e[p]
            B[p + 1, p] = fac.e[p]
    return (L1 @ B.tocsc() @ L1.T).toarray()


def _indefinite_system(n=60, m=25, seed=1):
    import scipy.sparse as sp

    rng = np.random.default_rng(seed)
    G = sp.lil_matrix((n, n))
    for i in range(0, n, 2):       # zero diagonal: needs 2x2 pivots
        G[i, i + 1] = 1.0
        G[i + 1, i] = 1.0
    B = sp.random(m, n, 0.3, random_state=seed) \
        + sp.diags(np.ones(m), 0, shape=(m, n))
    C = sp.diags(np.full(m, 1e-8))
    return G.tocsc(), B.tocsr(), C.tocsr(), rng

def test_ldl_2x2_pivots_factor_indefinite_exactly():
    """Zero-diagonal G (not quasi-definite) must factor exactly via adjacent
    2x2 blocks — no regularized pivots, no LU fallback (MA57 parity,
    /root/reference/ops/opLDL2.m:82)."""
    from cpkrylov_tpu.precond import ldl_host

    G, B, C, rng = _indefinite_system()
    n, m = G.shape[0], C.shape[0]
    import scipy.sparse as sp
    K = sp.bmat([[G, B.T], [B, -C]], format="csc")
    signs = np.concatenate([np.ones(n), -np.ones(m)])
    fac = ldl_host.ldl_factor(K, pivot_signs=signs, ordering="natural")
    assert fac.n2x2 > 0
    assert fac.nperturbed == 0
    err = np.abs(_reconstruct_ldl(fac, n + m)
                 - K[fac.perm][:, fac.perm].toarray()).max()
    assert err < 1e-10
    # host solve with block-diagonal D
    z = rng.standard_normal(n + m)
    y = ldl_host.solve_host(fac, z)
    np.testing.assert_allclose(K @ y, z, rtol=0, atol=1e-9)


def test_make_preconditioner_indefinite_g_exact_and_refinement_free():
    """The exact 2x2-pivoted factor must drop the internal refinement step
    (data-driven factor_nitref), and the device block-D solve must match a
    dense solve."""
    import jax.numpy as jnp
    import scipy.sparse as sp
    from cpkrylov_tpu.precond.cp import make_preconditioner

    G, B, C, rng = _indefinite_system()
    n, m = G.shape[0], C.shape[0]
    M = make_preconditioner(G, B, C, ordering="natural")
    assert M.nperturbed == 0
    assert M.factor_nitref == 0         # exact factor: no hot-loop tax
    assert M.factor.dinv_sub is not None
    K = sp.bmat([[G, B.T], [B, -C]], format="csc")
    z = rng.standard_normal(n + m)
    y = np.asarray(M.factor.solve(jnp.asarray(z)))
    yref = np.linalg.solve(K.toarray(), z)
    assert np.linalg.norm(y - yref) / np.linalg.norm(yref) < 1e-10


def test_indefinite_g_solve_e2e():
    """Full driver solve with an *indefinite* G that is still SPD on
    null(B) (the CP-kernel requirement): G = I - t B'B has negative
    diagonal entries (wrong-sign pivots -> 2x2 pairing rounds) yet
    Z'GZ = I on the constraint nullspace.  CPMINRES must converge with the
    exact block-pivoted preconditioner, validated against a direct solve
    (reference example pattern, cpk_exprog1.m:100-104)."""
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla
    from cpkrylov_tpu import SolverOptions, solve
    from cpkrylov_tpu.precond.cp import make_preconditioner

    rng = np.random.default_rng(3)
    n, m = 80, 30
    B = (sp.random(m, n, 0.2, random_state=3)
         + sp.diags(np.ones(m), 0, shape=(m, n))).tocsr()
    G = (sp.identity(n) - 4.0 * (B.T @ B)).tocsc()
    assert (G.diagonal() < 0).any()          # genuinely indefinite
    C = sp.diags(np.full(m, 1e-8)).tocsr()
    A = (sp.diags(1.0 + rng.random(n)) + 0.1 * (B.T @ B)).tocsr()
    K = sp.bmat([[A, B.T], [B, -C]], format="csc")
    b = rng.standard_normal(n + m)

    M = make_preconditioner(G, B, C)
    assert M.nperturbed == 0                 # factored without perturbation
    # rtol 1e-6: beyond ~1e-8 relative accuracy even the exact-LU
    # preconditioner hits the roundoff indefiniteness guard (the C=1e-8
    # regularization splits scales by 1e16 in f64).
    out = solve("cpminres", b, A, B, C, G, M=M,
                opts=SolverOptions(atol=0.0, rtol=1e-6, itmax=300))
    xref = spla.spsolve(K, b)
    assert out.solved
    # kappa(K) ~ 1e8 (delta-regularization): residual 1e-6 => error ~1e-3
    assert np.linalg.norm(np.asarray(out.x) - xref) / np.linalg.norm(xref) \
        < 5e-3
