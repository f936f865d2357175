"""Fused Pallas trisolve: packing and kernel semantics.

The kernel itself runs on TPU; on the CPU test backend we exercise
(a) the lane-major packing + pure-XLA evaluation path against the
    ReducedScanTriFactor oracle and scipy's exact triangular solve, and
(b) the kernel body via the Pallas interpreter on a small system.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp
import scipy.sparse.linalg as spla

from cpkrylov_tpu.precond.pallas_tri import (affine_lane_scan,
                                             affine_lane_scan_reference,
                                             build_pallas_tri,
                                             pallas_tri_solve,
                                             pallas_tri_solve_xla)
from cpkrylov_tpu.precond.trisolve import (build_reduced_scan_tri,
                                           reduced_scan_tri_solve)


def _banded_lower(n, reach, seed=0):
    rng = np.random.default_rng(seed)
    diags = [np.full(n, 4.0)] + [rng.standard_normal(n) * 0.3
                                 for _ in range(reach)]
    offs = [0] + [-(k + 1) for k in range(reach)]
    return sp.diags(diags, offs, shape=(n, n), format="csr")


def test_pallas_packing_matches_reduced_scan():
    n = 2048
    T = _banded_lower(n, reach=5)
    tf_p = build_pallas_tri(T, panel=16, chunk=64)
    tf_r = build_reduced_scan_tri(T, panel=16, dtype=np.float32)
    assert tf_p is not None and tf_r is not None
    assert tf_p.panel == tf_r.panel and tf_p.r == tf_r.r
    np.testing.assert_array_equal(
        np.asarray(tf_p.inv_t)[:, :, : tf_p.nb].transpose(2, 0, 1),
        np.asarray(tf_r.inv_diag))

    rng = np.random.default_rng(1)
    b = rng.standard_normal(n).astype(np.float32)
    x64 = spla.spsolve_triangular(T.tocsr(), b.astype(np.float64),
                                  lower=True)
    x_xla = np.asarray(pallas_tri_solve_xla(tf_p, jnp.asarray(b)))
    x_red = np.asarray(reduced_scan_tri_solve(tf_r, jnp.asarray(b)))
    den = np.linalg.norm(x64)
    assert np.linalg.norm(x_xla - x64) / den < 1e-5
    assert np.linalg.norm(x_xla - x_red) / den < 1e-5


def test_pallas_kernel_interpret_mode():
    n = 1024
    T = _banded_lower(n, reach=3, seed=2)
    tf = build_pallas_tri(T, panel=16, chunk=16)
    assert tf is not None
    rng = np.random.default_rng(3)
    b = rng.standard_normal(n).astype(np.float32)
    x64 = spla.spsolve_triangular(T.tocsr(), b.astype(np.float64),
                                  lower=True)
    x = np.asarray(pallas_tri_solve(tf, jnp.asarray(b), interpret=True))
    assert np.linalg.norm(x - x64) / np.linalg.norm(x64) < 1e-5


def test_pallas_kernel_interpret_mode_p8():
    """p=8 (the minimum clean-sublane panel, round-5 default for narrow
    bands) through the lane-major kernel, multi-chunk so the carry path
    runs."""
    n = 2048
    T = _banded_lower(n, reach=1, seed=5)
    tf = build_pallas_tri(T, panel=8, chunk=32)
    assert tf is not None and tf.panel == 8
    rng = np.random.default_rng(6)
    b = rng.standard_normal(n).astype(np.float32)
    x64 = spla.spsolve_triangular(T.tocsr(), b.astype(np.float64),
                                  lower=True)
    x = np.asarray(pallas_tri_solve(tf, jnp.asarray(b), interpret=True))
    assert np.linalg.norm(x - x64) / np.linalg.norm(x64) < 1e-5


def test_affine_lane_scan_interpret_matches_reference():
    rng = np.random.default_rng(4)
    r, nb = 8, 128
    mr = jnp.asarray(rng.standard_normal((r, r, nb)) * 0.1, jnp.float32)
    cr = jnp.asarray(rng.standard_normal((r, nb)), jnp.float32)
    ref = np.asarray(affine_lane_scan_reference(mr, cr))
    # interpret-mode run of the standalone scan kernel
    import functools

    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from cpkrylov_tpu.precond.pallas_tri import _affine_scan_kernel

    K = 64
    kernel = functools.partial(_affine_scan_kernel, r=r, K=K)
    got = pl.pallas_call(
        kernel,
        grid=(nb // K,),
        in_specs=[
            pl.BlockSpec((r, r, K), lambda i: (0, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((r, K), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((r, K), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((r, nb), jnp.float32),
        scratch_shapes=[pltpu.VMEM((r, 128), jnp.float32)],
        interpret=True,
    )(mr, cr)
    np.testing.assert_allclose(np.asarray(got), ref, rtol=2e-4, atol=2e-4)


def test_bidiag_kernel_interpret_matches_scipy():
    """Flat-layout bidiagonal kernel (round 5): multi-chunk + multi-row
    stitch path vs an f64 scipy triangular solve."""
    import scipy.sparse as sp

    from cpkrylov_tpu.precond.pallas_bidiag import (bidiag_tri_solve,
                                                    build_bidiag_tri)

    rng = np.random.default_rng(11)
    n = 40_000
    d = 1.0 + rng.random(n)
    lo = rng.standard_normal(n - 1) * 0.4
    T = sp.diags([d, lo], [0, -1], format="csr")
    tf = build_bidiag_tri(T, chunk=1024)
    assert tf is not None
    b = rng.standard_normal(n).astype(np.float32)
    x64 = spla.spsolve_triangular(T.tocsr(), b.astype(np.float64),
                                  lower=True)
    x = np.asarray(bidiag_tri_solve(tf, jnp.asarray(b), interpret=True))
    assert np.linalg.norm(x - x64) / np.linalg.norm(x64) < 1e-5


def test_bidiag_build_gates():
    """The bidiag build must reject non-bidiagonal, zero-diagonal, and
    too-small inputs (callers fall through to the panel forms)."""
    import scipy.sparse as sp

    from cpkrylov_tpu.precond.pallas_bidiag import build_bidiag_tri

    rng = np.random.default_rng(1)
    n = 40_000
    d = 1.0 + rng.random(n)
    assert build_bidiag_tri(
        sp.diags([d, rng.standard_normal(n - 2)], [0, -2]), chunk=1024) \
        is None                                   # reach 2
    assert build_bidiag_tri(sp.diags([d[:100]], [0]), chunk=1024) is None
    d0 = d.copy()
    d0[7] = 0.0
    assert build_bidiag_tri(sp.diags([d0], [0]), chunk=1024) is None


def test_bidiag_upper_kernel_interpret_matches_scipy():
    """Reversed-direction bidiagonal kernel (upper solves without runtime
    flips): multi-chunk + multi-segment + row-stitch path vs scipy."""
    import scipy.sparse as sp

    from cpkrylov_tpu.precond.pallas_bidiag import (bidiag_tri_solve,
                                                    build_bidiag_tri_upper)

    rng = np.random.default_rng(12)
    n = 40_000
    d = 1.0 + rng.random(n)
    up = rng.standard_normal(n - 1) * 0.4
    U = sp.diags([d, up], [0, 1], format="csr")
    tf = build_bidiag_tri_upper(U, chunk=1024)
    assert tf is not None and tf.reverse
    b = rng.standard_normal(n).astype(np.float32)
    x64 = spla.spsolve_triangular(U.tocsr(), b.astype(np.float64),
                                  lower=False)
    x = np.asarray(bidiag_tri_solve(tf, jnp.asarray(b), interpret=True))
    assert np.linalg.norm(x - x64) / np.linalg.norm(x64) < 1e-5


def test_bidiag_upper_dinv_fold_algebra():
    """The D^-1 fold (tf2 solves D*U instead of U after the scale pass,
    cp.py build_factor_apply): (D U)^-1 v must equal U^-1 (D^-1 v) — the
    TPU build relies on this identity to drop the explicit scale pass."""
    import scipy.sparse as sp

    from cpkrylov_tpu.precond.pallas_bidiag import (bidiag_tri_solve,
                                                    build_bidiag_tri_upper)

    rng = np.random.default_rng(21)
    n = 40_000
    d = np.where(rng.random(n) < 0.5, -1.0, 1.0) * (0.5 + rng.random(n))
    up = rng.standard_normal(n - 1) * 0.4
    U = sp.diags([np.ones(n), up], [0, 1], format="csr")   # unit diag L'
    DU = (sp.diags(d) @ U).tocsr()
    tf = build_bidiag_tri_upper(DU, chunk=1024)
    assert tf is not None and tf.reverse
    b = rng.standard_normal(n).astype(np.float32)
    x = np.asarray(bidiag_tri_solve(tf, jnp.asarray(b), interpret=True),
                   np.float64)
    xref = spla.spsolve_triangular(U.tocsr(), (b / d), lower=False)
    assert np.linalg.norm(x - xref) / np.linalg.norm(xref) < 1e-5
