"""Unit tests: sparse containers and matvecs against scipy oracles."""
import jax.numpy as jnp
import numpy as np
import pytest
import scipy.sparse as sp

from cpkrylov_tpu.ops import (CSR, ELL, csr_from_scipy, csr_matvec,
                              csr_rmatvec, csr_to_scipy, ell_from_scipy,
                              ell_matvec)


@pytest.mark.parametrize("shape,density", [((40, 40), 0.1), ((30, 50), 0.2),
                                           ((64, 16), 0.05), ((1, 1), 1.0)])
def test_csr_matvec_matches_scipy(shape, density, rng):
    A = sp.random(*shape, density=density, random_state=rng, format="csr")
    x = rng.standard_normal(shape[1])
    dev = csr_from_scipy(A)
    np.testing.assert_allclose(np.asarray(csr_matvec(dev, x)), A @ x,
                               rtol=1e-12, atol=1e-12)


def test_csr_rmatvec_matches_scipy(rng):
    A = sp.random(25, 60, density=0.15, random_state=rng, format="csr")
    y = rng.standard_normal(25)
    dev = csr_from_scipy(A)
    np.testing.assert_allclose(np.asarray(csr_rmatvec(dev, y)), A.T @ y,
                               rtol=1e-12, atol=1e-12)


def test_csr_padding_is_inert(rng):
    A = sp.random(10, 10, density=0.3, random_state=rng, format="csr")
    x = rng.standard_normal(10)
    padded = csr_from_scipy(A, pad_to=A.nnz + 37)
    np.testing.assert_allclose(np.asarray(csr_matvec(padded, x)), A @ x,
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("lane_pad", [1, 8])
def test_ell_matvec_matches_scipy(rng, lane_pad):
    A = sp.random(37, 53, density=0.12, random_state=rng, format="csr")
    x = rng.standard_normal(53)
    dev = ell_from_scipy(A, lane_pad=lane_pad)
    np.testing.assert_allclose(np.asarray(ell_matvec(dev, x)), A @ x,
                               rtol=1e-12, atol=1e-12)


def test_empty_matrix():
    A = sp.csr_matrix((5, 5))
    x = np.ones(5)
    np.testing.assert_array_equal(np.asarray(csr_matvec(csr_from_scipy(A), x)),
                                  np.zeros(5))
    np.testing.assert_array_equal(np.asarray(ell_matvec(ell_from_scipy(A), x)),
                                  np.zeros(5))


def test_csr_roundtrip(rng):
    A = sp.random(20, 20, density=0.2, random_state=rng, format="csr")
    back = csr_to_scipy(csr_from_scipy(A))
    assert abs(A - back).max() < 1e-15


def test_pytree_flatten():
    import jax

    A = sp.random(8, 8, density=0.3, random_state=np.random.default_rng(0),
                  format="csr")
    dev = csr_from_scipy(A)
    leaves, treedef = jax.tree_util.tree_flatten(dev)
    dev2 = jax.tree_util.tree_unflatten(treedef, leaves)
    assert dev2.shape == dev.shape


def test_bsr_matvec_matches_scipy():
    import scipy.sparse as sp

    from cpkrylov_tpu.ops.formats import bsr_from_scipy
    from cpkrylov_tpu.ops.spmv import bsr_matvec

    rng_ = np.random.default_rng(11)
    A = sp.random(100, 90, density=0.08, random_state=rng_, format="csr")
    for bs in (4, 8):
        mat = bsr_from_scipy(A, blocksize=bs)
        x = rng_.standard_normal(90)
        xp = np.zeros(mat.shape[1]); xp[:90] = x
        y = np.asarray(bsr_matvec(mat, jnp.asarray(xp)))
        np.testing.assert_allclose(y[:100], A @ x, rtol=1e-12, atol=1e-12)


def test_spmm_all_formats_match_scipy():
    import scipy.sparse as sp

    from cpkrylov_tpu.ops.formats import (bsr_from_scipy, csr_from_scipy,
                                          ell_from_scipy)
    from cpkrylov_tpu.ops.spmv import matmat

    rng_ = np.random.default_rng(12)
    A = sp.random(64, 48, density=0.1, random_state=rng_, format="csr")
    X = rng_.standard_normal((48, 7))
    want = A @ X
    got_csr = np.asarray(matmat(csr_from_scipy(A), jnp.asarray(X)))
    got_ell = np.asarray(matmat(ell_from_scipy(A), jnp.asarray(X)))
    np.testing.assert_allclose(got_csr, want, rtol=1e-12, atol=1e-12)
    np.testing.assert_allclose(got_ell, want, rtol=1e-12, atol=1e-12)
    bsr = bsr_from_scipy(A, blocksize=8)
    Xp = np.zeros((bsr.shape[1], 7)); Xp[:48] = X
    got_bsr = np.asarray(matmat(bsr, jnp.asarray(Xp)))
    np.testing.assert_allclose(got_bsr[:64], want, rtol=1e-12, atol=1e-12)


def test_bsr_empty_matrix():
    import scipy.sparse as sp

    from cpkrylov_tpu.ops.formats import bsr_from_scipy
    from cpkrylov_tpu.ops.spmv import bsr_matvec

    A = sp.csr_matrix((16, 16))
    mat = bsr_from_scipy(A, blocksize=8)
    y = np.asarray(bsr_matvec(mat, jnp.ones(16)))
    np.testing.assert_array_equal(y, 0.0)
