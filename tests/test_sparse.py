"""Unit tests: sparse containers and matvecs against scipy oracles."""
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
