"""CPMINRES: unit tests on synthetic systems + the cvxqp1_m golden baseline.

Golden targets from BASELINE.md (measured from 1:1 reference transcription):
CPMINRES on cvxqp1_m with the example-1 settings converges in 53 iterations
(rel-err 7.8e-07); with solver defaults in 54.
"""
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from cpkrylov_tpu import (PrecondOptions, SolverOptions, solve)
from cpkrylov_tpu.utils.fixtures import random_sqd_system


def test_exact_preconditioner_converges_immediately():
    # G = A makes the preconditioned operator the identity on the relevant
    # subspace: convergence in O(1) iterations.
    s = random_sqd_system(50, 20, seed=3, g_exact=True)
    out = solve("cpminres", s.b, s.A, s.B, s.C, s.G, panel=32)
    assert out.solved
    assert out.niters <= 2
    x_ref = spla.spsolve(s.K.tocsc(), s.b)
    rel = np.linalg.norm(np.asarray(out.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-6


@pytest.mark.parametrize("backend", ["ldl", "lu"])
def test_random_system_matches_direct(backend):
    s = random_sqd_system(80, 30, seed=5, delta=1e-2)
    out = solve("cpminres", s.b, s.A, s.B, s.C, s.G, backend=backend,
                panel=32, opts=SolverOptions(atol=1e-7, rtol=1e-7))
    assert out.solved
    x_ref = spla.spsolve(s.K.tocsc(), s.b)
    rel = np.linalg.norm(np.asarray(out.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-6


def test_zero_b2_skips_shift():
    s = random_sqd_system(40, 15, seed=9)
    b = s.b.copy()
    b[40:] = 0.0
    out = solve("cpminres", b, s.A, s.B, s.C, s.G, panel=32)
    assert out.solved
    x_ref = spla.spsolve(s.K.tocsc(), b)
    rel = np.linalg.norm(np.asarray(out.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 1e-5


def test_constraint_preservation():
    # The defining CP property: iterates satisfy B x1 - C x2 ≈ b2 throughout
    # (here checked at the final iterate).
    s = random_sqd_system(60, 25, seed=13)
    out = solve("cpminres", s.b, s.A, s.B, s.C, s.G, panel=32)
    cons = s.B @ np.asarray(out.x1) - s.C @ np.asarray(out.x2)
    np.testing.assert_allclose(cons, s.b[60:], rtol=1e-6, atol=1e-6)


@pytest.mark.parametrize("backend", ["ldl", "lu"])
def test_cvxqp1_golden_iterations(cvxqp1, backend):
    # Example-1 settings: cpk_exprog1.m:79-92.
    out = solve(
        "cpminres", cvxqp1.b, cvxqp1.A, cvxqp1.B, cvxqp1.C, cvxqp1.G,
        backend=backend,
        opts=SolverOptions(atol=1e-6, rtol=1e-6, itmax=500),
        precond_opts=PrecondOptions(residual_update=True, nitref=1,
                                    force_itref=True, itref_tol=1e-8),
    )
    assert out.solved
    assert abs(out.niters - 53) <= 2, f"niters={out.niters}, expected 53±2"
    x_ref = spla.spsolve(cvxqp1.K.tocsc(), cvxqp1.b)
    rel = np.linalg.norm(np.asarray(out.x) - x_ref) / np.linalg.norm(x_ref)
    assert rel < 5e-6, f"rel-err {rel}"
    # residual norms from BASELINE.md: ||r0|| = 4.18e+02 -> ||rf|| = 3.25e-04
    assert abs(out.resid_history[0] - 4.18e2) / 4.18e2 < 0.05
    assert out.resid_history[-1] < 4.2e-4


def test_cvxqp1_default_options(cvxqp1):
    out = solve(
        "cpminres", cvxqp1.b, cvxqp1.A, cvxqp1.B, cvxqp1.C, cvxqp1.G,
        opts=SolverOptions(itmax=500),
    )
    assert out.solved
    assert abs(out.niters - 54) <= 2, f"niters={out.niters}, expected 54±2"
