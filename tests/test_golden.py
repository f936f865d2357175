"""Golden parity tests: every kernel against the measured reference baseline
(BASELINE.md) on the two shipped CVXQP fixtures, using the example programs'
settings (cpk_exprog1.m:79-92 / cpk_exprog2.m:77-92)."""
import numpy as np
import pytest
import scipy.sparse.linalg as spla

from cpkrylov_tpu import PrecondOptions, SolverOptions, solve

EX_POPTS = PrecondOptions(residual_update=True, nitref=1, force_itref=True,
                          itref_tol=1e-8)


def _run(fix, name, sopts, popts=EX_POPTS):
    out = solve(name, fix.b, fix.A, fix.B, fix.C, fix.G,
                opts=sopts, precond_opts=popts)
    x_ref = spla.spsolve(fix.K.tocsc(), fix.b)
    rel = np.linalg.norm(np.asarray(out.x) - x_ref) / np.linalg.norm(x_ref)
    return out, rel


# --- cvxqp1_m (symmetric 5500^2; baseline table rows 1-7) -------------------

@pytest.mark.parametrize("name,iters,relmax", [
    ("cpminres", 53, 5e-6),
    ("cpcg", 55, 5e-6),
    ("cpcglanczos", 54, 5e-6),
    ("cpsymmlq", 54, 5e-6),
])
def test_cvxqp1_lanczos_family(cvxqp1, name, iters, relmax):
    out, rel = _run(cvxqp1, name,
                    SolverOptions(atol=1e-6, rtol=1e-6, itmax=500))
    assert out.solved, out.result.status
    assert abs(out.niters - iters) <= 2, (name, out.niters, iters)
    assert rel < relmax, (name, rel)


@pytest.mark.parametrize("mem,iters", [(2, 54), (50, 54)])
def test_cvxqp1_dqgmres(cvxqp1, mem, iters):
    out, rel = _run(cvxqp1, "cpdqgmres",
                    SolverOptions(atol=1e-6, rtol=1e-6, itmax=500, mem=mem))
    assert out.solved
    assert abs(out.niters - iters) <= 2, (mem, out.niters)
    assert rel < 5e-6


# --- cvxqp2_s (nonsymmetric 725^2; baseline rows 8-10) ----------------------

def test_cvxqp2_gmres100(cvxqp2):
    out, rel = _run(cvxqp2, "cpgmres",
                    SolverOptions(atol=1e-6, rtol=1e-6, itmax=500,
                                  restart=100))
    assert out.solved
    assert abs(out.niters - 127) <= 3, out.niters
    assert rel < 5e-4, rel
    assert abs(out.resid_history[0] - 1.19e2) / 1.19e2 < 0.05


def test_cvxqp2_gmres20_restart_sweep(cvxqp2):
    out, rel = _run(cvxqp2, "cpgmres",
                    SolverOptions(atol=1e-6, rtol=1e-6, itmax=500,
                                  restart=20))
    assert out.solved
    assert abs(out.niters - 380) <= 15, out.niters
    assert rel < 5e-4


def test_cvxqp2_dqgmres100(cvxqp2):
    out, rel = _run(cvxqp2, "cpdqgmres",
                    SolverOptions(atol=1e-6, rtol=1e-6, itmax=500, mem=100))
    assert out.solved
    assert abs(out.niters - 120) <= 3, out.niters
    assert rel < 5e-4
