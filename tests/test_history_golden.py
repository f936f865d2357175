"""Residual-HISTORY golden parity (VERDICT r1 item 7).

The committed baselines (``data/golden_histories.npz``) come from an
independent scipy oracle (tools/golden_oracle.py) that reproduces the
reference algorithms with an exact sparse-LU constraint preconditioner; its
iteration counts and endpoint residuals match BASELINE.md's measured
targets exactly (53 iters, 4.183e+02 -> 3.254e-04 for cvxqp1 CPMINRES;
127 / 380 for cvxqp2 CPGMRES(100)/(20)).

The JAX kernels must overlap those histories point by point: same length
within +-2 iterations, and every aligned residual within a factor-2
envelope (|log10 ratio| <= log10(2)) — curve-shape agreement, far tighter
than matching only counts and endpoints.
"""
import pathlib

import numpy as np
import pytest

from cpkrylov_tpu import PrecondOptions, SolverOptions, solve

DATA = pathlib.Path(__file__).resolve().parent.parent / "data"

POPTS = PrecondOptions(residual_update=True, nitref=1, force_itref=True)


def _assert_history_overlap(ours: np.ndarray, golden: np.ndarray,
                            iter_slack: int = 2, factor: float = 2.0):
    assert abs(len(ours) - len(golden)) <= iter_slack, \
        f"history length {len(ours)} vs golden {len(golden)}"
    k = min(len(ours), len(golden))
    a = np.asarray(ours[:k], dtype=np.float64)
    g = np.asarray(golden[:k], dtype=np.float64)
    ratio = a / g
    worst = float(np.max(np.abs(np.log10(ratio))))
    assert worst <= np.log10(factor), \
        f"max |log10(resid ratio)| = {worst:.3f} at " \
        f"iter {int(np.argmax(np.abs(np.log10(ratio))))}"


@pytest.fixture(scope="module")
def golden():
    return np.load(DATA / "golden_histories.npz")


def test_cvxqp1_cpminres_history(cvxqp1, golden):
    out = solve("cpminres", cvxqp1.b, cvxqp1.A, cvxqp1.B, cvxqp1.C,
                cvxqp1.G, opts=SolverOptions(itmax=500),
                precond_opts=POPTS)
    assert out.solved
    _assert_history_overlap(out.resid_history, golden["cvxqp1_cpminres"])


@pytest.mark.parametrize("restart", [100, 20])
def test_cvxqp2_cpgmres_history(cvxqp2, golden, restart):
    out = solve("cpgmres", cvxqp2.b, cvxqp2.A, cvxqp2.B, cvxqp2.C,
                cvxqp2.G,
                opts=SolverOptions(itmax=500, restart=restart),
                precond_opts=POPTS)
    assert out.solved
    _assert_history_overlap(out.resid_history,
                            golden[f"cvxqp2_cpgmres{restart}"])
