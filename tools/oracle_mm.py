"""Scipy-oracle runs on the Maros-Meszaros-style sweep systems.

VERDICT r4 item 2: the catalogue-size sweep rows that fail (cvxqp2 at
size l in f64, cvxqp2_1000/cpgmres at size m) need an independent
measurement of whether the REFERENCE algorithms — transcribed in
tools/golden_oracle.py with an EXACT sparse-LU preconditioner and the
reference GHN/itref semantics — converge on those systems at all.  If
the oracle also stalls, the sweep failure is a property of the problem
(the generated IPM iterate), not a framework gap.

Writes benchmarks/MM_ORACLE.json: per (problem, kernel) the oracle's
iteration count, final relative residual, and the direct-solve rel-err
of the oracle's iterate.
"""
from __future__ import annotations

import json
import pathlib
import sys

import numpy as np
import scipy.sparse.linalg as spla

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

from tools.golden_oracle import ExactCP, cp_gmres_oracle, cp_minres_oracle  # noqa: E402


def run_problem(s, itmax=1000, tol=1e-6):
    rows = []
    xref = spla.spsolve(s.K.tocsc(), s.b)
    xrn = np.linalg.norm(xref)
    for kernel in ("cpminres", "cpgmres50"):
        M = ExactCP(s.G, s.B, s.C)
        b2 = s.b[s.n:]
        xy0 = M.apply(np.concatenate([np.zeros(s.n), b2]))
        b1 = s.b[: s.n] - s.A @ xy0[: s.n] - s.B.T @ xy0[s.n:]
        if kernel == "cpminres":
            x, y, hist = cp_minres_oracle(b1, s.A, s.C, M, atol=tol,
                                          rtol=tol, itmax=itmax)
        else:
            x, y, hist = cp_gmres_oracle(b1, s.A, s.C, M, atol=tol,
                                         rtol=tol, itmax=itmax, restart=50)
        xfull = np.concatenate([xy0[: s.n] + x, xy0[s.n:] + y])
        rel_err = float(np.linalg.norm(xfull - xref) / max(xrn, 1e-300))
        r = s.b - s.K @ xfull
        rel_res = float(np.linalg.norm(r) / np.linalg.norm(s.b))
        row = {
            "problem": s.name, "kernel": kernel, "N": s.n + s.m,
            "iters": int(len(hist) - 1),
            "hist_first": float(hist[0]), "hist_last": float(hist[-1]),
            "true_rel_resid": rel_res, "oracle_rel_err": rel_err,
            "solved_recurrence": bool(hist[-1] <= tol * hist[0] + tol),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)
    return rows


def main():
    from cpkrylov_tpu.utils.mm import mm_suite

    targets = []
    for size, fams in (("m", ("cvxqp1", "cvxqp2", "cvxqp3")),
                       ("l", ("cvxqp2",))):
        for s in mm_suite(size, mu=1e-4, families=fams):
            targets.append(s)

    rows = []
    out_path = (pathlib.Path(__file__).resolve().parent.parent
                / "benchmarks" / "MM_ORACLE.json")
    for s in targets:
        print(f"# {s.name} N={s.n + s.m}", flush=True)
        rows += run_problem(s)
        out_path.write_text(json.dumps(
            {"tol": 1e-6, "itmax": 1000, "mu": 1e-4,
             "preconditioner": "exact sparse LU (ExactCP, GHN+itref)",
             "rows": rows}, indent=1))
    print("wrote", out_path)


if __name__ == "__main__":
    main()
