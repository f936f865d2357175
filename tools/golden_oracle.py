"""Independent scipy oracle for residual-history golden baselines.

A from-scratch numpy/scipy transcription of the constraint-preconditioned
MINRES and restarted GMRES algorithms of di Serafino & Orban (SISC 43(2)
2021; the algorithms the MATLAB reference implements — see SURVEY.md §0),
with the preconditioner applied as an EXACT sparse LU solve of
K_P = [G B'; B -C] plus the reference's GHN residual-update and iterative-
refinement semantics (/root/reference/ops/opLDL2.m:161-188).

Role: generate the committed residual-history baselines
(``data/golden_histories.npz``) that tests/test_history_golden.py compares
the JAX kernels against — the north star's "same residuals within its
tolerance".  This code is deliberately a SEPARATE implementation (plain
numpy loops, scipy splu) so the comparison is meaningful.

Run:  python tools/golden_oracle.py          (rewrites the .npz)
"""
from __future__ import annotations

import pathlib
import sys

import numpy as np
import scipy.sparse as sp
import scipy.sparse.linalg as spla

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))


class ExactCP:
    """Exact constraint preconditioner with GHN cache + forced refinement."""

    def __init__(self, G, B, C, residual_update=True, nitref=1,
                 force_itref=True, itref_tol=1e-8):
        self.n = G.shape[0]
        self.m = C.shape[0]
        self.kp = sp.bmat([[G, B.T], [B, -C]], format="csc")
        self.lu = spla.splu(self.kp)
        self.residual_update = residual_update
        self.nitref = nitref
        self.force_itref = force_itref
        self.itref_tol = itref_tol
        self.aty = np.zeros(self.n)
        self.cy = np.zeros(self.m)

    def apply(self, z):
        zz = z.copy()
        if self.residual_update:
            zz[: self.n] -= self.aty
            zz[self.n:] -= self.cy
        y = self.lu.solve(zz)
        if self.residual_update:
            y2fill = np.concatenate([np.zeros(self.n), y[self.n:]])
            gv = self.kp @ y2fill
            self.aty = gv[: self.n]
            self.cy = gv[self.n:]
        if self.nitref > 0:
            r = z - self.kp @ y
            nit = 0
            while nit < self.nitref and (
                    np.linalg.norm(r) >= self.itref_tol * np.linalg.norm(z)
                    or self.force_itref):
                y = y + self.lu.solve(r)
                r = z - self.kp @ y
                nit += 1
        return y


def cp_minres_oracle(b1, A, C, M: ExactCP, atol=1e-6, rtol=1e-6, itmax=500):
    """Coupled-vector CP-MINRES; returns (x, y, residual history)."""
    n, m = M.n, M.m
    x = np.zeros(n)
    y = np.zeros(m)
    u, t = b1.copy(), np.zeros(m)
    w = M.apply(np.concatenate([u, t]))
    v, q = w[:n], -w[n:]
    beta = np.sqrt(max(float(u @ v), 0.0))
    if beta > 0:
        v, q = v / beta, q / beta
    hist = [beta]
    stop = atol + rtol * beta
    vk, qk = v, q
    vm, qm = np.zeros(n), np.zeros(m)
    betak = beta
    deltabar = epsln = 0.0
    taubar = beta
    cs, sn = -1.0, 0.0
    wv = vk.copy()
    wq = qk.copy()
    wv2, wq2 = np.zeros(n), np.zeros(m)
    k = 0
    resid = beta
    while resid > stop and k < itmax:
        k += 1
        u = A @ vk
        t = C @ qk
        alpha = float(u @ vk + t @ qk)
        w = M.apply(np.concatenate([u, -t]))
        w1, w2 = w[:n], w[n:]
        vnew = w1 - alpha * vk - betak * vm
        qnew = (qk - w2) - alpha * qk - betak * qm
        beta2 = float(u @ vnew + t @ qnew)
        beta_new = np.sqrt(abs(beta2))
        if beta_new > 0:
            vnew, qnew = vnew / beta_new, qnew / beta_new
        oldeps = epsln
        delta = cs * deltabar + sn * alpha
        gammabar = sn * deltabar - cs * alpha
        epsln = sn * beta_new
        deltabar = -cs * beta_new
        gamma = np.hypot(gammabar, beta_new)
        cs, sn = gammabar / gamma, beta_new / gamma
        tau = cs * taubar
        taubar = sn * taubar
        wv1, wq1 = wv2, wq2
        wv2, wq2 = wv, wq
        wv = (vk - oldeps * wv1 - delta * wv2) / gamma
        wq = (qk - oldeps * wq1 - delta * wq2) / gamma
        x = x + tau * wv
        y = y - tau * wq
        vm, qm, vk, qk, betak = vk, qk, vnew, qnew, beta_new
        resid = abs(taubar)
        hist.append(resid)
    return x, y, np.asarray(hist)


def cp_gmres_oracle(b1, A, C, M: ExactCP, atol=1e-6, rtol=1e-6, itmax=500,
                    restart=50):
    """Coupled-basis restarted CP-GMRES; returns (x, y, history)."""
    n, m = M.n, M.m
    x = np.zeros(n)
    y = np.zeros(m)
    hist = []
    stop = None
    finished = False
    outer = 0
    while not finished and outer < int(np.ceil(itmax / restart)):
        outer += 1
        u = b1 - A @ x if outer > 1 else b1.copy()
        t = C @ y
        w = M.apply(np.concatenate([u, -t]))
        V = np.zeros((restart + 1, n))
        Q = np.zeros((restart + 1, m))
        V[0] = w[:n]
        Q[0] = y - w[n:]
        rnorm = np.sqrt(max(float(u @ V[0] + t @ Q[0]), 0.0))
        if rnorm > 0:
            V[0] /= rnorm
            Q[0] /= rnorm
        if stop is None:
            stop = atol + rtol * rnorm
            hist.append(rnorm)
        H = np.zeros((restart + 1, restart))
        g = np.zeros(restart + 1)
        g[0] = rnorm
        rots = []
        k = 0
        resid = rnorm
        while resid > stop and k < restart:
            u = A @ V[k]
            t = C @ Q[k]
            w = M.apply(np.concatenate([u, -t]))
            vnew = w[:n]
            qnew = Q[k] - w[n:]
            for j in range(k + 1):
                hj = float(V[j] @ u + Q[j] @ t)
                H[j, k] = hj
                vnew -= hj * V[j]
                qnew -= hj * Q[j]
            hsub = float(u @ vnew + t @ qnew)
            hsub = np.sqrt(max(hsub, 0.0))
            H[k + 1, k] = hsub
            if hsub > 0:
                vnew /= hsub
                qnew /= hsub
            V[k + 1] = vnew
            Q[k + 1] = qnew
            for j, (c, s) in enumerate(rots):
                h1 = c * H[j, k] + s * H[j + 1, k]
                H[j + 1, k] = s * H[j, k] - c * H[j + 1, k]
                H[j, k] = h1
            a, bb = H[k, k], H[k + 1, k]
            dnom = np.hypot(a, bb)
            c, s = (a / dnom, bb / dnom) if dnom > 0 else (1.0, 0.0)
            rots.append((c, s))
            H[k, k] = c * a + s * bb
            H[k + 1, k] = 0.0
            g[k + 1] = s * g[k]
            g[k] = c * g[k]
            k += 1
            resid = abs(g[k])
            hist.append(resid)
        z = np.linalg.solve(H[:k, :k], g[:k]) if k else np.zeros(0)
        x = x + V[:k].T @ z
        y = y - Q[:k].T @ z
        finished = resid <= stop
    return x, y, np.asarray(hist)


def main():
    from cpkrylov_tpu.utils import fixtures

    out = {}

    f1 = fixtures.load_fixture("cvxqp1_m")
    M = ExactCP(f1.G, f1.B, f1.C)
    b2 = f1.b[f1.n:]
    xy0 = M.apply(np.concatenate([np.zeros(f1.n), b2]))
    b1 = f1.b[: f1.n] - f1.A @ xy0[: f1.n] - f1.B.T @ xy0[f1.n:]
    _, _, hist = cp_minres_oracle(b1, f1.A, f1.C, M)
    out["cvxqp1_cpminres"] = hist
    print(f"cvxqp1 cpminres: {len(hist) - 1} iters, "
          f"{hist[0]:.3e} -> {hist[-1]:.3e}")

    f2 = fixtures.load_fixture("cvxqp2_s")
    for restart in (100, 20):
        M = ExactCP(f2.G, f2.B, f2.C)
        b2 = f2.b[f2.n:]
        xy0 = M.apply(np.concatenate([np.zeros(f2.n), b2]))
        b1 = f2.b[: f2.n] - f2.A @ xy0[: f2.n] - f2.B.T @ xy0[f2.n:]
        _, _, hist = cp_gmres_oracle(b1, f2.A, f2.C, M, restart=restart)
        out[f"cvxqp2_cpgmres{restart}"] = hist
        print(f"cvxqp2 cpgmres({restart}): {len(hist) - 1} recorded, "
              f"{hist[0]:.3e} -> {hist[-1]:.3e}")

    path = (pathlib.Path(__file__).resolve().parent.parent / "data"
            / "golden_histories.npz")
    np.savez_compressed(path, **out)
    print("wrote", path)


if __name__ == "__main__":
    main()
