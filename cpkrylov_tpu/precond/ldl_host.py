"""Host-side sparse factorization of the constraint preconditioner matrix.

The reference factorizes K_P = [G B'; B -C] once with MATLAB's built-in
sparse ``ldl`` (/root/reference/ops/opLDL2.m:82) and reuses the factors for
every preconditioner application.  Here the one-time factorization also runs
on the host — through the native C++ up-looking LDL^T kernel
(``native/ldl_kernel.cpp``) — and the factors are then shipped to the TPU as
level-scheduled triangular-solve operands (see ``trisolve.py``).

Backends:
  * ``"ldl"``  — native C++ LDL^T with 1x1 pivots + SQD sign regularization.
  * ``"lu"``   — scipy ``splu`` (robust fallback for matrices that are not
                 quasi-definite under the chosen ordering).
  * ``"auto"`` — try ``ldl``; fall back to ``lu`` on breakdown.
"""
from __future__ import annotations

import ctypes
import dataclasses

import numpy as np
import scipy.sparse as sp


@dataclasses.dataclass
class HostLDL:
    """K[perm][:, perm] = (I + L) D (I + L)^T with L strictly lower."""

    perm: np.ndarray        # (n,) row/col permutation
    L: sp.csc_matrix        # strictly lower triangular (no unit diagonal)
    d: np.ndarray           # (n,) diagonal of D
    nperturbed: int = 0


@dataclasses.dataclass
class HostLU:
    """K[row_perm][:, col_scatter] = L U from scipy splu.

    Solve K y = z via  v = U^{-1} L^{-1} z[row_perm];  y[col_scatter] = v.
    (scipy convention: K[argsort(perm_r)][:, argsort(perm_c)] = L U.)
    """

    row_perm: np.ndarray     # argsort(splu.perm_r)
    col_scatter: np.ndarray  # argsort(splu.perm_c)
    L: sp.csc_matrix         # unit lower triangular
    U: sp.csc_matrix         # upper triangular


def _ordering(K: sp.spmatrix, kind: str) -> np.ndarray:
    n = K.shape[0]
    if kind == "natural":
        return np.arange(n, dtype=np.int32)
    if kind == "rcm":
        from scipy.sparse.csgraph import reverse_cuthill_mckee

        pattern = sp.csr_matrix(
            (np.ones_like(K.tocsr().data), K.tocsr().indices, K.tocsr().indptr),
            shape=K.shape,
        )
        return np.asarray(reverse_cuthill_mckee(pattern, symmetric_mode=True),
                          dtype=np.int32)
    raise ValueError(f"unknown ordering {kind!r}")


def ldl_factor(K: sp.spmatrix, *, ordering: str = "rcm",
               pivot_signs: np.ndarray | None = None,
               reg_tol: float = 0.0, reg_value: float = 1e-8) -> HostLDL:
    """Native up-looking LDL^T of a symmetric (quasi-definite) matrix.

    ``pivot_signs`` gives the expected sign of each pivot in the *unpermuted*
    order (+1 for the G block rows, -1 for the -C block rows); pass None to
    fail hard on a zero pivot instead of regularizing.
    """
    from ..native import build as native_build

    lib = native_build.load()
    if lib is None:
        raise RuntimeError("native LDL kernel unavailable (g++ build failed)")

    K = sp.csc_matrix(K)
    n = K.shape[0]
    perm = _ordering(K, ordering)
    Kp = K[perm][:, perm]
    upper = sp.triu(Kp, format="csc")
    upper.sort_indices()

    Ap = np.asarray(upper.indptr, dtype=np.int32)
    Ai = np.asarray(upper.indices, dtype=np.int32)
    Ax = np.asarray(upper.data, dtype=np.float64)

    parent = np.empty(n, dtype=np.int32)
    colcount = np.empty(n, dtype=np.int32)

    i32p = ctypes.POINTER(ctypes.c_int32)
    f64p = ctypes.POINTER(ctypes.c_double)
    lib.cpk_ldl_symbolic.restype = ctypes.c_int64
    lib.cpk_ldl_numeric.restype = ctypes.c_int64

    lnz = lib.cpk_ldl_symbolic(
        ctypes.c_int32(n),
        Ap.ctypes.data_as(i32p), Ai.ctypes.data_as(i32p),
        parent.ctypes.data_as(i32p), colcount.ctypes.data_as(i32p),
    )
    Lp = np.zeros(n + 1, dtype=np.int32)
    np.cumsum(colcount, out=Lp[1:])
    Li = np.empty(max(int(lnz), 1), dtype=np.int32)
    Lx = np.empty(max(int(lnz), 1), dtype=np.float64)
    d = np.empty(n, dtype=np.float64)

    signs_arg = None
    if pivot_signs is not None:
        signs_perm = np.asarray(pivot_signs, dtype=np.float64)[perm]
        signs_arg = signs_perm.ctypes.data_as(f64p)

    status = lib.cpk_ldl_numeric(
        ctypes.c_int32(n),
        Ap.ctypes.data_as(i32p), Ai.ctypes.data_as(i32p),
        Ax.ctypes.data_as(f64p),
        Lp.ctypes.data_as(i32p), parent.ctypes.data_as(i32p),
        Li.ctypes.data_as(i32p), Lx.ctypes.data_as(f64p),
        d.ctypes.data_as(f64p),
        signs_arg, ctypes.c_double(reg_tol), ctypes.c_double(reg_value),
    )
    if status < 0:
        raise ZeroDivisionError(f"LDL breakdown at pivot {-int(status) - 1}")

    L = sp.csc_matrix((Lx[: int(lnz)], Li[: int(lnz)], Lp), shape=(n, n))
    return HostLDL(perm=perm, L=L, d=d, nperturbed=int(status))


def lu_factor(K: sp.spmatrix) -> HostLU:
    """scipy splu factorization exported as explicit triangular factors."""
    from scipy.sparse.linalg import splu

    f = splu(sp.csc_matrix(K))
    return HostLU(
        row_perm=np.argsort(f.perm_r).astype(np.int32),
        col_scatter=np.argsort(f.perm_c).astype(np.int32),
        L=f.L.tocsc(),
        U=f.U.tocsc(),
    )


def factorize(K: sp.spmatrix, *, method: str = "auto", ordering: str = "rcm",
              pivot_signs: np.ndarray | None = None,
              reg_tol: float = 0.0, reg_value: float = 1e-8):
    if method in ("ldl", "auto"):
        try:
            return ldl_factor(K, ordering=ordering, pivot_signs=pivot_signs,
                              reg_tol=reg_tol, reg_value=reg_value)
        except (ZeroDivisionError, RuntimeError):
            if method == "ldl":
                raise
    return lu_factor(K)
