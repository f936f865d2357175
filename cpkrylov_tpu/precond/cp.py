"""The constraint preconditioner P = [G B'; B -C] as a pure device operator.

Functional re-design of the reference's ``opLDL2`` Spot operator
(/root/reference/ops/opLDL2.m).  Differences forced by JAX/XLA semantics:

* The factorization runs once on the host (native C++ LDL^T or scipy LU,
  see ``ldl_host.py``); the factors live on device as blocked triangular
  solve operands (``trisolve.py``).
* The Gould-Hribar-Nocedal residual-update caches (``op.Aty``/``op.Cy``,
  opLDL2.m:41-42, 90-91, 164-171) become an *explicit* ``CPState`` threaded
  through every application, so the operator is a pure function and can live
  inside ``lax.while_loop`` carries.
* Iterative refinement (opLDL2.m:173-187) is a ``lax.while_loop`` with the
  same trigger ``rNorm >= itref_tol * xNorm  or  force_itref``.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import PrecondOptions
from ..ops.formats import CSR, csr_from_scipy
from ..ops import spmv
from ..ops.spmv import csr_matvec
from .trisolve import (BlockTriFactor, ScanTriFactor, block_tri_solve,
                       build_block_tri, build_block_tri_upper,
                       build_scan_tri, tri_solve)
from . import ldl_host


def _register(cls, data_fields, meta_fields):
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )


@partial(_register,
         data_fields=("perm_in", "tf1", "dinv", "tf2", "perm_out"),
         meta_fields=())
@dataclasses.dataclass(frozen=True)
class FactorApply:
    """Device-side direct solve  y = K_P^{-1} z  from host factors.

    Pipeline: gather by ``perm_in`` -> blocked lower solve -> diagonal scale
    -> flip -> blocked lower solve of the reversed upper factor -> flip ->
    scatter by ``perm_out``.  (The flips implement the upper-triangular solve
    with the single lower-solve kernel; see trisolve.py.)
    """

    perm_in: jax.Array    # (N,) int32
    tf1: BlockTriFactor | ScanTriFactor
    dinv: jax.Array       # (N,) inverse pivots (ones for the LU backend)
    tf2: BlockTriFactor | ScanTriFactor
    perm_out: jax.Array   # (N,) int32

    def solve(self, z: jax.Array) -> jax.Array:
        w = jnp.take(z, self.perm_in)
        w = tri_solve(self.tf1, w)
        w = w * self.dinv.astype(w.dtype)
        w = jnp.flip(w)
        w = tri_solve(self.tf2, w)
        w = jnp.flip(w)
        return jnp.zeros_like(w).at[self.perm_out].set(w)


class CPState(NamedTuple):
    """GHN residual-update caches (aty = B'y2, cy = (-C)y2)."""

    aty: jax.Array  # (n,)
    cy: jax.Array   # (m,)


@partial(_register, data_fields=("factor", "kp"),
         meta_fields=("n", "m", "options", "factor_nitref"))
@dataclasses.dataclass(frozen=True)
class CPPrecond:
    """Constraint preconditioner: factors + K_P + behavioural options."""

    factor: FactorApply
    kp: object            # exact K_P, CSR or SymPermuted-PGELL (for GHN
    #                       caches and refinement residuals)
    n: int
    m: int
    options: PrecondOptions
    # Internal refinement steps fused into every direct solve.  The native
    # LDL backend factors without dynamic pivoting (SQD assumption), which
    # can lose digits to element growth under fill-reducing orderings; one
    # refinement step restores machine-precision solves, matching the
    # accuracy MATLAB gets from MA57's pivoted ldl (opLDL2.m:82) so the
    # user-visible nitref/GHN semantics behave identically.
    factor_nitref: int = 1

    def _direct_solve(self, z: jax.Array) -> jax.Array:
        y = self.factor.solve(z)
        for _ in range(self.factor_nitref):
            r = z - spmv.matvec(self.kp, y)
            y = y + self.factor.solve(r)
        return y

    # -- state -------------------------------------------------------------
    def init_state(self, dtype=None) -> CPState:
        dtype = dtype or self.kp.dtype
        return CPState(
            aty=jnp.zeros(self.n, dtype=dtype),
            cy=jnp.zeros(self.m, dtype=dtype),
        )

    # -- application -------------------------------------------------------
    def apply(self, state: CPState, z: jax.Array):
        """y = M * z with the reference's exact side-effect ordering.

        Mirrors opLDL2.multiply (opLDL2.m:161-188): (1) optional GHN input
        correction, (2) direct solve, (3) GHN cache refresh from the
        *unrefined* solution, (4) optional iterative refinement.
        Returns ``(new_state, y, rnorm)``.
        """
        opts = self.options
        n = self.n

        if opts.residual_update:
            zz = z - jnp.concatenate([state.aty, state.cy])
        else:
            zz = z
        y = self._direct_solve(zz)

        if opts.residual_update:
            y2 = y[n:]
            gv = spmv.matvec(self.kp, jnp.concatenate([jnp.zeros_like(y[:n]), y2]))
            state = CPState(aty=gv[:n], cy=gv[n:])

        rnorm = jnp.zeros((), dtype=z.dtype)
        if opts.nitref > 0:
            r = z - spmv.matvec(self.kp, y)
            rnorm = jnp.linalg.norm(r)
            xnorm = jnp.linalg.norm(z)

            def cond(carry):
                nit, _, _, rn = carry
                trigger = (rn >= opts.itref_tol * xnorm) | opts.force_itref
                return (nit < opts.nitref) & trigger

            def body(carry):
                nit, yk, _, _ = carry
                yk = yk + self._direct_solve(carry[2])
                rk = z - spmv.matvec(self.kp, yk)
                return nit + 1, yk, rk, jnp.linalg.norm(rk)

            _, y, _, rnorm = jax.lax.while_loop(cond, body, (0, y, r, rnorm))
        return state, y, rnorm

    def apply_nm(self, state: CPState, zn: jax.Array, zm: jax.Array):
        """Apply on an (n, m) pair; returns (state, yn, ym, rnorm)."""
        state, y, rnorm = self.apply(state, jnp.concatenate([zn, zm]))
        return state, y[: self.n], y[self.n:], rnorm

    # -- opLDL2 API parity --------------------------------------------------
    def mul_kp(self, z: jax.Array) -> jax.Array:
        """Multiply by K_P itself — the reference's ``divide`` mode, i.e.
        ``M \\ z`` undoing a preconditioner application (opLDL2.m:193-195)."""
        return spmv.matvec(self.kp, z)

    def to_dense_inverse(self) -> jax.Array:
        """Materialize K_P^{-1} column by column — the reference's
        ``double()`` (opLDL2.m:138-149).  For diagnostics on small systems;
        O(N) direct solves, vmapped on device."""
        N = self.n + self.m
        eye = jnp.eye(N, dtype=self.kp.dtype)
        return jax.vmap(self._direct_solve, in_axes=1, out_axes=1)(eye)

    def transpose(self) -> "CPPrecond":
        """K_P is symmetric, so the operator equals its transpose
        (opLDL2.m:120-136 define transpose/conj/ctranspose as self-maps)."""
        return self

    T = property(transpose)


# ---------------------------------------------------------------------------
# Host-side construction
# ---------------------------------------------------------------------------

def assemble_kp(G, B, C):
    """K_P = [G B'; B -C] as a scipy CSC matrix."""
    import scipy.sparse as sp

    G = sp.csr_matrix(G) if not sp.issparse(G) else G.tocsr()
    B = sp.csr_matrix(B) if not sp.issparse(B) else B.tocsr()
    C = sp.csr_matrix(C) if not sp.issparse(C) else C.tocsr()
    return sp.bmat([[G, B.T], [B, -C]], format="csc")


def _build_tri(T, panel: int, dtype):
    """Prefer the parallel-prefix (scan) factor when the subdiagonal reach
    permits it — log-depth batched MXU matmuls instead of an O(n/panel)
    sequential loop; fall back to blocked ELL substitution otherwise.
    A small scan panel minimizes the scan's O(panel^2) per-row volume.

    The scan form is only selected when the factor spans many panels: with
    a handful of blocks the sequential substitution is already cheap, and
    the scan's composed panel products carry slightly more roundoff than
    plain substitution — enough to lift a Krylov solver's attainable
    residual floor past a knife-edge stop tolerance on small systems."""
    import scipy.sparse as sp

    coo = sp.csr_matrix(T).tocoo()
    n = T.shape[0]
    reach = int((coo.row - coo.col).max()) if coo.nnz else 0
    for p in (128, 256):
        if reach <= p and p <= max(panel, 128) and n >= 16 * p:
            tf = build_scan_tri(T, panel=p, dtype=dtype)
            if tf is not None:
                return tf
    return build_block_tri(T, panel=panel, dtype=dtype)


def _build_tri_upper(U, panel: int, dtype):
    import scipy.sparse as sp

    U = sp.csr_matrix(U)
    n = U.shape[0]
    rev = np.arange(n - 1, -1, -1)
    return _build_tri(U[rev][:, rev].tocsr(), panel, dtype)


def build_factor_apply(fac, N: int, panel: int, dtype) -> FactorApply:
    """Pack a host factorization (HostLDL or HostLU) into a device
    ``FactorApply`` of blocked triangular solves."""
    import scipy.sparse as sp

    if isinstance(fac, ldl_host.HostLDL):
        L1 = (fac.L + sp.identity(N, format="csc")).tocsr()
        tf1 = _build_tri(L1, panel=panel, dtype=dtype)
        tf2 = _build_tri_upper((fac.L + sp.identity(N)).T.tocsr(),
                               panel=panel, dtype=dtype)
        return FactorApply(
            perm_in=jnp.asarray(fac.perm, dtype=jnp.int32),
            tf1=tf1,
            dinv=jnp.asarray((1.0 / fac.d).astype(dtype)),
            tf2=tf2,
            perm_out=jnp.asarray(fac.perm, dtype=jnp.int32),
        )
    # HostLU from splu
    tf1 = _build_tri(fac.L.tocsr(), panel, dtype)
    tf2 = _build_tri_upper(fac.U.tocsr(), panel, dtype)
    return FactorApply(
        perm_in=jnp.asarray(fac.row_perm, dtype=jnp.int32),
        tf1=tf1,
        dinv=jnp.ones(N, dtype=dtype),
        tf2=tf2,
        perm_out=jnp.asarray(fac.col_scatter, dtype=jnp.int32),
    )


def _select_spmv_format(spmv_format: str, dtype) -> bool:
    """True when K_P (and the driver's A) should be packed as PGELL."""
    import jax as _jax

    if spmv_format == "pgell":
        return True
    if spmv_format == "csr":
        return False
    if spmv_format != "auto":
        raise ValueError(f"unknown spmv_format {spmv_format!r}")
    # auto: the Pallas path runs in f32 on a TPU backend; f64 stays on the
    # XLA CSR path (reference-parity mode — TPUs have no native f64).
    return (_jax.default_backend() == "tpu"
            and np.dtype(dtype) == np.float32)


def make_preconditioner(G, B, C, *, options: PrecondOptions | None = None,
                        backend: str = "auto", ordering: str = "rcm",
                        panel: int = 256, reg_value: float = 1e-10,
                        factor_nitref: int | None = None,
                        spmv_format: str = "auto", tile_rows: int = 2048,
                        dtype=np.float64) -> CPPrecond:
    """Build the constraint preconditioner (host factorization + device pack).

    Equivalent of the driver's ``M = opLDL2(G, B, -C)``
    (/root/reference/reg_cpkrylov.m:131): assemble K_P once, factorize once,
    reuse for every application.  ``spmv_format`` controls the device layout
    of K_P for the GHN/refinement SpMVs (opLDL2.m:170-175, 174-186):
    "auto" packs an RCM-permuted PGELL for the Pallas kernel on TPU+f32 and
    falls back to CSR elsewhere; "csr"/"pgell" force a layout.
    """
    options = options or PrecondOptions()
    n = G.shape[0]
    m = C.shape[0]
    ksp = assemble_kp(G, B, C)

    signs = np.concatenate([np.ones(n), -np.ones(m)])
    fac = ldl_host.factorize(ksp, method=backend, ordering=ordering,
                             pivot_signs=signs, reg_value=reg_value)
    factor = build_factor_apply(fac, n + m, panel, dtype)

    if factor_nitref is None:
        # LDL without dynamic pivoting needs one refinement step to reach
        # MA57-class solve accuracy; splu pivots and does not.
        factor_nitref = 1 if isinstance(fac, ldl_host.HostLDL) else 0
    kp_dev = None
    if _select_spmv_format(spmv_format, dtype):
        from ..ops.pgell import pack_sym_pgell

        kp_dev = pack_sym_pgell(ksp, tile_rows=tile_rows, dtype=dtype)
    if kp_dev is None:
        kp_dev = csr_from_scipy(ksp.tocsr(), dtype=dtype)
    return CPPrecond(factor=factor, kp=kp_dev, n=int(n), m=int(m),
                     options=options, factor_nitref=int(factor_nitref))
