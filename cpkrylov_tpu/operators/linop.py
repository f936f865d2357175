"""Linear-operator protocol — the Spot-toolbox replacement.

The MATLAB reference represents ``A`` as either an explicit matrix or a Spot
linear operator (``opSpot``; see /root/reference/reg_cpkrylov.m:40-41 and
/root/reference/ops/opLDL2.m:1).  Solver kernels only ever evaluate ``A*v``.
Here the equivalent is a pytree-of-arrays plus a traceable ``matvec``; any of
the containers in ``ops/formats.py``, a dense ``jax.Array``, or a user
callable can serve as the operand.
"""
from __future__ import annotations

import dataclasses
import weakref
from functools import partial
from typing import Callable, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.dia import DIA, DIASpill
from ..ops.formats import CSR, ELL, Diagonal, csr_from_scipy
from ..ops.pgell import PGELL, SymPermuted
from ..ops import spmv


def _register(cls, data_fields, meta_fields):
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )


@partial(_register, data_fields=("mat", "mat_t"), meta_fields=())
@dataclasses.dataclass(frozen=True)
class MatrixOperator:
    """Wraps an explicit (sparse or dense) matrix as an operator.

    ``mat_t`` optionally stores the transpose in its own device layout for
    formats without a native rmatvec (e.g. a PGELL pack of B' alongside B).
    """

    mat: object  # CSR | ELL | Diagonal | PGELL | SymPermuted | jax.Array
    mat_t: object | None = None

    @property
    def shape(self) -> Tuple[int, int]:
        return tuple(self.mat.shape)

    def matvec(self, x: jax.Array) -> jax.Array:
        return spmv.matvec(self.mat, x)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        if self.mat_t is not None:
            return spmv.matvec(self.mat_t, y)
        if isinstance(self.mat, CSR):
            return spmv.csr_rmatvec(self.mat, y)
        if isinstance(self.mat, Diagonal):
            return spmv.diag_matvec(self.mat, y)
        if isinstance(self.mat, DIA):
            return spmv.dia_rmatvec(self.mat, y)
        if hasattr(self.mat, "nrows_pad"):   # PallasDIA
            return spmv.dia_rmatvec(self.mat.to_dia(), y)
        if isinstance(self.mat, DIASpill):
            return (spmv.dia_rmatvec(self.mat.dia, y)
                    + spmv.csr_rmatvec(self.mat.spill, y))
        if isinstance(self.mat, SymPermuted):
            # (P M P')' = P M' P' — reuse the permutation wrapper; dispatch
            # on the inner format generically (pack_sym_dia can also return
            # SymPermuted(inner=DIASpill) after an RCM spill fallback).
            inner = self.mat.inner
            yp = jnp.take(y, self.mat.perm)
            if hasattr(inner, "nrows_pad"):      # PallasDIA
                inner = inner.to_dia()
            if isinstance(inner, DIA):
                yp = spmv.dia_rmatvec(inner, yp)
            elif isinstance(inner, DIASpill):
                yp = (spmv.dia_rmatvec(inner.dia, yp)
                      + spmv.csr_rmatvec(inner.spill, yp))
            else:
                raise TypeError(
                    f"rmatvec unsupported for SymPermuted inner "
                    f"{type(inner).__name__}")
            return jnp.take(yp, self.mat.iperm)
        if isinstance(self.mat, jax.Array) or hasattr(self.mat, "ndim"):
            return jnp.asarray(self.mat).T @ y
        raise TypeError(f"rmatvec unsupported for {type(self.mat)}")

    def __call__(self, x):
        return self.matvec(x)


@partial(_register, data_fields=("params",), meta_fields=("fn", "rfn", "shape"))
@dataclasses.dataclass(frozen=True)
class FunctionOperator:
    """Operator defined by a traceable callable ``fn(params, x) -> y``.

    Covers the reference's "A may be a linear operator" contract
    (/root/reference/reg_cpkrylov.m:40-41) — e.g. an operator-only leading
    block with no explicit matrix.
    """

    params: object
    fn: Callable
    rfn: Callable | None
    shape: Tuple[int, int]

    def matvec(self, x: jax.Array) -> jax.Array:
        return self.fn(self.params, x)

    def rmatvec(self, y: jax.Array) -> jax.Array:
        if self.rfn is None:
            raise NotImplementedError("operator has no rmatvec")
        return self.rfn(self.params, y)

    def __call__(self, x):
        return self.matvec(x)


LinearOperator = (MatrixOperator, FunctionOperator)

# Device-operand cache: host matrix -> device layout.  Converting a scipy
# operand to device arrays on every solve() call re-uploads it each time
# (seconds over tunneled backends at production nnz); repeated solves on
# the same host object — outer refinement passes, benchmark reruns, the
# reference examples' solver sweeps — must reuse the same device arrays.
# Keyed by id() with a weakref finalizer so entries die with their host
# matrix; values stay pinned on device until then.
_DEV_CACHE: dict = {}
_CACHE_MISS = object()


def host_fingerprint(X) -> tuple:
    """Content fingerprint for device-cache keys.

    id()-keyed caching alone is unsound two ways: a freed object's id can
    be recycled by a different matrix, and IPM-style callers update
    ``X.data`` in place between solves.  The fingerprint combines ~64
    strided samples with full-array sum/abs-sum reductions (vectorized
    O(nnz), far cheaper than repacking) so an in-place update of ANY entry
    changes it — strided sampling alone deterministically misses updates
    that fall between the sample positions, e.g. a few regularization
    entries in an IPM loop (review r4/r5).  A same-content false hit is
    harmless — the cached device form is then exactly right."""
    import scipy.sparse as sp

    if sp.issparse(X):
        d = X.data
        nnz = int(X.nnz)
    else:
        d = np.asarray(X).reshape(-1)
        nnz = int(d.size)
    if d.size == 0:
        return (tuple(int(v) for v in X.shape), 0, 0)
    step = max(1, d.size // 64)
    sample = np.ascontiguousarray(d[::step][:64])
    try:
        df = d.astype(np.float64, copy=False)
        s, sa = float(df.sum()), float(np.abs(df).sum())
    except (TypeError, ValueError):
        # non-numeric operand (e.g. an operator wrapper) — let the caller's
        # build() raise its own, clearer error
        s = sa = None
    return (tuple(int(v) for v in X.shape), nnz, hash(sample.tobytes()),
            s, sa)


def cache_device_form(obj, key_extra, build, fingerprint=None):
    """Memoize ``build()`` per host object + key; see _DEV_CACHE above.

    ``fingerprint`` (from :func:`host_fingerprint`) is compared — not
    keyed — on each lookup: a changed fingerprint REPLACES the entry
    instead of accreting a new key, so long in-place-update loops (IPM
    callers) hold exactly one pinned device copy per (object, key) rather
    than one per historical content state (review r5)."""
    key = (id(obj),) + tuple(key_extra)
    hit = _DEV_CACHE.get(key, _CACHE_MISS)
    if hit is not _CACHE_MISS:
        stored_fp, val = hit
        if stored_fp == fingerprint:
            return val
    val = build()                 # may legitimately be None (format-gate
    #                               reject) — cached too, so the rejection
    #                               work runs only once
    if hit is _CACHE_MISS:
        try:
            weakref.finalize(obj, _DEV_CACHE.pop, key, None)
        except TypeError:
            return val            # not weakref-able: no caching
    _DEV_CACHE[key] = (fingerprint, val)
    return val

# Wrapping a user callable creates a fresh closure; since ``fn`` is a meta
# (static) field of FunctionOperator, a fresh closure per call would defeat
# the jit cache and retrace every solve.  Cache the wrapper per callable so
# repeated ``aslinearoperator(f)`` (and hence repeated ``solve()``) hit the
# same compiled executable.
_FUNC_OP_CACHE: "weakref.WeakKeyDictionary" = weakref.WeakKeyDictionary()


def _wrap_callable(obj, shape) -> FunctionOperator:
    shape = tuple(int(s) for s in shape)
    try:
        cached = _FUNC_OP_CACHE.get(obj)
    except TypeError:            # non-weakref-able callable: no caching
        cached = None
    if cached is not None and cached.shape == shape:
        return cached
    op = FunctionOperator(params=None, fn=lambda _, x: obj(x), rfn=None,
                          shape=shape)
    try:
        _FUNC_OP_CACHE[obj] = op
    except TypeError:
        pass
    return op


def aslinearoperator(obj, shape=None, dtype=None) -> object:
    """Coerce matrices / callables / operators to an operator."""
    if isinstance(obj, LinearOperator):
        return obj
    if isinstance(obj, (CSR, ELL, Diagonal, DIA, DIASpill, PGELL,
                        SymPermuted)) or hasattr(obj, "nrows_pad"):
        return MatrixOperator(obj)
    if callable(obj) and not hasattr(obj, "shape"):
        if shape is None:
            raise ValueError("shape required when wrapping a callable")
        return _wrap_callable(obj, shape)
    # scipy sparse
    try:
        import scipy.sparse as sp

        if sp.issparse(obj):
            # Cheap pre-reject before any COO materialization: a square
            # matrix with more stored entries than rows cannot be diagonal,
            # and the conversion below is O(nnz) host work (~84 MB for the
            # 7M-nnz bench A) that non-diagonal operands shouldn't pay.
            maybe_diag = (obj.shape[0] == obj.shape[1]
                          and obj.nnz <= obj.shape[0])

            def build_diag_or_none():
                coo = obj.tocoo()
                if coo.nnz and not bool((coo.row == coo.col).all()):
                    return None
                d = np.zeros(obj.shape[0], dtype=np.dtype(dtype or obj.dtype))
                # duplicate (i, i) entries must SUM (CSR semantics), not
                # last-write-wins
                np.add.at(d, coo.row, coo.data)
                return MatrixOperator(Diagonal(diag=jnp.asarray(d)))

            fp = host_fingerprint(obj)
            if maybe_diag:
                # Strictly diagonal operand (e.g. C = delta*I): a single
                # elementwise multiply per matvec, numerically identical to
                # the CSR row sums but gather-free (~7 ns/element saved per
                # row per iteration on TPU).
                diag_op = cache_device_form(
                    obj, ("diag_op", np.dtype(dtype or obj.dtype).str),
                    build_diag_or_none, fingerprint=fp)
                if diag_op is not None:
                    return diag_op
            return cache_device_form(
                obj, ("csr_op", np.dtype(dtype or obj.dtype).str),
                lambda: MatrixOperator(csr_from_scipy(obj, dtype=dtype)),
                fingerprint=fp)
    except ImportError:  # pragma: no cover
        pass
    arr = jnp.asarray(obj, dtype=dtype)
    if arr.ndim != 2:
        raise ValueError(f"expected 2-D operand, got shape {arr.shape}")
    return MatrixOperator(arr)
