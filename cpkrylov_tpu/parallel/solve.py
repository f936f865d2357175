"""Distributed solves for the WHOLE kernel family under one ``shard_map``.

Two complementary distribution strategies live in ``parallel/``:

* ``cpminres.dist_cpminres`` — a hand-fused flagship path (kept for its
  fully inlined recurrences).
* this module — the *generic* driver that runs ANY of the six serial
  kernels (solvers/) with ROW-SHARDED vectors: the matrix blocks A, B, B',
  C are 1-D row-partitioned over the mesh axis, every Krylov vector (and
  the whole GMRES/DQGMRES basis) lives as an O(N/ndev) per-device shard,
  and every reduction inside the kernels goes through
  ``solvers.common.vdot`` — which the ``reduce_axis`` context turns into a
  psum-fused local dot (SURVEY.md §2.4).  Scalar recurrence state stays
  replicated, bitwise identical across devices.

SpMV operands move either by halo exchange (``halo.plan_halo_block``:
edge-only ppermutes overlapped with local compute — used automatically
when the partitioned blocks are banded enough) or by all-gather fallback.

The preconditioner direct solve runs replicated on gathered vectors (the
factor is the sequential bottleneck on any device; ``schur.SchurFactor``
distributes it — its PartitionSpecs flow through ``precond_spec``).

Driver semantics (RHS shift / un-shift, reg_cpkrylov.m:152-173) are applied
inside the same region, so ``dist_solve`` is the distributed equivalent of
``cpkrylov_tpu.solve``.
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

from ..config import PrecondOptions, SolverOptions
from ..operators.linop import FunctionOperator
from ..precond.cp import CPPrecond, CPState, make_preconditioner
from ..solvers.common import KrylovResult, reduce_axis
from .halo import HaloBlock, halo_extend, halo_matvec, plan_halo_block
from .partition import PartitionedBlocks, partition_blocks, shard_vector

AXIS = "rows"


def precond_spec(M: CPPrecond):
    """PartitionSpec pytree for a CPPrecond operand: replicated, except a
    distributed factor (e.g. schur.SchurFactor) contributes its own specs."""
    if hasattr(M.factor, "partition_spec"):
        factor_spec = M.factor.partition_spec()
    else:
        factor_spec = jax.tree_util.tree_map(lambda _: P(), M.factor)
    return dataclasses.replace(
        M, factor=factor_spec,
        kp=jax.tree_util.tree_map(lambda _: P(), M.kp))


class ShardedPrecond:
    """Shard-facing adapter over a replicated CPPrecond (inside shard_map).

    The kernels hand it (n_loc,)/(m_loc,) shards; it all-gathers to full
    vectors, applies the replicated preconditioner (the reference's
    ``M*[u; -t]``, opLDL2.m:161-188 — GHN caches and refinement intact),
    and hands back this device's slices.  The CPState carry stays full-size
    and replicated (the GHN caches are global vectors by definition).
    """

    def __init__(self, inner: CPPrecond, n_loc: int, m_loc: int):
        self.inner = inner
        self.n_loc = n_loc
        self.m_loc = m_loc

    def init_state(self, dtype=None) -> CPState:
        return self.inner.init_state(dtype)

    def _gather(self, v_loc, size):
        return jax.lax.all_gather(v_loc, AXIS, tiled=True)[:size]

    def _slice(self, vfull, loc, size):
        d = jax.lax.axis_index(AXIS)
        nd = jax.lax.axis_size(AXIS)
        vpad = jnp.pad(vfull, (0, nd * loc - size))
        return jax.lax.dynamic_slice(vpad, (d * loc,), (loc,))

    def _sharded_fast_path_ok(self) -> bool:
        """The Schur-native sharded apply covers exactly the lean direct
        solve; GHN residual updates / iterative refinement need global K_P
        SpMVs and stay on the gather path."""
        M = self.inner
        opts = M.options
        return (getattr(M.factor, "has_shard_plan", False)
                and getattr(M.factor, "shard_nloc", 0) == self.n_loc
                and getattr(M.factor, "shard_mloc", 0) == self.m_loc
                and M.factor_nitref == 0 and opts.nitref == 0
                and not opts.force_itref and not opts.residual_update)

    def apply_nm(self, state, zn_loc, zm_loc):
        n, m = self.inner.n, self.inner.m
        if self._sharded_fast_path_ok():
            # O(N/ndev + s) comms per apply: halo ppermutes + two s-sized
            # psums instead of the O(N) all-gather/psum pair (VERDICT r3
            # item 6).
            yn, ym = self.inner.factor.solve_sharded(zn_loc, zm_loc)
            return state, yn, ym, jnp.zeros((), zn_loc.dtype)
        zn = self._gather(zn_loc, n)
        zm = self._gather(zm_loc, m)
        state, y, rnorm = self.inner.apply(state, jnp.concatenate([zn, zm]))
        return (state, self._slice(y[:n], self.n_loc, n),
                self._slice(y[n:], self.m_loc, m), rnorm)

    def apply(self, state, z_loc_pair):
        """Full-vector apply on an (n_loc + m_loc,) shard pair layout."""
        zn_loc = z_loc_pair[: self.n_loc]
        zm_loc = z_loc_pair[self.n_loc:]
        state, yn, ym, _ = self.apply_nm(state, zn_loc, zm_loc)
        return state, jnp.concatenate([yn, ym])


def _local_matvec(data, cols, in_size):
    """Local ELL rows (global column ids) -> local row results, operand
    all-gathered."""

    def mv(x_loc):
        xf = jax.lax.all_gather(x_loc, AXIS, tiled=True)[:in_size]
        return (data * jnp.take(xf, cols, mode="clip")).sum(-1)

    return mv


def _halo_mv(data, cols, halo):
    def mv(x_loc):
        return halo_matvec(data, cols, halo_extend(x_loc, halo, AXIS))

    return mv


def _try_halo(mat, ndev, rows_loc, cols_loc, dtype) -> HaloBlock | None:
    try:
        return plan_halo_block(mat, ndev, rows_loc, cols_loc, dtype=dtype,
                               max_halo=max(1, cols_loc // 2))
    except ValueError:
        return None


@dataclasses.dataclass(frozen=True)
class DistPlan:
    """Host-side plan: partitioned blocks + optional halo blocks."""

    blocks: PartitionedBlocks
    halos: dict  # name -> HaloBlock | None, for "a", "b", "bt", "c"


def plan_dist(A, B, C, ndev: int, dtype=np.float64, halo: bool = True
              ) -> DistPlan:
    from ..operators.linop import cache_device_form

    def build():
        import scipy.sparse as sp

        blocks = partition_blocks(A, B, C, ndev, dtype=dtype)
        halos = {"a": None, "b": None, "bt": None, "c": None}
        if halo:
            Ac = sp.csr_matrix(A)
            Bc = sp.csr_matrix(B)
            Cc = sp.csr_matrix(C)
            halos["a"] = _try_halo(Ac, ndev, blocks.n_loc, blocks.n_loc,
                                   dtype)
            halos["b"] = _try_halo(Bc, ndev, blocks.m_loc, blocks.n_loc,
                                   dtype)
            halos["bt"] = _try_halo(Bc.T.tocsr(), ndev, blocks.n_loc,
                                    blocks.m_loc, dtype)
            halos["c"] = _try_halo(Cc, ndev, blocks.m_loc, blocks.m_loc,
                                   dtype)
        return DistPlan(blocks=blocks, halos=halos)

    # Memoized per host-A + content fingerprints of all three partitioned
    # blocks (advisor r4: an id()-only key partitions stale data after an
    # in-place update; same ndev/dtype/halo): repeated dist_solve calls
    # on one system must reuse both the packed blocks AND the plan object
    # identity — the compiled shard_map program is cached on it below.
    # A changed fingerprint replaces the plan; the old plan's finalizer
    # then evicts its compiled programs from _MAPPED_CACHE.
    from ..operators.linop import host_fingerprint

    return cache_device_form(
        A, ("dist_plan", ndev, np.dtype(dtype).str, bool(halo)), build,
        fingerprint=(host_fingerprint(A), host_fingerprint(B),
                     host_fingerprint(C)))


# Compiled shard_map programs, keyed by (plan identity, mesh, kernel,
# options, shift flag).  Without this every dist_solve call rebuilds the
# closure and XLA recompiles the whole region (~100 s at production sizes
# — round-3 bench_scaling was timing recompilation, not solves).
_MAPPED_CACHE: dict = {}


def dist_solve(mesh: Mesh, method: str, b, A, B, C, G, *,
               opts: SolverOptions | None = None,
               precond_opts: PrecondOptions | None = None,
               M: CPPrecond | None = None, panel: int = 256,
               halo: bool = True, dtype=None):
    """Distributed ``solve``: any kernel, row-sharded matrices AND vectors.

    Host-side entry: partitions the blocks, plans halo exchanges, builds
    (or reuses) the preconditioner, and runs shift -> kernel -> un-shift
    inside one ``shard_map`` region.  Returns the same ``(res, x1, x2)``
    triple as the serial driver core with global (gathered) arrays.
    """
    from ..driver import _solver_registry

    opts = opts or SolverOptions()
    if callable(method):
        method = method.__name__
    kernel = _solver_registry()[method]

    b = np.asarray(b).reshape(-1)
    dtype = np.dtype(dtype or b.dtype)
    dtype = jax.dtypes.canonicalize_dtype(dtype)
    n, m = A.shape[0], C.shape[0]
    ndev = int(np.prod(mesh.devices.shape))

    # Kernel itmax defaults use GLOBAL sizes (cpcg.m:99 itmax=n,
    # cpgmres.m:105 itmax=n+m); inside the region A.shape is local.
    if opts.itmax is None:
        default = n + m if method in ("cpgmres", "cpdqgmres") else n
        opts = dataclasses.replace(opts, itmax=int(default))

    if M is None:
        # Prefer the distributed Schur factor: per-device factor memory and
        # trisolve cost are O(N/ndev) instead of the replicated factor's
        # O(N)-on-every-device (VERDICT r2 weak #5).  Exactness means
        # iteration counts are unchanged.  Systems whose RCM profile stays
        # too wide for chunked partitioning fall back to the replicated
        # factor (build_dist_precond, shared with dist_solve_mixed).
        from .mixed import build_dist_precond

        M = build_dist_precond(G, B, C, ndev, precond_opts=precond_opts,
                               panel=panel, dtype=dtype)
    plan = plan_dist(A, B, C, ndev, dtype=dtype, halo=halo)
    blocks = plan.blocks
    n_loc, m_loc = blocks.n_loc, blocks.m_loc
    b1_sh = shard_vector(b[:n].astype(dtype), ndev, n_loc)
    b2_sh = shard_vector(b[n:].astype(dtype), ndev, m_loc)
    shift = bool(np.any(b[n:]))                    # reg_cpkrylov.m:154

    zeros = jnp.zeros((ndev, 1, 1), dtype)
    izeros = jnp.zeros((ndev, 1, 1), jnp.int32)

    def h_operand(name):
        hb = plan.halos[name]
        if hb is None:
            return zeros, izeros
        return hb.data, hb.cols

    ha = h_operand("a")
    hb_ = h_operand("b")
    hbt = h_operand("bt")
    hc = h_operand("c")

    def body(a_data, a_cols, b_data, b_cols, bt_data, bt_cols, c_data,
             c_cols, ha_d, ha_c, hb_d, hb_c, hbt_d, hbt_c, hc_d, hc_c,
             M_rep, b1_loc, b2_loc):
        def pick(name, gdata, gcols, hd, hc_, in_size):
            hblk = plan.halos[name]
            if hblk is not None:
                return _halo_mv(hd[0], hc_[0], hblk.halo)
            return _local_matvec(gdata[0], gcols[0], in_size)

        amv = pick("a", a_data, a_cols, ha_d, ha_c, n)
        bmv = pick("b", b_data, b_cols, hb_d, hb_c, n)
        btmv = pick("bt", bt_data, bt_cols, hbt_d, hbt_c, m)
        cmv = pick("c", c_data, c_cols, hc_d, hc_c, m)

        A_op = FunctionOperator(params=None, fn=lambda _, x: amv(x),
                                rfn=None, shape=(n_loc, n_loc))
        C_op = FunctionOperator(params=None, fn=lambda _, x: cmv(x),
                                rfn=None, shape=(m_loc, m_loc))
        B_op = FunctionOperator(params=None, fn=lambda _, x: bmv(x),
                                rfn=lambda _, y: btmv(y),
                                shape=(m_loc, n_loc))
        Msh = ShardedPrecond(M_rep, n_loc, m_loc)
        b1l = b1_loc[0]
        b2l = b2_loc[0]

        with reduce_axis(AXIS):
            mstate = Msh.init_state(b1l.dtype)
            if shift:
                # xy0 = M*[0; b2]; b1' = b1 - A*xy0_1 - B'*xy0_2
                # (reg_cpkrylov.m:154-158)
                mstate, xy0 = Msh.apply(
                    mstate, jnp.concatenate([jnp.zeros_like(b1l), b2l]))
                xy0n, xy0m = xy0[:n_loc], xy0[n_loc:]
                b1l = b1l - amv(xy0n) - btmv(xy0m)
            else:
                xy0n = jnp.zeros_like(b1l)
                xy0m = jnp.zeros_like(b2l)

            res = kernel(b1l, A_op, C_op, Msh, opts, mstate, B=B_op)
            x1 = xy0n + res.x                      # reg_cpkrylov.m:166-172
            x2 = xy0m + res.y
        return res, x1[None], x2[None]

    operands = (blocks.a_data, blocks.a_cols, blocks.b_data, blocks.b_cols,
                blocks.bt_data, blocks.bt_cols, blocks.c_data, blocks.c_cols,
                *ha, *hb_, *hbt, *hc)
    spec_blocks = jax.tree_util.tree_map(lambda _: P(AXIS), operands)
    spec_M = precond_spec(M)

    has_hists = method == "cpsymmlq"
    res_spec = KrylovResult(
        x=P(AXIS), y=P(AXIS), niters=P(), resid_history=P(),
        solved=P(), istatus=P(),
        cg_resid_history=P() if has_hists else None,
        lq_resid_history=P() if has_hists else None,
        qr_resid_history=P() if has_hists else None,
    )

    # Reuse the compiled program across calls with the same plan/mesh/
    # kernel/options/precond structure: `body` is a fresh closure per call,
    # so without an explicit cache jax.jit retraces (and XLA recompiles)
    # every solve.
    import weakref

    key = (id(plan), mesh, method, opts, shift,
           jax.tree_util.tree_structure((M, operands)))
    mapped = _MAPPED_CACHE.get(key)
    if mapped is None:
        mapped = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(*spec_blocks, spec_M, P(AXIS), P(AXIS)),
            out_specs=(res_spec, P(AXIS), P(AXIS)),
            check_vma=False,
        ))
        # Register the finalizer FIRST and only cache on success (matching
        # cache_device_form): an entry without an eviction hook could be
        # served stale to a later plan that reuses the same id().
        try:
            weakref.finalize(plan, _MAPPED_CACHE.pop, key, None)
        except TypeError:  # pragma: no cover
            pass
        else:
            _MAPPED_CACHE[key] = mapped
    res, x1, x2 = mapped(*operands, M, b1_sh, b2_sh)
    # Trim shard padding on the gathered outputs.
    res = dataclasses.replace(res, x=res.x[:n], y=res.y[:m])
    return res, x1.reshape(-1)[:n], x2.reshape(-1)[:m]
