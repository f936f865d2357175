"""Distributed solves for the WHOLE kernel family under one ``shard_map``.

Two complementary distribution strategies live in ``parallel/``:

* ``cpminres.dist_cpminres`` — the flagship fully-sharded path: vectors are
  row-sharded, coupled dots are psum-fused, halo exchange optional.
* this module — a *generic* adapter that runs ANY of the six serial kernels
  (solvers/) unchanged inside ``shard_map``: the matrix blocks A, B, B', C
  are 1-D row-partitioned over the mesh axis (each device owns its ELL row
  block — the O(nnz) memory and FLOPs are what actually scale, SURVEY.md
  §5), while the Krylov *vectors* stay replicated.  Each matvec computes
  local rows and all-gathers the (ndev, rows_loc) result over ICI; dot
  products and the scalar recurrences run redundantly on replicated values,
  which keeps them bitwise-identical across devices with zero collectives.

The preconditioner direct solve is replicated (the factor is the sequential
bottleneck on any device; distributing the blocked substitution is a
next-round refinement).

Driver semantics (RHS shift / un-shift, reg_cpkrylov.m:152-173) are applied
inside the same region, so ``dist_solve`` is the distributed equivalent of
``cpkrylov_tpu.solve``.
"""
from __future__ import annotations

import time
from functools import partial

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
from ..precond.cp import CPPrecond, make_preconditioner
from .partition import PartitionedBlocks, partition_blocks

AXIS = "rows"


def precond_spec(M: CPPrecond):
    """PartitionSpec pytree for a CPPrecond operand: replicated, except a
    distributed factor (e.g. schur.SchurFactor) contributes its own specs."""
    import dataclasses

    if hasattr(M.factor, "partition_spec"):
        factor_spec = M.factor.partition_spec()
    else:
        factor_spec = jax.tree_util.tree_map(lambda _: P(), M.factor)
    return dataclasses.replace(
        M, factor=factor_spec,
        kp=jax.tree_util.tree_map(lambda _: P(), M.kp))


def _gathered_matvec(data, cols, out_size, axis=AXIS):
    """Local ELL rows (global column ids) -> all-gathered full result."""

    def mv(x_full):
        local = (data * jnp.take(x_full, cols, mode="clip")).sum(-1)
        return jax.lax.all_gather(local, axis, tiled=True)[:out_size]

    return mv


def _family_operators(blocks: PartitionedBlocks, a_data, a_cols, b_data,
                      b_cols, bt_data, bt_cols, c_data, c_cols):
    """Distributed (A, C, B) LinearOperators from this device's row blocks."""
    n, m = blocks.n, blocks.m
    amv = _gathered_matvec(a_data, a_cols, n)
    cmv = _gathered_matvec(c_data, c_cols, m)
    bmv = _gathered_matvec(b_data, b_cols, m)
    btmv = _gathered_matvec(bt_data, bt_cols, n)
    A_op = FunctionOperator(params=None, fn=lambda _, x: amv(x),
                            rfn=None, shape=(n, n))
    C_op = FunctionOperator(params=None, fn=lambda _, x: cmv(x),
                            rfn=None, shape=(m, m))
    B_op = FunctionOperator(params=None, fn=lambda _, x: bmv(x),
                            rfn=lambda _, y: btmv(y), shape=(m, n))
    return A_op, C_op, B_op


def dist_solve(mesh: Mesh, method: str, b, A, B, C, G, *,
               opts: SolverOptions | None = None,
               precond_opts: PrecondOptions | None = None,
               M: CPPrecond | None = None, panel: int = 256,
               dtype=None):
    """Distributed ``solve``: any kernel, row-sharded matrices over ``mesh``.

    Host-side entry: partitions the blocks, builds (or reuses) the
    preconditioner, and runs shift -> kernel -> un-shift inside one
    ``shard_map`` region.  Returns the same ``(res, x1, x2)`` triple as the
    serial driver core, with every array replicated across the mesh.
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

    if M is None:
        M = make_preconditioner(G, B, C, options=precond_opts, panel=panel,
                                dtype=dtype)
    blocks = partition_blocks(A, B, C, ndev, dtype=dtype)
    b_dev = jnp.asarray(b, dtype=dtype)
    shift = bool(np.any(b[n:]))                    # reg_cpkrylov.m:154

    def body(a_data, a_cols, b_data, b_cols, bt_data, bt_cols, c_data,
             c_cols, M_rep, b_full):
        A_op, C_op, B_op = _family_operators(
            blocks, a_data[0], a_cols[0], b_data[0], b_cols[0], bt_data[0],
            bt_cols[0], c_data[0], c_cols[0])

        mstate = M_rep.init_state(b_full.dtype)
        if shift:
            # xy0 = M*[0; b2]; b1' = b1 - A*xy0_1 - B'*xy0_2
            # (reg_cpkrylov.m:154-158)
            mstate, xy0, _ = M_rep.apply(
                mstate,
                jnp.concatenate([jnp.zeros(n, b_full.dtype), b_full[n:]]))
            b1 = b_full[:n] - A_op.matvec(xy0[:n]) - B_op.rmatvec(xy0[n:])
        else:
            xy0 = jnp.zeros(n + m, b_full.dtype)
            b1 = b_full[:n]

        res = kernel(b1, A_op, C_op, M_rep, opts, mstate, B=B_op)
        x1 = xy0[:n] + res.x if shift else res.x   # reg_cpkrylov.m:166-172
        x2 = xy0[n:] + res.y if shift else res.y
        return res, x1, x2

    operands = (blocks.a_data, blocks.a_cols, blocks.b_data, blocks.b_cols,
                blocks.bt_data, blocks.bt_cols, blocks.c_data, blocks.c_cols)
    spec_blocks = jax.tree_util.tree_map(lambda _: P(AXIS), operands)
    spec_M = precond_spec(M)

    mapped = shard_map(
        body, mesh=mesh,
        in_specs=(*spec_blocks, spec_M, P()),
        out_specs=(P(), P(), P()),   # pytree prefix: everything replicated
        check_vma=False,
    )
    return mapped(*operands, M, b_dev)
