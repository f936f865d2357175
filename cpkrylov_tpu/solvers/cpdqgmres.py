"""Constraint-preconditioned DQGMRES (memory-limited quasi-minimum residual).

Functional re-implementation of /root/reference/kernels/cpdqgmres.m (Saad &
Wu, NLAA 1996): circular stacks for the Krylov pairs (V, Q), the update
directions (PV, PQ) and the rotations, incomplete orthogonalization against
the last ``mem`` vectors only, and a per-iteration solution update with a
residual-norm *estimate* ``|g(k+1)|`` (cpdqgmres.m:264-268).

Storage note: the reference stores the Hessenberg by diagonals in a wasteful
(itmax, mem+2) array (cpdqgmres.m:133-137, flagged TODO there).  Every entry
H(j, 2+k-j) referenced at iteration k is also *written* at iteration k, so
here the whole band lives in one per-iteration local vector ``h[o]`` indexed
by the offset o = k - j — O(mem) memory instead of O(itmax * mem).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverOptions
from ..precond.cp import CPPrecond, CPState
from .common import (KrylovResult, STATUS_BREAKDOWN, STATUS_ITMAX,
                     STATUS_STAGNATED, stag_init, stag_stop, stag_update,
                     STATUS_SOLVED, apply_manifold_veto, resolve_itmax,
                     resolve_operators, sym_givens, vdot)


class _Carry(NamedTuple):
    k: jax.Array
    breakdown: jax.Array
    stagnant: jax.Array   # consecutive iterations with an unchanged estimate
    stag_best: jax.Array
    stag_since: jax.Array
    x: jax.Array
    y: jax.Array
    x_prev: jax.Array
    y_prev: jax.Array
    V: jax.Array    # (mem+1, n) circular
    Q: jax.Array    # (mem+1, m) circular
    PV: jax.Array   # (mem+1, n) circular update directions
    PQ: jax.Array   # (mem+1, m) circular
    c: jax.Array    # (mem,) circular rotation cosines
    s: jax.Array    # (mem,) circular rotation sines
    g: jax.Array    # (mem+1,) circular rhs
    resid: jax.Array
    hist: jax.Array
    mstate: CPState


def cpdqgmres(b, A, C, M: CPPrecond, opts: SolverOptions | None = None,
              mstate: CPState | None = None, B=None) -> KrylovResult:
    """Solve [A B'; B -C][x; y] = [b; 0] via CP-DQGMRES(mem)."""
    opts = opts or SolverOptions()
    A, C = resolve_operators(A, C)
    b = jnp.asarray(b)
    dtype = b.dtype
    n = A.shape[0]
    m = C.shape[0]
    itmax = resolve_itmax(opts, n + m)          # cpdqgmres.m:102
    mem = min(max(1, int(opts.mem)), itmax)     # cpdqgmres.m:117, 125
    mstate = mstate if mstate is not None else M.init_state(dtype)

    zerom = jnp.zeros(m, dtype)

    # Initial Krylov pair (cpdqgmres.m:153-164).
    mstate, w1, w2, _ = M.apply_nm(mstate, b, zerom)
    v1, q1 = w1, -w2
    resid0 = jnp.sqrt(jnp.maximum(vdot(b, v1), 0.0))  # cpdqgmres.m:157
    nz = resid0 != 0
    denom = jnp.where(nz, resid0, 1.0)
    v1 = jnp.where(nz, v1 / denom, v1)
    q1 = jnp.where(nz, q1 / denom, q1)

    stop_tol = opts.atol + opts.rtol * resid0   # cpdqgmres.m:169
    stag_best0, stag_since0 = stag_init(resid0, dtype)
    hist = jnp.full(itmax + 1, jnp.nan, dtype).at[0].set(resid0)

    carry = _Carry(
        k=jnp.zeros((), jnp.int32),
        breakdown=jnp.zeros((), jnp.bool_),
        stagnant=jnp.zeros((), jnp.int32),
        x=jnp.zeros(n, dtype), y=zerom,
        x_prev=jnp.zeros(n, dtype), y_prev=zerom,
        V=jnp.zeros((mem + 1, n), dtype).at[0].set(v1),
        Q=jnp.zeros((mem + 1, m), dtype).at[0].set(q1),
        PV=jnp.zeros((mem + 1, n), dtype),
        PQ=jnp.zeros((mem + 1, m), dtype),
        c=jnp.zeros(mem, dtype), s=jnp.zeros(mem, dtype),
        g=jnp.zeros(mem + 1, dtype).at[0].set(resid0),
        resid=resid0, hist=hist, mstate=mstate,
        stag_best=stag_best0, stag_since=stag_since0,
    )

    def body(cr: _Carry) -> _Carry:
        k = cr.k + 1                             # 1-based iteration index
        kpos = (k - 1) % (mem + 1)               # cpdqgmres.m:199-201
        kp1pos = k % (mem + 1)
        rotpos = (k - 1) % mem

        u = A.matvec(cr.V[kpos])
        t = C.matvec(cr.Q[kpos])
        mstate, w1, w2, _ = M.apply_nm(cr.mstate, u, -t)
        vnew = w1
        qnew = cr.Q[kpos] - w2

        # Incomplete MGS over j = max(1, k-mem+1)..k (cpdqgmres.m:210-216).
        # h[o] holds H(j, 2+k-j) for offset o = k - j; h[mem] stays 0 — the
        # never-orthogonalized leading-edge entry read by the rotations.
        h0 = jnp.zeros(mem + 1, dtype)

        def mgs(j, acc):
            h, vnew, qnew = acc
            jpos = (j - 1) % (mem + 1)
            hj = vdot(cr.V[jpos], u) + vdot(cr.Q[jpos], t)
            return (h.at[k - j].set(hj), vnew - hj * cr.V[jpos],
                    qnew - hj * cr.Q[jpos])

        jlo = jnp.maximum(1, k - mem + 1)
        h, vnew, qnew = jax.lax.fori_loop(jlo, k + 1, mgs, (h0, vnew, qnew))

        # Subdiagonal H(k+1,k); a nonpositive coupled inner product (where
        # the reference goes complex, cpdqgmres.m:218-225) flags a breakdown
        # — the iteration completes, then the loop exits (DQGMRES has no
        # restart to verify the estimate against, so the status reports it).
        dsub = vdot(u, vnew) + vdot(t, qnew)
        breakdown = dsub <= 0
        hsub = jnp.sqrt(jnp.maximum(dsub, 0.0))
        nz = hsub != 0
        denom = jnp.where(nz, hsub, 1.0)
        vnew = jnp.where(nz, vnew / denom, vnew)
        qnew = jnp.where(nz, qnew / denom, qnew)
        V = cr.V.at[kp1pos].set(vnew)
        Q = cr.Q.at[kp1pos].set(qnew)

        # Previous rotations over j = max(1, k-mem)..k-1 (cpdqgmres.m:228-235).
        def rot(j, h):
            jrot = (j - 1) % mem
            o = k - j
            hj = cr.c[jrot] * h[o] + cr.s[jrot] * h[o - 1]
            hj1 = cr.s[jrot] * h[o] - cr.c[jrot] * h[o - 1]
            return h.at[o].set(hj).at[o - 1].set(hj1)

        h = jax.lax.fori_loop(jnp.maximum(1, k - mem), k, rot, h)

        # Current rotation (cpdqgmres.m:243-250).
        ck, sk, dk = sym_givens(h[0], hsub)
        h = h.at[0].set(dk)
        c = cr.c.at[rotpos].set(ck)
        s = cr.s.at[rotpos].set(sk)
        gk = cr.g[kpos]
        g = cr.g.at[kp1pos].set(sk * gk).at[kpos].set(ck * gk)

        # Update directions and solution (cpdqgmres.m:252-265).
        pv = cr.V[kpos]
        pq = cr.Q[kpos]

        def pupd(j, acc):
            pv, pq = acc
            jpos = (j - 1) % (mem + 1)
            hj = h[k - j]
            return pv - hj * cr.PV[jpos], pq - hj * cr.PQ[jpos]

        pv, pq = jax.lax.fori_loop(jnp.maximum(1, k - mem), k, pupd, (pv, pq))
        # Zero rotated diagonal = post-breakdown direction: skip its update
        # (the reference's division here would emit Inf, cpdqgmres.m:262-263).
        alive = h[0] != 0
        hdiag = jnp.where(alive, h[0], 1.0)
        pv = pv / hdiag
        pq = pq / hdiag
        PV = cr.PV.at[kpos].set(pv)
        PQ = cr.PQ.at[kpos].set(pq)
        step = jnp.where(alive, g[kpos], 0.0)
        x = cr.x + step * pv
        y = cr.y - step * pq

        resid = jnp.abs(g[kp1pos])               # cpdqgmres.m:268
        # An exactly-unchanged estimate means |s|=1, c=0 — the degenerate
        # regime past the method's accuracy floor, where further iterations
        # only corrupt x (the reference has the same failure mode; verified
        # against a literal transcription).  Count and bail out.
        stagnant = jnp.where(resid == cr.resid, cr.stagnant + 1, 0)
        stag_best, stag_since = stag_update(cr.stag_best, cr.stag_since,
                                            resid)
        hist = cr.hist.at[k].set(resid)
        if opts.verbose:
            jax.debug.print("{k:5d}  {r:14.7e}", k=k, r=resid)
        return _Carry(k=k, breakdown=breakdown, stagnant=stagnant, x=x,
                      y=y, x_prev=cr.x, y_prev=cr.y, V=V, Q=Q, PV=PV,
                      PQ=PQ, c=c, s=s, g=g, resid=resid, hist=hist,
                      mstate=mstate,
                      stag_best=stag_best, stag_since=stag_since)

    out = jax.lax.while_loop(
        lambda cr: ((cr.resid > stop_tol) & (cr.k < itmax)
                    & (~cr.breakdown) & (cr.stagnant < 3)
                    & ~stag_stop(cr.stag_since, opts.stagwin)), body, carry)

    # On a breakdown/stagnation exit the lagged estimate is untrustworthy
    # (it can read exactly 0 while x is corrupted, since the reference's
    # estimate-only design has no cross-check, cpdqgmres.m:184-192).  Verify
    # the final and previous iterates against the TRUE preconditioned
    # residual and return the better one.
    bad_exit = (out.breakdown | (out.stagnant >= 3)
                | stag_stop(out.stag_since, opts.stagwin))

    def verify(x, y, mstate):
        u = b - A.matvec(x)
        t = C.matvec(y)
        mstate, w1, w2, _ = M.apply_nm(mstate, u, -t)
        d = vdot(u, w1) + vdot(t, y - w2)
        return jnp.sqrt(jnp.maximum(d, 0.0))

    rv_final = verify(out.x, out.y, out.mstate)
    rv_prev = verify(out.x_prev, out.y_prev, out.mstate)
    use_prev = bad_exit & (rv_prev < rv_final)
    x_out = jnp.where(use_prev, out.x_prev, out.x)
    y_out = jnp.where(use_prev, out.y_prev, out.y)
    resid_trusted = jnp.where(bad_exit, jnp.minimum(rv_final, rv_prev),
                              out.resid)

    solved = resid_trusted <= stop_tol
    istatus = jnp.where(
        bad_exit & ~solved,
        jnp.where(stag_stop(out.stag_since, opts.stagwin),
                  STATUS_STAGNATED, STATUS_BREAKDOWN),
        jnp.where(solved, STATUS_SOLVED, STATUS_ITMAX)).astype(jnp.int32)
    solved, istatus = apply_manifold_veto(solved, istatus, B, C, x_out,
                                          y_out, stop_tol)
    return KrylovResult(x=x_out, y=y_out, niters=out.k,
                        resid_history=out.hist, solved=solved,
                        istatus=istatus)
