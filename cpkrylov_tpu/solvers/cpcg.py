"""Constraint-preconditioned CG.

Functional re-implementation of /root/reference/kernels/cpcg.m
(Dollar-Gould-Schilders-Wathen, SIMAX 2006): coupled direction pair (p, q),
curvature ``p'Ap + q'Cq``, and the M-inner-product residual norm
``sqrt(g'r + t'w)`` with ``t = a + u`` (cpcg.m:146-176).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverOptions
from ..precond.cp import CPPrecond, CPState
from .common import (KrylovResult, STATUS_BREAKDOWN, STATUS_ITMAX,
                     STATUS_SOLVED, STATUS_STAGNATED, apply_manifold_veto,
                     history_init, resolve_itmax, resolve_operators,
                     stag_init, stag_stop, stag_update, vdot)


class _Carry(NamedTuple):
    itn: jax.Array
    breakdown: jax.Array
    x: jax.Array
    best_x: jax.Array
    best_a: jax.Array
    best_resid: jax.Array
    a: jax.Array        # accumulates y (cpcg.m:162, returned as y at l.193)
    g: jax.Array
    w: jax.Array
    r: jax.Array
    u: jax.Array
    p: jax.Array
    q: jax.Array
    resid2: jax.Array
    resid: jax.Array
    stag_best: jax.Array
    stag_since: jax.Array
    hist: jax.Array
    mstate: CPState


def cpcg(b, A, C, M: CPPrecond, opts: SolverOptions | None = None,
         mstate: CPState | None = None, B=None) -> KrylovResult:
    """Solve [A B'; B -C][x; y] = [b; 0] via CP-CG.

    Requires A, C symmetric and the system second-order sufficient
    (cpcg.m:19-32).
    """
    opts = opts or SolverOptions()
    A, C = resolve_operators(A, C)
    b = jnp.asarray(b)
    dtype = b.dtype
    n = A.shape[0]
    m = C.shape[0]
    itmax = resolve_itmax(opts, n)                  # cpcg.m:99
    mstate = mstate if mstate is not None else M.init_state(dtype)

    zeron = jnp.zeros(n, dtype)
    zerom = jnp.zeros(m, dtype)

    # Initialization (cpcg.m:117-133).
    g = -b
    w = zerom
    mstate, r, u, _ = M.apply_nm(mstate, g, w)
    p = -r
    q = -u
    resid2 = vdot(g, r)
    # sqrt clamped at 0: a (roundoff-)negative M-inner product would go
    # complex in MATLAB, whose comparisons then use the (zero) real part.
    resid = jnp.sqrt(jnp.maximum(resid2, 0.0))
    stop_tol = opts.atol + opts.rtol * resid
    hist = history_init(itmax, resid, dtype)
    stag_best0, stag_since0 = stag_init(resid, dtype)

    carry = _Carry(itn=jnp.zeros((), jnp.int32),
                   breakdown=jnp.zeros((), jnp.bool_), x=zeron, a=zerom,
                   best_x=zeron, best_a=zerom, best_resid=resid,
                   g=g, w=w, r=r, u=u, p=p, q=q, resid2=resid2, resid=resid,
                   hist=hist, mstate=mstate,
                   stag_best=stag_best0, stag_since=stag_since0)

    def cond(c: _Carry):
        return ((c.resid > stop_tol) & (c.itn < itmax) & (~c.breakdown)
                & ~stag_stop(c.stag_since, opts.stagwin))

    def body(c: _Carry) -> _Carry:
        itn = c.itn + 1

        # Curvatures and step (cpcg.m:151-154).
        Ap = A.matvec(c.p)
        pAp = vdot(c.p, Ap)
        Cq = C.matvec(c.q)
        qCq = vdot(c.q, Cq)
        curv = pAp + qCq
        alpha = c.resid2 / curv

        # Updates (cpcg.m:161-171).
        x = c.x + alpha * c.p
        a = c.a + alpha * c.q
        g = c.g + alpha * Ap
        w = c.w + alpha * Cq
        mstate, r, u, _ = M.apply_nm(c.mstate, g, w)
        t = a + u
        resid2_new = vdot(g, r) + vdot(t, w)
        beta = resid2_new / c.resid2
        p = -r + beta * c.p
        q = -t + beta * c.q

        resid = jnp.sqrt(jnp.maximum(resid2_new, 0.0))
        better = resid < c.best_resid
        best_x = jnp.where(better, x, c.best_x)
        best_a = jnp.where(better, a, c.best_a)
        best_resid = jnp.where(better, resid, c.best_resid)
        hist = c.hist.at[itn].set(resid)
        if opts.verbose:
            # The reference's CPCG table additionally reports the two
            # curvatures and the step length (cpcg.m:138-144, 156-159).
            jax.debug.print(
                "{k:5d}  {r:9.2e}  pAp={pap:9.2e}  qCq={qcq:9.2e}  "
                "step={al:9.2e}", k=itn, r=resid, pap=pAp, qcq=qCq, al=alpha)
        # A negative M-norm residual means the estimate lost meaning (the
        # reference would go complex): the just-made update is kept, the
        # loop exits, and the final verification decides `solved`.
        # Nonpositive curvature makes the step itself undefined (second-
        # order sufficiency broken; reference divides anyway): roll back.
        break_dir = resid2_new < 0
        break_curv = curv <= 0
        stag_best, stag_since = stag_update(c.stag_best, c.stag_since, resid)
        advanced = _Carry(itn=itn, breakdown=break_dir, x=x,
                          a=a, best_x=best_x, best_a=best_a,
                          best_resid=best_resid, g=g, w=w, r=r, u=u, p=p, q=q,
                          resid2=resid2_new, resid=resid, hist=hist,
                          mstate=mstate,
                          stag_best=stag_best, stag_since=stag_since)
        kept = c._replace(breakdown=break_curv, mstate=mstate)
        return jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(break_curv, a_, b_), kept, advanced)

    out = jax.lax.while_loop(cond, body, carry)

    # Return the minimum-estimate iterate (identical to the final one in
    # healthy runs; see cpcglanczos.py for rationale).  On a breakdown exit
    # the estimate is untrustworthy: verify the iterate against the true
    # preconditioned residual before claiming convergence.
    use_best = out.best_resid < out.resid
    x_out = jnp.where(use_best, out.best_x, out.x)
    a_out = jnp.where(use_best, out.best_a, out.a)
    resid_out = jnp.minimum(out.best_resid, out.resid)

    uv = b - A.matvec(x_out)
    tv = C.matvec(a_out)
    _, w1v, w2v, _ = M.apply_nm(out.mstate, uv, -tv)
    dver = vdot(uv, w1v) + vdot(tv, a_out - w2v)
    resid_ver = jnp.sqrt(jnp.maximum(dver, 0.0))
    resid_out = jnp.where(out.breakdown, resid_ver, resid_out)
    solved = resid_out <= stop_tol
    istatus = jnp.where(
        out.breakdown & ~solved, STATUS_BREAKDOWN,
        jnp.where(solved, STATUS_SOLVED,
                  jnp.where(stag_stop(out.stag_since, opts.stagwin),
                            STATUS_STAGNATED, STATUS_ITMAX))).astype(jnp.int32)
    solved, istatus = apply_manifold_veto(solved, istatus, B, C, x_out, a_out,
                                          stop_tol)
    return KrylovResult(x=x_out, y=a_out, niters=out.itn,
                        resid_history=out.hist, solved=solved,
                        istatus=istatus)
