"""Constraint-preconditioned SYMMLQ.

Functional re-implementation of /root/reference/kernels/cpsymmlq.m: tracks
the LQ, QR (MINRES) and CG residual-norm histories (cpsymmlq.m:86-90) with
the stopping test on the CG residual norm only ("one iter ahead",
cpsymmlq.m:38-41); the end-game moves to the CG point when it is better and
adds a final step along the first Lanczos vector (cpsymmlq.m:333-347).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import SolverOptions
from ..precond.cp import CPPrecond, CPState
from .common import (KrylovResult, STATUS_INDEFINITE, STATUS_ITMAX,
                     STATUS_SOLVED, STATUS_STAGNATED, apply_manifold_veto,
                     breakdown_resid_recheck, eps100, initial_lanczos_pair,
                     lanczos_step, resolve_itmax, resolve_operators,
                     stag_init, stag_stop, stag_update)


class _Carry(NamedTuple):
    k: jax.Array
    x: jax.Array
    y: jax.Array
    best_x: jax.Array
    best_y: jax.Array
    best_bstep: jax.Array
    best_resid: jax.Array
    vk: jax.Array
    qk: jax.Array
    vkp1: jax.Array
    qkp1: jax.Array
    beta: jax.Array
    gammabar: jax.Array
    deltabar: jax.Array
    epsdelzeta: jax.Array
    epsilonzeta: jax.Array
    bstep: jax.Array
    snprod: jax.Array
    matnorm2: jax.Array
    wv: jax.Array
    wq: jax.Array
    cgresid: jax.Array
    lq_hist: jax.Array
    qr_hist: jax.Array
    cg_hist: jax.Array
    mstate: CPState
    indefinite: jax.Array
    stag_best: jax.Array
    stag_since: jax.Array


def cpsymmlq(b, A, C, M: CPPrecond, opts: SolverOptions | None = None,
             mstate: CPState | None = None, B=None) -> KrylovResult:
    """Solve [A B'; B -C][x; y] = [b; 0] via CP-SYMMLQ."""
    opts = opts or SolverOptions()
    A, C = resolve_operators(A, C)
    b = jnp.asarray(b)
    dtype = b.dtype
    n = A.shape[0]
    m = C.shape[0]
    itmax = resolve_itmax(opts, n)                # cpsymmlq.m:102
    e100 = eps100(dtype)
    feps = float(np.finfo(np.dtype(dtype)).eps)
    mstate = mstate if mstate is not None else M.init_state(dtype)

    zeron = jnp.zeros(n, dtype)
    zerom = jnp.zeros(m, dtype)
    zero = jnp.zeros((), dtype)

    # Initial Lanczos pair (cpsymmlq.m:137-154).
    mstate, v1, q1, beta1, indefinite0 = initial_lanczos_pair(
        b, m, M, mstate, e100)
    cgresid0 = beta1
    stop_tol = opts.atol + opts.rtol * cgresid0   # cpsymmlq.m:158
    stag_best0, stag_since0 = stag_init(cgresid0, dtype)
    done0 = cgresid0 <= stop_tol                  # cpsymmlq.m:189

    # History buffers: loop appends lq/qr at slot k, cg at slot k+1; slot 0
    # of cg is beta1, prepended at wrap-up (cpsymmlq.m:331).
    hsize = itmax + 2
    nan = jnp.full(hsize, jnp.nan, dtype)
    lq_hist, qr_hist, cg_hist = nan, nan, nan

    # Second Lanczos step (cpsymmlq.m:193-216; no beta*v_{k-1} term).
    mstate, _, _, alpha, v2, q2, beta, indef1 = lanczos_step(
        A, C, M, mstate, v1, q1, zeron, zerom, zero, e100)

    carry = _Carry(
        k=jnp.zeros((), jnp.int32), x=zeron, y=zerom,
        best_x=zeron, best_y=zerom, best_bstep=zero, best_resid=cgresid0,
        vk=v1, qk=q1, vkp1=v2, qkp1=q2, beta=beta,
        gammabar=alpha, deltabar=beta,             # cpsymmlq.m:219-220
        epsdelzeta=beta1, epsilonzeta=zero,
        bstep=zero, snprod=jnp.ones((), dtype),
        matnorm2=alpha * alpha + beta * beta,      # cpsymmlq.m:225
        wv=zeron, wq=zerom,
        cgresid=cgresid0,
        lq_hist=lq_hist, qr_hist=qr_hist, cg_hist=cg_hist,
        mstate=mstate, indefinite=indefinite0 | indef1,
        stag_best=stag_best0, stag_since=stag_since0,
    )

    def _norms(c: _Carry):
        """LQ/QR/CG residual norms from the carried scalars
        (cpsymmlq.m:231-241 and 317-325)."""
        matnorm = jnp.sqrt(c.matnorm2)
        epsmat = matnorm * feps
        den = jnp.where(c.gammabar == 0, epsmat, c.gammabar)
        lq = jnp.hypot(c.epsdelzeta, c.epsilonzeta)
        qr = c.snprod * beta1
        cg = qr * c.beta / jnp.abs(den)
        return lq, qr, cg, den

    def cond(c: _Carry):
        return ((c.cgresid > stop_tol) & (c.k < itmax) & (~c.indefinite)
                & (~done0) & ~stag_stop(c.stag_since, opts.stagwin))

    def body(c: _Carry) -> _Carry:
        # Norms at loop top, appended before the iteration advances
        # (cpsymmlq.m:231-244).
        lq, qr, cg, _ = _norms(c)
        lq_hist = c.lq_hist.at[c.k].set(lq)
        qr_hist = c.qr_hist.at[c.k].set(qr)
        cg_hist = c.cg_hist.at[c.k + 1].set(cg)
        if opts.verbose:
            jax.debug.print("{k:5d}  {cg:9.2e}  {lq:9.2e}  {qr:9.2e}",
                            k=c.k, cg=cg, lq=lq, qr=qr)
        k = c.k + 1

        # Next Lanczos step (cpsymmlq.m:258-285).
        vkm1, qkm1 = c.vk, c.qk
        vk, qk = c.vkp1, c.qkp1
        betaold = c.beta
        mstate, _, _, alpha, vkp1, qkp1, beta, indef = lanczos_step(
            A, C, M, c.mstate, vk, qk, vkm1, qkm1, betaold, e100)

        matnorm2 = (c.matnorm2 + alpha * alpha + beta * beta
                    + betaold * betaold)           # cpsymmlq.m:288

        # Plane rotation (cpsymmlq.m:291-297).
        gamma = jnp.hypot(c.gammabar, betaold)
        cs = c.gammabar / gamma
        sn = betaold / gamma
        delta = cs * c.deltabar + sn * alpha
        gammabar = sn * c.deltabar - cs * alpha
        epsilon = sn * beta
        deltabar = -cs * beta

        # LQ solution update (cpsymmlq.m:300-306).
        zeta = c.epsdelzeta / gamma
        zcs = zeta * cs
        zsn = zeta * sn
        x = c.x + zcs * c.wv + zsn * vk
        y = c.y - zcs * c.wq - zsn * qk
        wv = sn * c.wv - cs * vk
        wq = sn * c.wq - cs * qk

        # Track the minimum-estimate LQ iterate (with its bstep, which the
        # end-game needs); identical to the final one in healthy runs.
        better = cg < c.best_resid
        best_x = jnp.where(better, x, c.best_x)
        best_y = jnp.where(better, y, c.best_y)
        best_resid = jnp.where(better, cg, c.best_resid)

        # Accumulators (cpsymmlq.m:310-313).
        bstep = c.bstep + c.snprod * cs * zeta
        snprod = c.snprod * sn
        epsdelzeta = c.epsilonzeta - delta * zeta
        epsilonzeta = -epsilon * zeta

        # The while condition re-checks the CG norm computed at the *top* of
        # this body (MATLAB semantics: the advance still runs even when that
        # norm already meets the tolerance, cpsymmlq.m:229-241).
        best_bstep = jnp.where(better, bstep, c.best_bstep)
        stag_best, stag_since = stag_update(c.stag_best, c.stag_since, cg)
        advanced = c._replace(k=k, x=x, y=y, best_x=best_x, best_y=best_y,
                              best_bstep=best_bstep, best_resid=best_resid,
                              vk=vk, qk=qk, vkp1=vkp1,
                              qkp1=qkp1, beta=beta, gammabar=gammabar,
                              deltabar=deltabar, epsdelzeta=epsdelzeta,
                              epsilonzeta=epsilonzeta, bstep=bstep,
                              snprod=snprod, matnorm2=matnorm2, wv=wv, wq=wq,
                              cgresid=cg, lq_hist=lq_hist, qr_hist=qr_hist,
                              cg_hist=cg_hist, mstate=mstate,
                              indefinite=indef,
                              stag_best=stag_best, stag_since=stag_since)
        # Keep the last good iterate where the reference would throw
        # (cpsymmlq.m:274-278).
        kept = c._replace(indefinite=indef, mstate=mstate)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(indef, a, b), kept, advanced)

    out = jax.lax.while_loop(cond, body, carry)

    # Wrap-up (cpsymmlq.m:317-347), masked when the solver never iterated.
    lq_f, qr_f, _, den = _norms(out)
    lq_hist = out.lq_hist.at[out.k].set(jnp.where(done0, beta1, lq_f))
    qr_hist = out.qr_hist.at[out.k].set(jnp.where(done0, beta1, qr_f))
    cg_hist = out.cg_hist.at[0].set(beta1)

    # Fall back to the best-estimate LQ iterate when the final one is worse
    # (degenerate regime only); the move-to-CG step belongs to the final
    # state and is skipped in that case.
    use_best = out.best_resid < out.cgresid
    cgresid_out = jnp.minimum(out.best_resid, out.cgresid)

    # Move to the CG point if better (cpsymmlq.m:334-339).
    move = (~done0) & (~use_best) & (out.cgresid < lq_f)
    zetabar = out.epsdelzeta / den
    base_x = jnp.where(use_best, out.best_x, out.x)
    base_y = jnp.where(use_best, out.best_y, out.y)
    base_bstep = jnp.where(use_best, out.best_bstep, out.bstep)
    bstep = jnp.where(move, base_bstep + out.snprod * zetabar, base_bstep)
    x = jnp.where(move, base_x + zetabar * out.wv, base_x)
    y = jnp.where(move, base_y - zetabar * out.wq, base_y)

    # Step along the first Lanczos vector (cpsymmlq.m:341-347).
    mstate, w1, w2, _ = M.apply_nm(out.mstate, b, jnp.zeros(m, dtype))
    vk1 = w1
    qk1 = -w2
    bstep = bstep / beta1
    x_end = x + bstep * vk1
    y_end = y - bstep * qk1

    x_final = jnp.where(done0, jnp.zeros_like(x_end), x_end)
    y_final = jnp.where(done0, jnp.zeros_like(y_end), y_end)

    solved = cgresid_out <= stop_tol
    istatus = jnp.where(
        out.indefinite, STATUS_INDEFINITE,
        jnp.where(solved, STATUS_SOLVED,
                  jnp.where(stag_stop(out.stag_since, opts.stagwin),
                            STATUS_STAGNATED, STATUS_ITMAX)),
    ).astype(jnp.int32)
    # Krylov exhaustion fires the indefiniteness guard with an excellent
    # iterate in hand; re-judge `solved` on a fresh residual (common.py).
    solved, _ = breakdown_resid_recheck(solved, istatus, cgresid_out,
                                        stop_tol, b, A, C, M, out.mstate,
                                        x_final, y_final)
    solved, istatus = apply_manifold_veto(solved, istatus, B, C, x_final,
                                          y_final, stop_tol)
    return KrylovResult(x=x_final, y=y_final, niters=out.k,
                        resid_history=cg_hist, solved=solved,
                        istatus=istatus, cg_resid_history=cg_hist,
                        lq_resid_history=lq_hist, qr_resid_history=qr_hist)
