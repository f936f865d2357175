"""Constraint-preconditioned Lanczos-form CG.

Functional re-implementation of /root/reference/kernels/cpcglanczos.m: the
coupled three-term Lanczos recurrence with an LDL-style solution update
(``dg``, ``low``, ``eta``, ``wv``, ``wq``, cpcglanczos.m:236-268), plus the
optional backward-error stopping criterion with on-the-fly estimates of
``|x|`` (Givens/LSQR-style recurrence, l.270-291) and ``|op|`` (Frobenius
accumulation of alpha/beta).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverOptions
from ..precond.cp import CPPrecond, CPState
from .common import (KrylovResult, STATUS_BACKWARD, STATUS_INDEFINITE,
                     STATUS_ITMAX, STATUS_SOLVED, STATUS_STAGNATED,
                     apply_manifold_veto, breakdown_resid_recheck, eps100,
                     history_init, initial_lanczos_pair, lanczos_step,
                     resolve_itmax, resolve_operators, stag_init, stag_stop,
                     stag_update, vdot)


class _Carry(NamedTuple):
    k: jax.Array
    x: jax.Array
    y: jax.Array
    best_x: jax.Array
    best_y: jax.Array
    best_resid: jax.Array
    vk: jax.Array
    qk: jax.Array
    vkp1: jax.Array
    qkp1: jax.Array
    beta: jax.Array
    oldbeta: jax.Array
    dg: jax.Array
    low: jax.Array
    eta: jax.Array
    wv: jax.Array
    wq: jax.Array
    opnorm2: jax.Array
    rhobar: jax.Array
    xxnorm2: jax.Array
    xnorm: jax.Array
    tau: jax.Array
    delta: jax.Array
    resid: jax.Array
    bstop_tol: jax.Array
    hist: jax.Array
    mstate: CPState
    indefinite: jax.Array
    stag_best: jax.Array
    stag_since: jax.Array


def cpcglanczos(b, A, C, M: CPPrecond, opts: SolverOptions | None = None,
                mstate: CPState | None = None, B=None) -> KrylovResult:
    """Solve [A B'; B -C][x; y] = [b; 0] via CP-CG-Lanczos."""
    opts = opts or SolverOptions()
    A, C = resolve_operators(A, C)
    b = jnp.asarray(b)
    dtype = b.dtype
    n = A.shape[0]
    m = C.shape[0]
    itmax = resolve_itmax(opts, n)                 # cpcglanczos.m:113
    e100 = eps100(dtype)
    btol = opts.btol
    mstate = mstate if mstate is not None else M.init_state(dtype)

    zeron = jnp.zeros(n, dtype)
    zerom = jnp.zeros(m, dtype)
    zero = jnp.zeros((), dtype)

    # Initial Lanczos pair (cpcglanczos.m:153-176).
    mstate, vkp1, qkp1, beta, indefinite0 = initial_lanczos_pair(
        b, m, M, mstate, e100)
    beta1 = beta
    resid0 = beta1
    stop_tol = opts.atol + opts.rtol * resid0      # cpcglanczos.m:195
    bstop_tol = btol * beta1                       # cpcglanczos.m:198
    hist = history_init(itmax, resid0, dtype)
    stag_best0, stag_since0 = stag_init(resid0, dtype)

    carry = _Carry(
        k=jnp.zeros((), jnp.int32), x=zeron, y=zerom,
        best_x=zeron, best_y=zerom, best_resid=resid0,
        vk=zeron, qk=zerom, vkp1=vkp1, qkp1=qkp1,
        beta=beta, oldbeta=zero,
        dg=zero, low=jnp.ones((), dtype), eta=beta,
        wv=vkp1, wq=qkp1,
        opnorm2=zero, rhobar=jnp.ones((), dtype), xxnorm2=zero, xnorm=zero,
        tau=zero, delta=zero,
        resid=resid0, bstop_tol=jnp.asarray(bstop_tol, dtype), hist=hist,
        mstate=mstate, indefinite=indefinite0,
        stag_best=stag_best0, stag_since=stag_since0,
    )

    def cond(c: _Carry):
        return ((c.resid > stop_tol) & (c.resid > c.bstop_tol)
                & (c.k < itmax) & (~c.indefinite)
                & ~stag_stop(c.stag_since, opts.stagwin))

    def body(c: _Carry) -> _Carry:
        k = c.k + 1
        vkm1, qkm1 = c.vk, c.qk
        vk, qk = c.vkp1, c.qkp1

        # u/t/alpha then the x,y update (cpcglanczos.m:232-239).
        u = A.matvec(vk)
        t = C.matvec(qk)
        alpha = vdot(u, vk) + vdot(t, qk)
        dg = alpha - c.low * c.low * c.dg           # d_k
        zeta = c.eta / dg
        x = c.x + zeta * c.wv
        y = c.y - zeta * c.wq

        # Next Lanczos vectors (cpcglanczos.m:242-262).
        mstate, w1, w2, _ = M.apply_nm(c.mstate, u, -t)
        vkp1 = w1 - alpha * vk - c.beta * vkm1
        qkp1 = (qk - w2) - alpha * qk - c.beta * qkm1
        beta2 = vdot(u, vkp1) + vdot(t, qkp1)
        # relative guard; see common.lanczos_step
        indefinite = beta2 < -e100 * (1 + jnp.abs(alpha))
        beta = jnp.sqrt(jnp.abs(beta2))
        pos = beta > 0
        denom = jnp.where(pos, beta, 1.0)
        vkp1 = jnp.where(pos, vkp1 / denom, vkp1)
        qkp1 = jnp.where(pos, qkp1 / denom, qkp1)

        # Next-update data (cpcglanczos.m:264-268).
        low = beta / dg
        eta = -low * c.eta
        wv = vkp1 - low * c.wv
        wq = qkp1 - low * c.wq

        # Backward-error machinery (cpcglanczos.m:270-291), static on btol.
        if btol > 0:
            rho = jnp.sqrt(c.rhobar * c.rhobar + low * low)
            cs = c.rhobar / rho
            sn = low / rho
            num = zeta - c.delta * c.tau
            taubar = num / c.rhobar
            tau = num / rho
            xnorm = jnp.sqrt(c.xxnorm2 + taubar * taubar)
            xxnorm2 = c.xxnorm2 + tau * tau
            delta = sn
            rhobar = -cs
            opnorm2 = (c.opnorm2 + alpha * alpha + beta * beta
                       + c.oldbeta * c.oldbeta)
            bkerr = jnp.sqrt(opnorm2) * xnorm + beta1
            bstop_tol = btol * bkerr
        else:
            rhobar, xxnorm2, xnorm, tau, delta = (c.rhobar, c.xxnorm2,
                                                  c.xnorm, c.tau, c.delta)
            opnorm2 = c.opnorm2
            bstop_tol = c.bstop_tol

        resid = beta * jnp.abs(zeta)               # cpcglanczos.m:293
        # Track the minimum-estimate iterate: in healthy runs the final
        # iterate IS the minimum (the loop stops at the first estimate under
        # stopTol), so this only matters past the accuracy floor, where the
        # recurrence can corrupt x over several iterations before the
        # indefiniteness guard fires.
        better = resid < c.best_resid
        best_x = jnp.where(better, x, c.best_x)
        best_y = jnp.where(better, y, c.best_y)
        best_resid = jnp.where(better, resid, c.best_resid)
        hist = c.hist.at[k].set(resid)
        if opts.verbose:
            jax.debug.print("{k:5d}  {r:9.2e}", k=k, r=resid)

        stag_best, stag_since = stag_update(c.stag_best, c.stag_since, resid)
        advanced = _Carry(k=k, x=x, y=y, best_x=best_x, best_y=best_y,
                          best_resid=best_resid, vk=vk, qk=qk, vkp1=vkp1,
                          qkp1=qkp1, beta=beta, oldbeta=beta, dg=dg,
                          low=low, eta=eta, wv=wv, wq=wq, opnorm2=opnorm2,
                          rhobar=rhobar, xxnorm2=xxnorm2, xnorm=xnorm,
                          tau=tau, delta=delta, resid=resid,
                          bstop_tol=bstop_tol, hist=hist, mstate=mstate,
                          indefinite=indefinite,
                          stag_best=stag_best, stag_since=stag_since)
        # Keep the last good iterate where the reference would throw
        # (cpcglanczos.m:248-254); the degenerate dg/zeta of this iteration
        # would otherwise corrupt x.
        kept = c._replace(indefinite=indefinite, mstate=mstate)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(indefinite, a, b), kept, advanced)

    out = jax.lax.while_loop(cond, body, carry)

    # Fall back to the best-estimate iterate when the final one is worse
    # (only reachable in the degenerate regime).
    use_best = out.best_resid < out.resid
    x_out = jnp.where(use_best, out.best_x, out.x)
    y_out = jnp.where(use_best, out.best_y, out.y)
    resid_out = jnp.minimum(out.best_resid, out.resid)

    # Status resolution (cpcglanczos.m:311-325).
    solved_resid = resid_out <= stop_tol
    solved_bkerr = (btol > 0) & (resid_out <= out.bstop_tol)
    solved = solved_resid | solved_bkerr
    istatus = jnp.where(
        out.indefinite, STATUS_INDEFINITE,
        jnp.where(solved_resid, STATUS_SOLVED,
                  jnp.where(solved_bkerr, STATUS_BACKWARD,
                            jnp.where(stag_stop(out.stag_since, opts.stagwin),
                                      STATUS_STAGNATED, STATUS_ITMAX))),
    ).astype(jnp.int32)
    # Krylov exhaustion fires the indefiniteness guard with an excellent
    # iterate in hand; re-judge `solved` on a fresh residual (common.py).
    solved, _ = breakdown_resid_recheck(solved, istatus, resid_out,
                                        stop_tol, b, A, C, M, out.mstate,
                                        x_out, y_out)
    solved, istatus = apply_manifold_veto(solved, istatus, B, C, x_out,
                                          y_out, stop_tol)
    return KrylovResult(x=x_out, y=y_out, niters=out.k,
                        resid_history=out.hist, solved=solved,
                        istatus=istatus)
