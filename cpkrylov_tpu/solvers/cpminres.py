"""Constraint-preconditioned MINRES.

Functional re-implementation of /root/reference/kernels/cpminres.m as a
``lax.while_loop``: the coupled (v, q) Lanczos recurrence, the classic MINRES
Givens QR recurrences, and the two-back direction windows, with the residual
norm available for free as ``taubar`` (cpminres.m:234-236).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import SolverOptions
from ..precond.cp import CPPrecond, CPState
from .common import (KrylovResult, STATUS_INDEFINITE, STATUS_ITMAX,
                     STATUS_SOLVED, STATUS_STAGNATED, apply_manifold_veto,
                     breakdown_resid_recheck, coupled_dot, eps100,
                     history_init, lanczos_step, resolve_itmax,
                     resolve_operators, safe_normalize_pair, stag_init,
                     stag_stop, stag_update, vdot)


class _Carry(NamedTuple):
    k: jax.Array
    x: jax.Array
    y: jax.Array
    vk: jax.Array
    qk: jax.Array
    vkp1: jax.Array
    qkp1: jax.Array
    beta: jax.Array
    deltabar: jax.Array
    epsln: jax.Array
    taubar: jax.Array
    cs: jax.Array
    sn: jax.Array
    wv: jax.Array
    wq: jax.Array
    wv2: jax.Array
    wq2: jax.Array
    resid: jax.Array
    hist: jax.Array
    mstate: CPState
    indefinite: jax.Array
    stag_best: jax.Array
    stag_since: jax.Array


def cpminres(b, A, C, M: CPPrecond, opts: SolverOptions | None = None,
             mstate: CPState | None = None, B=None) -> KrylovResult:
    """Solve [A B'; B -C][x; y] = [b; 0] via CP-MINRES.

    Mirrors cpminres.m; A and C must be symmetric.  ``mstate`` threads the
    preconditioner's GHN caches in from the driver's RHS-shift application
    (reg_cpkrylov.m:156 happens before the kernel's first M call).
    """
    opts = opts or SolverOptions()
    A, C = resolve_operators(A, C)
    b = jnp.asarray(b)
    dtype = b.dtype
    n = A.shape[0]
    m = C.shape[0]
    itmax = resolve_itmax(opts, n)                     # cpminres.m:95
    e100 = eps100(dtype)
    mstate = mstate if mstate is not None else M.init_state(dtype)

    zeron = jnp.zeros(n, dtype)
    zerom = jnp.zeros(m, dtype)

    # Initial Lanczos pair and residual norm (cpminres.m:119-153).
    u0 = b
    t0 = zerom
    mstate, w1, w2, _ = M.apply_nm(mstate, u0, t0)
    vkp1 = w1
    qkp1 = -w2
    beta0 = vdot(u0, vkp1)                          # cpminres.m:134
    indefinite0 = beta0 < -e100 * (1 + jnp.abs(beta0))  # cpminres.m:136-139
    beta = jnp.sqrt(jnp.abs(beta0))
    vkp1, qkp1 = safe_normalize_pair(vkp1, qkp1, beta)

    resid0 = beta
    stop_tol = opts.atol + opts.rtol * resid0          # cpminres.m:164
    hist = history_init(itmax, resid0, dtype)
    stag_best0, stag_since0 = stag_init(resid0, dtype)

    carry = _Carry(
        k=jnp.zeros((), jnp.int32),
        x=zeron, y=zerom,
        vk=zeron, qk=zerom, vkp1=vkp1, qkp1=qkp1,
        beta=beta,
        deltabar=jnp.zeros((), dtype), epsln=jnp.zeros((), dtype),
        taubar=beta,
        cs=jnp.asarray(-1.0, dtype), sn=jnp.zeros((), dtype),
        wv=vkp1, wq=qkp1, wv2=zeron, wq2=zerom,
        resid=resid0, hist=hist, mstate=mstate,
        indefinite=indefinite0,
        stag_best=stag_best0, stag_since=stag_since0,
    )

    def cond(c: _Carry):
        return ((c.resid > stop_tol) & (c.k < itmax) & (~c.indefinite)
                & ~stag_stop(c.stag_since, opts.stagwin))

    def body(c: _Carry) -> _Carry:
        k = c.k + 1
        vkm1, qkm1 = c.vk, c.qk
        vk, qk = c.vkp1, c.qkp1

        # Coupled Lanczos step (cpminres.m:187-206) — the one shared
        # implementation of the parity-critical recurrence (common.py).
        (mstate, u, t, alpha, vkp1, qkp1, beta,
         indefinite) = lanczos_step(A, C, M, c.mstate, vk, qk, vkm1, qkm1,
                                    c.beta, e100)

        # Previous rotation (cpminres.m:208-215).
        oldeps = c.epsln
        delta = c.cs * c.deltabar + c.sn * alpha
        gammabar = c.sn * c.deltabar - c.cs * alpha
        epsln = c.sn * beta
        deltabar = -c.cs * beta

        # Current rotation and tau (cpminres.m:217-222).
        gamma = jnp.hypot(gammabar, beta)
        cs = gammabar / gamma
        sn = beta / gamma
        tau = cs * c.taubar
        taubar = sn * c.taubar

        # Direction windows and solution update (cpminres.m:224-232).
        wv1, wq1 = c.wv2, c.wq2
        wv2, wq2 = c.wv, c.wq
        wv = (vk - oldeps * wv1 - delta * wv2) / gamma
        wq = (qk - oldeps * wq1 - delta * wq2) / gamma
        x = c.x + tau * wv
        y = c.y - tau * wq

        resid = taubar                                 # cpminres.m:235
        hist = c.hist.at[k].set(resid)
        if opts.verbose:
            jax.debug.print("{k:5d}  {r:9.2e}", k=k, r=resid)

        stag_best, stag_since = stag_update(c.stag_best, c.stag_since, resid)
        advanced = _Carry(k=k, x=x, y=y, vk=vk, qk=qk, vkp1=vkp1,
                          qkp1=qkp1, beta=beta, deltabar=deltabar,
                          epsln=epsln, taubar=taubar, cs=cs, sn=sn, wv=wv,
                          wq=wq, wv2=wv2, wq2=wq2, resid=resid, hist=hist,
                          mstate=mstate, indefinite=indefinite,
                          stag_best=stag_best, stag_since=stag_since)
        # On indefiniteness the reference errors out mid-iteration
        # (cpminres.m:195-199), losing everything; here the last good
        # iterate is kept and the status reports the guard.
        kept = c._replace(indefinite=indefinite, mstate=mstate)
        return jax.tree_util.tree_map(
            lambda a, b: jnp.where(indefinite, a, b), kept, advanced)

    out = jax.lax.while_loop(cond, body, carry)

    solved = out.resid <= stop_tol
    istatus = jnp.where(
        out.indefinite, STATUS_INDEFINITE,
        jnp.where(solved, STATUS_SOLVED,
                  jnp.where(stag_stop(out.stag_since, opts.stagwin),
                            STATUS_STAGNATED, STATUS_ITMAX)),
    ).astype(jnp.int32)
    # Krylov exhaustion fires the indefiniteness guard one step short of
    # the tolerance while the iterate is already essentially exact; judge
    # `solved` on a freshly computed residual there (common.py).
    solved, _ = breakdown_resid_recheck(solved, istatus, out.resid,
                                        stop_tol, b, A, C, M, out.mstate,
                                        out.x, out.y)
    solved, istatus = apply_manifold_veto(solved, istatus, B, C, out.x,
                                          out.y, stop_tol)
    return KrylovResult(x=out.x, y=out.y, niters=out.k,
                        resid_history=out.hist, solved=solved,
                        istatus=istatus)
