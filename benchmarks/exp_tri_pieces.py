"""Which piece of the reduced-scan trisolve costs 3.5 ms: the einsums or
the associative scan?  Operands as jit arguments, slope-timed."""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")
from cpkrylov_tpu.utils.timing import sync  # noqa: E402


def slope(name, step, x0, op, K1=4, K2=44, reps=3):
    @jax.jit
    def loop(x, op, K):
        return jax.lax.fori_loop(0, K, lambda i, v: step(v, op), x)
    walls = {}
    for K in (K1, K2):
        sync(loop(x0, op, K))
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            sync(loop(x0, op, K))
            best = min(best, time.perf_counter() - t0)
        walls[K] = best
    per = (walls[K2] - walls[K1]) / (K2 - K1)
    print(f"{name:46s} {per*1e3:9.3f} ms/op", flush=True)
    return per


def main():
    rng = np.random.default_rng(0)
    n = 1_250_000
    p, r = 16, 8
    nb = n // p

    inv = jnp.asarray(rng.standard_normal((nb, p, p)), jnp.float32)
    b2 = jnp.asarray(rng.standard_normal((nb, p)), jnp.float32)
    slope("einsum bij,bj->bi (arg)",
          lambda v, op: jnp.einsum("bij,bj->bi", op, v), b2, inv)

    inv_t = jnp.asarray(rng.standard_normal((p, p, nb)), jnp.float32)
    b2_t = jnp.asarray(rng.standard_normal((p, nb)), jnp.float32)
    slope("einsum ijb,jb->ib (arg)",
          lambda v, op: jnp.einsum("ijb,jb->ib", op, v), b2_t, inv_t)

    w = jnp.asarray(rng.standard_normal((nb, p, r)) * 0.1, jnp.float32)
    slope("einsum bij,bj->bi w (nb,p,r) (arg)",
          lambda v, op: jnp.einsum("bij,bj->bi", op,
                                   jnp.pad(v, ((0, 0), (0, 0)))), b2,
          None if False else w, K1=4, K2=44) if False else None

    # scan alone, batch-major
    mr = jnp.asarray(rng.standard_normal((nb, r, r)) * 0.1, jnp.float32)
    cr = jnp.asarray(rng.standard_normal((nb, r)), jnp.float32)

    def combine(a, bb):
        ma, ca = a
        mb, cb = bb
        return mb @ ma, jnp.einsum("...ij,...j->...i", mb, ca) + cb

    slope("assoc_scan (nb,8,8) (arg)",
          lambda v, op: jax.lax.associative_scan(combine, (op, v))[1],
          cr, mr)

    # scan alone, lane-major
    mr_t = jnp.asarray(rng.standard_normal((r, r, nb)) * 0.1, jnp.float32)
    cr_t = jnp.asarray(rng.standard_normal((r, 1, nb)), jnp.float32)

    def combine_t(a, bb):
        ma, ca = a
        mb, cb = bb
        return (jnp.einsum("ikb,kjb->ijb", mb, ma),
                jnp.einsum("ikb,kjb->ijb", mb, ca) + cb)

    slope("assoc_scan (8,8,nb) lane (arg)",
          lambda v, op: jax.lax.associative_scan(combine_t, (op, v),
                                                 axis=2)[1],
          cr_t, mr_t)

    # cheaper alternative: sequential lax.scan over CHUNKS with in-chunk
    # prefix by doubling over a reshaped group axis
    # (sketch cost only: one pass over data + small carry chain)
    def chunked_scan(v, op, G=1024):
        mrr, crr = op, v          # (r,r,nb), (r,1,nb)
        # reshape nb -> (ng, G)
        ng = nb // G
        m4 = mrr.reshape(r, r, ng, G)
        c4 = crr.reshape(r, 1, ng, G)

        def comb(a, bb):
            ma, ca = a
            mb, cb = bb
            return (jnp.einsum("ikgb,kjgb->ijgb", mb, ma),
                    jnp.einsum("ikgb,kjgb->ijgb", mb, ca) + cb)

        # in-group prefix (log2 G levels over full data)
        pm, pc = jax.lax.associative_scan(comb, (m4, c4), axis=3)
        # group-boundary carries: sequential scan over ng tiny (r,r) mats
        lastm = pm[:, :, :, -1]          # (r,r,ng)
        lastc = pc[:, :, :, -1]          # (r,1,ng)

        def body(carry, inp):
            m_g, c_g = inp               # (r,r), (r,1)
            new = m_g @ carry + c_g
            return new, carry

        init = jnp.zeros((r, 1), v.dtype)
        _, prevs = jax.lax.scan(
            body, init, (jnp.moveaxis(lastm, 2, 0), jnp.moveaxis(lastc, 2, 0)))
        prevs = jnp.moveaxis(prevs, 0, 2)   # (r,1,ng) carry BEFORE group g
        out = pc + jnp.einsum("ikgb,kjg->ijgb", pm, prevs[:, :, :, 0] if False else prevs[:, 0, :, None].transpose(0, 2, 1) if False else prevs.squeeze(1)) if False else pc + jnp.einsum("ikgb,kjg->ijgb", pm, prevs)
        return out.reshape(r, 1, nb)
    # fix einsum: prevs (r,1,ng) -> want pm[i,k,g,b] * prevs[k,1,g]
    def chunked_scan2(v, op, G=1024):
        mrr, crr = op, v
        ng = nb // G
        m4 = mrr.reshape(r, r, ng, G)
        c4 = crr.reshape(r, 1, ng, G)

        def comb(a, bb):
            ma, ca = a
            mb, cb = bb
            return (jnp.einsum("ikgb,kjgb->ijgb", mb, ma),
                    jnp.einsum("ikgb,kjgb->ijgb", mb, ca) + cb)

        pm, pc = jax.lax.associative_scan(comb, (m4, c4), axis=3)
        lastm = jnp.moveaxis(pm[:, :, :, -1], 2, 0)   # (ng,r,r)
        lastc = jnp.moveaxis(pc[:, :, :, -1], 2, 0)   # (ng,r,1)

        def body(carry, inp):
            m_g, c_g = inp
            return m_g @ carry + c_g, carry

        init = jnp.zeros((r, 1), v.dtype)
        _, prevs = jax.lax.scan(body, init, (lastm, lastc))
        prevs = jnp.moveaxis(prevs, 0, 2)             # (r,1,ng)
        out = pc + jnp.einsum("ikgb,kmg->imgb", pm, prevs)
        return out.reshape(r, 1, nb)

    ref = jax.jit(lambda v, op: jax.lax.associative_scan(
        combine_t, (op, v), axis=2)[1])(cr_t, mr_t)
    got = jax.jit(chunked_scan2)(cr_t, mr_t)
    err = float(jnp.linalg.norm(ref - got) / jnp.linalg.norm(ref))
    print(f"chunked vs assoc rel diff: {err:.2e}")
    slope("chunked scan G=1024 (arg)", chunked_scan2, cr_t, mr_t)


if __name__ == "__main__":
    main()
