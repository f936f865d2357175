"""Gather-free permutation application (precond/permute.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from cpkrylov_tpu.precond.permute import (ComposedPermute, DiaPermute,
                                          GatherPermute, IdentityPermute,
                                          InterleavePermute,
                                          interleave_candidates,
                                          interleave_ordering, plan_permute)


def _check_roundtrip(op, perm):
    n = perm.shape[0]
    z = np.arange(1.0, n + 1.0)
    zz = jnp.asarray(z)
    np.testing.assert_array_equal(np.asarray(op.apply(zz)), z[perm])
    out = np.empty(n)
    out[perm] = z
    np.testing.assert_array_equal(np.asarray(op.apply_inv(zz)), out)


@pytest.mark.parametrize("n,m,c", [(8, 2, 4), (10, 3, 1), (10, 3, 3),
                                   (12, 4, 2), (8, 8, 1), (64, 16, 4)])
def test_interleave_matches_perm_array(n, m, c):
    op = interleave_ordering(n, m, c)
    perm = op.perm
    assert sorted(perm) == list(range(n + m))
    _check_roundtrip(op, perm)


def test_interleave_candidates_cover_unit_and_ratio():
    cands = interleave_candidates(4096, 1024)
    assert sorted(cd.c for cd in cands) == [1, 4]
    assert interleave_ordering(3, 7) is None      # n < m


def test_plan_identity():
    op = plan_permute(np.arange(100))
    assert isinstance(op, IdentityPermute)
    _check_roundtrip(op, np.arange(100))


def test_plan_dia_for_local_swaps():
    rng = np.random.default_rng(0)
    base = np.arange(400)
    p = base.copy().reshape(200, 2)
    swap = rng.random(200) < 0.4
    p[swap] = p[swap][:, ::-1]
    perm = p.reshape(-1)
    op = plan_permute(perm)
    assert isinstance(op, DiaPermute)
    _check_roundtrip(op, perm)


def test_plan_gather_fallback_for_random_perm():
    perm = np.random.default_rng(1).permutation(500)
    op = plan_permute(perm)
    assert isinstance(op, GatherPermute)
    _check_roundtrip(op, perm)


def test_plan_composed_base_plus_splice():
    base = interleave_ordering(40, 10, 4)
    bp = base.perm
    # Simulate an adjacent 2x2-pivot splice on the base ordering: swap two
    # neighbouring positions of the factor ordering.
    perm = bp.copy()
    perm[[7, 8]] = perm[[8, 7]]
    op = plan_permute(perm, base=base)
    assert isinstance(op, ComposedPermute)
    assert isinstance(op.first, InterleavePermute)
    _check_roundtrip(op, perm)


def test_plan_returns_base_when_exact():
    base = interleave_ordering(48, 12, 4)
    op = plan_permute(base.perm.copy(), base=base)
    assert op is base


def test_factor_apply_uses_interleave_on_banded_kkt():
    """End-to-end: supplying the interleave ordering to the factorization
    yields a gather-free FactorApply that solves K_P to machine precision."""
    from cpkrylov_tpu.precond import ldl_host
    from cpkrylov_tpu.precond.cp import assemble_kp, build_factor_apply
    from cpkrylov_tpu.utils.fixtures import banded_saddle_system

    n, m = 2048, 512
    s = banded_saddle_system(n, m, bandwidth=3, with_oracle=False)
    ksp = assemble_kp(s.G, s.B, s.C)
    base = interleave_ordering(n, m, 1)
    signs = np.concatenate([np.ones(n), -np.ones(m)])
    fac = ldl_host.factorize(ksp, ordering=np.asarray(base.perm, np.int32),
                             pivot_signs=signs)
    fa = build_factor_apply(fac, n + m, 256, np.float64, base_order=base)
    assert isinstance(fa.pin, (InterleavePermute, ComposedPermute))
    z = np.random.default_rng(0).standard_normal(n + m)
    y = np.asarray(fa.solve(jnp.asarray(z)))
    rel = np.linalg.norm(ksp @ y - z) / np.linalg.norm(z)
    assert rel < 1e-13, rel
