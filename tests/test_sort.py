"""Radix sort backend vs lax.sort: same stable permutation.

The radix path re-implements the reference's 1-bit LSD sort
(RadixSortP1/P2.hlsl) in XLA; both backends must return the identical
(codes, order) pair — including the stability tie-break the Karras
builder depends on (reference: BVHConstructP1.hlsl:61-72)."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracebvh_tpu.ops.sort import radix_sort_by_code, sort_by_code


@pytest.mark.parametrize("n,seed", [(256, 0), (1024, 1), (4096, 2)])
def test_radix_matches_lax(n, seed):
    rng = np.random.default_rng(seed)
    codes = jnp.asarray(rng.integers(0, 1 << 30, n, dtype=np.uint32))
    c_lax, o_lax = sort_by_code(codes)
    c_rad, o_rad = radix_sort_by_code(codes)
    np.testing.assert_array_equal(np.asarray(c_rad), np.asarray(c_lax))
    np.testing.assert_array_equal(np.asarray(o_rad), np.asarray(o_lax))


def test_radix_stability_on_duplicates():
    # many duplicate codes: stability means ascending original indices
    # within each equal-code run
    rng = np.random.default_rng(3)
    codes = jnp.asarray(rng.integers(0, 8, 512, dtype=np.uint32))
    c, o = radix_sort_by_code(codes)
    c_np, o_np = np.asarray(c), np.asarray(o)
    for v in np.unique(c_np):
        grp = o_np[c_np == v]
        assert np.all(np.diff(grp) > 0)


def test_radix_with_sentinels():
    # padding leaves carry the sentinel 0x3FFFFFFF and must sort last,
    # in original order
    codes = jnp.asarray(
        np.array([5, 0x3FFFFFFF, 3, 0x3FFFFFFF, 1], np.uint32)
    )
    c, o = radix_sort_by_code(codes)
    np.testing.assert_array_equal(np.asarray(o), [4, 2, 0, 1, 3])
