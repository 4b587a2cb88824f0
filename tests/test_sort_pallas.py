"""In-VMEM bitonic sort kernel vs lax.sort (ops/sort.sort_by_code).

Must produce the identical stable-ascending permutation (the Karras
builder's index tie-break depends on it, reference:
BVHConstructP1.hlsl:61-72; sort semantics reference: RadixSortP1/P2.hlsl).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracebvh_tpu.ops.sort import sort_by_code
from raytracebvh_tpu.ops.sort_pallas import bitonic_sort_by_code


@pytest.mark.parametrize("n,seed", [(256, 0), (1024, 1), (4096, 2)])
def test_bitonic_matches_lax(n, seed):
    rng = np.random.default_rng(seed)
    codes = jnp.asarray(rng.integers(0, 1 << 30, n).astype(np.uint32))
    ref_c, ref_o = sort_by_code(codes)
    got_c, got_o = bitonic_sort_by_code(codes)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))


def test_bitonic_with_duplicates_is_stable():
    """Heavy duplicates: the (code, index) lexicographic network must
    reproduce the stable order exactly."""
    rng = np.random.default_rng(7)
    codes = jnp.asarray(rng.integers(0, 7, 2048).astype(np.uint32))
    ref_c, ref_o = sort_by_code(codes)
    got_c, got_o = bitonic_sort_by_code(codes)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))


def test_bitonic_non_pow2_and_sentinels():
    """Non-power-of-two n with sentinel (0x3FFFFFFF) padding codes, the
    shape the build pipeline feeds the sort."""
    rng = np.random.default_rng(3)
    n = 768
    codes = np.concatenate([
        rng.integers(0, 1 << 30, n - 100).astype(np.uint32),
        np.full(100, 0x3FFFFFFF, np.uint32),
    ])
    codes = jnp.asarray(codes)
    ref_c, ref_o = sort_by_code(codes)
    got_c, got_o = bitonic_sort_by_code(codes)
    np.testing.assert_array_equal(np.asarray(got_c), np.asarray(ref_c))
    np.testing.assert_array_equal(np.asarray(got_o), np.asarray(ref_o))


def test_bitonic_pipeline_backend():
    """cfg.sort_backend='bitonic' builds the same BVH / image."""
    from raytracebvh_tpu import Camera, RenderConfig, render_frame_jit
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.models.procedural import random_triangles

    scene = scene_to_device(random_triangles(120, seed=5, with_texture=True))
    cam = Camera.default()
    base = RenderConfig(width=32, height=32, bounces=1)
    img_lax = np.asarray(render_frame_jit(scene, cam, base))
    img_bit = np.asarray(
        render_frame_jit(scene, cam, base.replace(sort_backend="bitonic"))
    )
    np.testing.assert_array_equal(img_bit, img_lax)
