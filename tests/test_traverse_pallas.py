"""Pallas traversal megakernel vs the XLA while_loop traversal.

The Pallas kernel (ops/traverse_pallas.py) must be bit-identical on
hit/leaf and allclose on distance to ops/traverse.traverse — same skip-link
walk, same Moeller-Trumbore (reference semantics:
RayTraceTraversal.hlsl:41-104,133-192).  Runs in interpret mode on the CPU
test mesh; the same kernel compiles with Mosaic on real TPU.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import Rays, scene_to_device
from raytracebvh_tpu.models.procedural import random_triangles
from raytracebvh_tpu.ops.traverse import traverse
from raytracebvh_tpu.ops.traverse_pallas import traverse_pallas
from raytracebvh_tpu.pipeline import build_bvh


def _build(num_tris, seed, pad=256):
    scene = scene_to_device(random_triangles(num_tris, seed=seed))
    cfg = RenderConfig(width=16, height=16, leaf_pad_multiple=pad)
    cam = Camera.default()
    wvp, wv = camera_matrices(cam, cfg.width, cfg.height)
    return build_bvh(scene, wvp, wv, cfg)


def _random_rays(nrays, seed, lo=-60, hi=60):
    rng = np.random.default_rng(seed)
    origin = rng.uniform(lo, hi, (nrays, 3)).astype(np.float32)
    direction = rng.normal(size=(nrays, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    return Rays(origin=jnp.asarray(origin), direction=jnp.asarray(direction))


@pytest.mark.parametrize("num_tris,seed,nrays", [(60, 0, 384), (700, 1, 512)])
def test_pallas_matches_xla(num_tris, seed, nrays):
    bvh = _build(num_tris, seed)
    rays = _random_rays(nrays, seed + 50)
    ref = traverse(bvh, rays, epsilon=0.01)
    got = traverse_pallas(bvh, rays, epsilon=0.01, interpret=True)

    ref_hit = np.asarray(ref.hit)
    got_hit = np.asarray(got.hit)
    np.testing.assert_array_equal(got_hit, ref_hit)
    np.testing.assert_array_equal(
        np.asarray(got.leaf)[ref_hit], np.asarray(ref.leaf)[ref_hit]
    )
    np.testing.assert_allclose(
        np.asarray(got.distance)[ref_hit],
        np.asarray(ref.distance)[ref_hit],
        rtol=2e-5, atol=2e-5,
    )


def test_pallas_ray_padding():
    """Ray counts that are not a multiple of the block size pad cleanly."""
    bvh = _build(40, 3)
    rays = _random_rays(100, 77)  # pads 100 -> 1024
    ref = traverse(bvh, rays, epsilon=0.01)
    got = traverse_pallas(bvh, rays, epsilon=0.01, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(
        np.asarray(got.leaf)[hit], np.asarray(ref.leaf)[hit]
    )


def test_pallas_pipeline_backend():
    """cfg.traversal_backend='pallas' renders the same image as 'jnp'."""
    from raytracebvh_tpu import render_frame_jit

    scene = scene_to_device(random_triangles(120, seed=5, with_texture=True))
    cam = Camera.default()
    base = RenderConfig(width=32, height=32, bounces=1)
    img_jnp = np.asarray(render_frame_jit(scene, cam, base))
    img_pl = np.asarray(
        render_frame_jit(scene, cam, base.replace(traversal_backend="pallas"))
    )
    np.testing.assert_allclose(img_pl, img_jnp, rtol=1e-4, atol=1e-4)


def test_preorder_tables_large_tree():
    """Table invariants beyond the old u16 cap (48k leaves): interpret-
    mode execution at that size is infeasible, so validate the pre-order
    threading itself — on-device parity at scale runs in
    tests/test_tpu_device.py."""
    import jax
    from raytracebvh_tpu.ops import bvh as bvh_ops

    n = 49152  # > 32767 (old hard cap)
    rng = np.random.default_rng(0)
    codes = jnp.asarray(np.sort(rng.integers(0, 1 << 30, n).astype(np.uint32)))
    topo = bvh_ops.build_topology(codes)
    entry, skip = bvh_ops.compute_links(topo, n)
    rank = np.asarray(bvh_ops.preorder_ranks(entry, n))

    # ranks of the 2n-1 real nodes are a permutation of [0, 2n-1)
    real = rank[: 2 * n - 1]
    assert rank[2 * n - 1] == 2 * n - 1
    assert np.sort(real).tolist() == list(range(2 * n - 1))
    # root is first; left child of every internal node follows its parent
    assert rank[n] == 0
    cl = np.asarray(topo.child_l)[n : 2 * n - 1]
    ids = np.arange(n, 2 * n - 1)
    np.testing.assert_array_equal(rank[cl], rank[ids] + 1)
    # skip(x) in rank space is where the walk resumes: for every node
    # with a skip, rank[skip] > rank[node]
    sk = np.asarray(skip)[: 2 * n - 1]
    has = sk >= 0
    assert (rank[sk[has]] > real[has]).all()


def test_shade_gather_backend_parity():
    """Full frame with the pallas gather_rows shade backend (interpret
    mode) == the XLA gather shade backend."""
    from raytracebvh_tpu import Camera, RenderConfig
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.pipeline import render_frame

    import jax

    scene = scene_to_device(random_triangles(
        300, seed=7, extent=4.0, tri_size=1.5, with_texture=True))
    cam = Camera.default()
    imgs = {}
    for backend in ("xla", "pallas"):
        cfg = RenderConfig(width=32, height=32, bounces=1,
                           shade_gather_backend=backend)
        imgs[backend] = np.asarray(jax.jit(
            lambda s, c: render_frame(s, c, cfg)
        )(scene, cam))
    np.testing.assert_allclose(imgs["pallas"], imgs["xla"], atol=1e-6)


def test_shade_gather_backend_grads():
    """Gradients through gather_rows' custom vjp == XLA gather grads."""
    import jax
    import jax.numpy as jnp
    from raytracebvh_tpu import Camera, RenderConfig
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.pipeline import render_frame

    scene = scene_to_device(random_triangles(
        300, seed=7, extent=4.0, tri_size=1.5, with_texture=True))
    cam = Camera.default()

    def loss(diffuse, backend):
        cfg = RenderConfig(width=24, height=24, bounces=1,
                           shade_gather_backend=backend)
        s = scene.replace(materials=scene.materials.replace(diffuse=diffuse))
        return jnp.sum(render_frame(s, cam, cfg) ** 2)

    g_x = jax.jit(jax.grad(lambda d: loss(d, "xla")))(scene.materials.diffuse)
    g_p = jax.jit(jax.grad(lambda d: loss(d, "pallas")))(scene.materials.diffuse)
    assert np.abs(np.asarray(g_x)).sum() > 0
    np.testing.assert_allclose(np.asarray(g_p), np.asarray(g_x),
                               rtol=1e-4, atol=1e-6)
