"""HBM-resident windowed sweep kernel vs the XLA while_loop traversal.

ops/traverse_hbm.py keeps the node table in HBM and sweeps it through a
double-buffered VMEM window; results must equal ops/traverse.traverse
(reference semantics: RayTraceTraversal.hlsl:41-104,133-192).  Interpret
mode on CPU emulates the DMAs; on-device parity at 50k/100k leaves runs
in tests/test_tpu_device.py.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import Rays, scene_to_device
from raytracebvh_tpu.models.procedural import random_triangles
from raytracebvh_tpu.ops.traverse import traverse, traverse_any
from raytracebvh_tpu.ops.traverse_hbm import (
    traverse_any_hbm_pallas,
    traverse_hbm_pallas,
)
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


# win=256 with 700 tris -> multiple windows, exercising the prefetch,
# misprediction, and window-skip paths
@pytest.mark.parametrize(
    "num_tris,seed,nrays,win", [(60, 0, 384, 256), (700, 1, 512, 256)]
)
def test_hbm_matches_xla(num_tris, seed, nrays, win):
    bvh = _build(num_tris, seed)
    rays = _random_rays(nrays, seed + 50)
    ref = traverse(bvh, rays, epsilon=0.01)
    got = traverse_hbm_pallas(
        bvh, rays, epsilon=0.01, win=win, block_rays=256, interpret=True
    )

    ref_hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(got.hit), ref_hit)
    np.testing.assert_array_equal(
        np.asarray(got.leaf)[ref_hit], np.asarray(ref.leaf)[ref_hit]
    )
    np.testing.assert_allclose(
        np.asarray(got.distance)[ref_hit],
        np.asarray(ref.distance)[ref_hit],
        rtol=2e-5, atol=2e-5,
    )


def test_hbm_ray_padding():
    bvh = _build(40, 3)
    rays = _random_rays(100, 77)  # pads 100 -> 256
    ref = traverse(bvh, rays, epsilon=0.01)
    got = traverse_hbm_pallas(
        bvh, rays, epsilon=0.01, block_rays=256, win=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got.hit), np.asarray(ref.hit))
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(
        np.asarray(got.leaf)[hit], np.asarray(ref.leaf)[hit]
    )


def test_hbm_any_matches_xla():
    bvh = _build(300, 9)
    rays = _random_rays(384, 59)
    rng = np.random.default_rng(9)
    max_t = jnp.asarray(rng.uniform(5.0, 500.0, 384).astype(np.float32))
    ref = traverse_any(bvh, rays, 0.01, max_t)
    got = traverse_any_hbm_pallas(
        bvh, rays, 0.01, max_t, block_rays=256, win=256, interpret=True
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_hbm_pipeline_backend():
    """cfg.traversal_backend='hbm' renders the same image as 'jnp',
    including the shadow (any-hit) path."""
    import numpy as np
    from raytracebvh_tpu import render_frame_jit
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.models.procedural import random_triangles

    scene = scene_to_device(random_triangles(120, seed=5, with_texture=True))
    cam = Camera.default()
    base = RenderConfig(width=32, height=32, bounces=1, enable_shadows=True)
    img_jnp = np.asarray(render_frame_jit(scene, cam, base))
    img_hbm = np.asarray(
        render_frame_jit(scene, cam, base.replace(traversal_backend="hbm"))
    )
    np.testing.assert_allclose(img_hbm, img_jnp, rtol=1e-4, atol=1e-4)


def test_hbm_backend_grads_match():
    """Gradient parity through the hbm backend (BASELINE config 5 class:
    the large-scene fwd+bwd path is hbm traversal + XLA shade gather).
    Traversal ids are stop-grad, so equal hit records must give equal
    grads — this exercises the per-build hbm-table pack under autodiff
    (shade_rays packs it inside the differentiated function)."""
    import jax

    from raytracebvh_tpu.models.inverse import init_params, loss_fn

    scene = scene_to_device(random_triangles(120, seed=6, with_texture=True))
    cam = Camera.default()
    base = RenderConfig(width=16, height=16, bounces=1)
    target = np.zeros((16, 16, 4), np.float32)
    params = init_params(scene)

    def grads(cfg):
        g = jax.grad(lambda p: loss_fn(p, scene, cam, target, cfg))(params)
        return jax.tree_util.tree_map(np.asarray, g)

    g_jnp = grads(base)
    g_hbm = grads(base.replace(traversal_backend="hbm"))
    for a, b in zip(jax.tree_util.tree_leaves(g_jnp),
                    jax.tree_util.tree_leaves(g_hbm)):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_hbm_backstop_returns_without_hang():
    """A tiny max_steps trips the refill kernel's iteration backstop:
    the kernel must still terminate (all out-DMAs matched) and return
    well-formed (possibly incomplete) hit records."""
    bvh = _build(120, seed=7)
    rays = _random_rays(256, 77)
    rec = traverse_hbm_pallas(bvh, rays, 0.01, max_steps=1,
                              block_rays=256, win=256, interpret=True)
    assert rec.hit.shape == (256,)
    assert np.asarray(rec.distance).shape == (256,)


def test_pump_and_wsweep_modes_parity():
    """The serve-mode variants must all reproduce the XLA walk exactly:
    pump>1 (multi-round serves per subtile load — the shipped default is
    pump=2) and the opt-in wsweep full-window gather (kept selectable
    after measuring slower at 102k tris, BENCH_NOTES round 5)."""
    bvh = _build(700, seed=21)
    rays = _random_rays(1500, seed=22)
    ref = traverse(bvh, rays, 0.01)
    for kw in (dict(pump=1), dict(pump=3), dict(wsweep=True),
               dict(wsweep=True, pump=2)):
        rec, steps, occ = traverse_hbm_pallas(
            bvh, rays, 0.01, block_rays=512, return_occupancy=True, **kw)
        np.testing.assert_array_equal(np.asarray(rec.hit),
                                      np.asarray(ref.hit))
        np.testing.assert_array_equal(np.asarray(rec.leaf),
                                      np.asarray(ref.leaf))
        np.testing.assert_allclose(np.asarray(rec.distance),
                                   np.asarray(ref.distance))
        # occupancy invariant: total active-lane-serves is mode-
        # independent (every lane takes the same walk)
        assert int(np.asarray(occ).sum()) > 0
        assert int(np.asarray(steps).sum()) > 0


def test_any_hit_wsweep_parity():
    bvh = _build(500, seed=23)
    rays = _random_rays(1000, seed=24)
    ref = traverse_any(bvh, rays, 0.01, 1e30)
    occ = traverse_any_hbm_pallas(bvh, rays, 0.01, 1e30, block_rays=512,
                                  wsweep=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(occ))
