"""On-device (real TPU) parity tests.

The CPU suite pins jax to a virtual 8-device CPU mesh (conftest.py), so
the Pallas kernels there only ever run in interpret mode.  This module
is the Mosaic-compiled counterpart: it runs ONLY when invoked outside
the conftest pin with a real TPU attached, e.g.

    python -m pytest tests/test_tpu_device.py -q -p no:cacheprovider \
        --override-ini addopts= --co  # (collect)
    RTBVH_TPU_TESTS=1 python tests/test_tpu_device.py   # direct runner

Direct execution avoids conftest.py's CPU pin entirely; the pytest path
skips unless the backend is already TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

requires_tpu = pytest.mark.skipif(
    jax.default_backend() != "tpu", reason="needs a real TPU backend"
)


def _setup(n_tris=500, width=128, height=96, seed=3):
    from raytracebvh_tpu import Camera, RenderConfig
    from raytracebvh_tpu.camera import camera_matrices
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.models.procedural import random_triangles
    from raytracebvh_tpu.pipeline import build_bvh, make_rays

    scene = scene_to_device(random_triangles(n_tris, seed=seed,
                                             with_texture=True))
    cfg = RenderConfig(width=width, height=height, bounces=1)
    cam = Camera.default()
    wvp, wv = camera_matrices(cam, width, height)
    bvh = jax.jit(lambda s: build_bvh(s, wvp, wv, cfg))(scene)
    rays = make_rays(cam, cfg)
    return scene, cfg, cam, bvh, rays


@requires_tpu
def test_pallas_traversal_parity_on_device():
    """Mosaic-compiled traversal == XLA while_loop traversal, on chip."""
    from raytracebvh_tpu.ops.traverse import traverse
    from raytracebvh_tpu.ops.traverse_pallas import traverse_pallas

    scene, cfg, cam, bvh, rays = _setup()
    rec_x = jax.jit(lambda b, r: traverse(b, r, cfg.epsilon))(bvh, rays)
    rec_p = jax.jit(lambda b, r: traverse_pallas(b, r, cfg.epsilon))(bvh, rays)
    np.testing.assert_array_equal(np.asarray(rec_x.hit), np.asarray(rec_p.hit))
    np.testing.assert_array_equal(
        np.asarray(rec_x.leaf)[np.asarray(rec_x.hit)],
        np.asarray(rec_p.leaf)[np.asarray(rec_p.hit)],
    )
    np.testing.assert_allclose(
        np.asarray(rec_x.distance), np.asarray(rec_p.distance), rtol=1e-6
    )


@requires_tpu
def test_pallas_any_hit_parity_on_device():
    from raytracebvh_tpu.core.types import Rays
    from raytracebvh_tpu.ops.traverse import traverse_any
    from raytracebvh_tpu.ops.traverse_pallas import traverse_any_pallas

    scene, cfg, cam, bvh, rays = _setup(n_tris=300, width=64, height=64)
    rng = np.random.default_rng(0)
    max_t = jnp.asarray(rng.uniform(5.0, 300.0, rays.origin.shape[0]),
                        jnp.float32)
    occ_x = jax.jit(lambda b, r, m: traverse_any(b, r, cfg.epsilon, m))(
        bvh, rays, max_t
    )
    occ_p = jax.jit(
        lambda b, r, m: traverse_any_pallas(b, r, cfg.epsilon, m)
    )(bvh, rays, max_t)
    np.testing.assert_array_equal(np.asarray(occ_x), np.asarray(occ_p))


@requires_tpu
def test_grad_step_finite_on_device():
    """A small fwd+bwd step through the full pipeline (pallas traversal)
    produces finite, nonzero gradients on chip."""
    from raytracebvh_tpu.models.inverse import init_params, loss_fn

    scene, cfg, cam, bvh, rays = _setup(width=64, height=64)
    params = init_params(scene)
    target = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)
    loss, grads = jax.jit(
        jax.value_and_grad(lambda p: loss_fn(p, scene, cam, target, cfg))
    )(params)
    assert np.isfinite(float(loss))
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    assert sum(float(np.abs(np.asarray(g)).sum()) for g in leaves) > 0


@requires_tpu
def test_hbm_refill_parity_on_device():
    """The persistent-refill HBM sweep (the >32k-leaf backend) == XLA
    while_loop traversal, Mosaic-compiled, above the u16 kernel's cap."""
    from raytracebvh_tpu.ops.traverse import traverse
    from raytracebvh_tpu.ops.traverse_hbm import traverse_hbm_pallas

    scene, cfg, cam, bvh, rays = _setup(n_tris=40000, width=256, height=192)
    assert bvh.n_leaves > 32767  # really the hbm regime
    rec_h = jax.jit(lambda b, r: traverse_hbm_pallas(b, r, cfg.epsilon))(
        bvh, rays)
    sub = jax.tree_util.tree_map(lambda x: x[::17][:2048], rays)
    rec_x = jax.jit(lambda b, r: traverse(b, r, cfg.epsilon))(bvh, sub)
    rec_s = jax.tree_util.tree_map(lambda x: x[::17][:2048], rec_h)
    hx = np.asarray(rec_x.hit)
    np.testing.assert_array_equal(np.asarray(rec_s.hit), hx)
    np.testing.assert_array_equal(
        np.asarray(rec_s.leaf)[hx], np.asarray(rec_x.leaf)[hx])
    np.testing.assert_allclose(
        np.asarray(rec_s.distance)[hx], np.asarray(rec_x.distance)[hx],
        rtol=2e-5, atol=2e-5)


@requires_tpu
def test_hbm_any_refill_parity_on_device():
    from raytracebvh_tpu.ops.traverse import traverse_any
    from raytracebvh_tpu.ops.traverse_hbm import traverse_any_hbm_pallas

    scene, cfg, cam, bvh, rays = _setup(n_tris=40000, width=128, height=96)
    rng = np.random.default_rng(1)
    max_t = jnp.asarray(rng.uniform(5.0, 300.0, rays.origin.shape[0]),
                        jnp.float32)
    occ_h = jax.jit(
        lambda b, r, m: traverse_any_hbm_pallas(b, r, cfg.epsilon, m)
    )(bvh, rays, max_t)
    sub = jax.tree_util.tree_map(lambda x: x[::13][:512], rays)
    occ_x = jax.jit(lambda b, r, m: traverse_any(b, r, cfg.epsilon, m))(
        bvh, sub, max_t[::13][:512])
    np.testing.assert_array_equal(
        np.asarray(occ_h)[::13][:512], np.asarray(occ_x))


@requires_tpu
def test_windowed_gather_parity_on_device():
    """Mosaic-compiled windowed HBM gather (round 5) == plain indexing,
    on real texel-stream-shaped indices (clustered runs + jumps)."""
    from raytracebvh_tpu.ops.gather_hbm import gather_rows_hbm

    rng = np.random.default_rng(2)
    tbl = jnp.asarray(rng.normal(size=(20000, 16)), jnp.float32)
    base = np.repeat(rng.integers(0, 19000, 64), 4096 // 64)
    idx = np.clip(base + rng.integers(0, 900, 4096), 0, 19999).astype(
        np.int32)
    out = jax.jit(lambda t, i: gather_rows_hbm(t, i))(tbl, jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx].T)


@requires_tpu
def test_windowed_texture_frame_parity_on_device():
    """Full frame: windowed (tiled-window + u32-UNORM8) texture path ==
    the XLA quad gather, Mosaic-compiled."""
    from raytracebvh_tpu.pipeline import render_frame

    scene, cfg, cam, bvh, rays = _setup(n_tris=400, width=96, height=64)
    cfg = cfg.replace(ortho_scale=0.3)
    a = jax.jit(lambda s, c: render_frame(
        s, c, cfg.replace(texture_gather_backend="xla",
                          texture_dtype="uint8")))(scene, cam)
    b = jax.jit(lambda s, c: render_frame(
        s, c, cfg.replace(texture_gather_backend="windowed",
                          texture_dtype="uint8")))(scene, cam)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@requires_tpu
def test_hbm_pump_parity_on_device():
    """pump=1/2/3 refill sweeps produce identical hit records on chip."""
    from raytracebvh_tpu.ops.traverse_hbm import traverse_hbm_pallas

    scene, cfg, cam, bvh, rays = _setup(n_tris=40000, width=128, height=96)
    ref = None
    for pump in (1, 2, 3):
        rec = jax.jit(lambda b, r, p=pump: traverse_hbm_pallas(
            b, r, cfg.epsilon, pump=p))(bvh, rays)
        cur = (np.asarray(rec.hit), np.asarray(rec.leaf),
               np.asarray(rec.distance))
        if ref is None:
            ref = cur
        else:
            np.testing.assert_array_equal(ref[0], cur[0])
            np.testing.assert_array_equal(ref[1], cur[1])
            np.testing.assert_allclose(ref[2], cur[2])


@requires_tpu
def test_windowed_leaf_gather_frame_parity_on_device():
    """shade_gather_backend windowed == xla, full frame on chip (the
    >32k-leaf auto route)."""
    from raytracebvh_tpu.pipeline import render_frame

    scene, cfg, cam, bvh, rays = _setup(n_tris=2000, width=96, height=64)
    cfg = cfg.replace(ortho_scale=0.3)
    a = jax.jit(lambda s, c: render_frame(
        s, c, cfg.replace(shade_gather_backend="xla")))(scene, cam)
    b = jax.jit(lambda s, c: render_frame(
        s, c, cfg.replace(shade_gather_backend="windowed")))(scene, cam)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


if __name__ == "__main__":
    # direct runner (bypasses conftest's CPU pin); make the repo root
    # importable when invoked as `python tests/test_tpu_device.py`
    import os
    import sys

    sys.path.insert(
        0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    if jax.default_backend() != "tpu":
        print("no TPU backend; skipping")
    else:
        test_pallas_traversal_parity_on_device()
        print("traversal parity ok")
        test_pallas_any_hit_parity_on_device()
        print("any-hit parity ok")
        test_grad_step_finite_on_device()
        print("grad step ok")
        test_hbm_refill_parity_on_device()
        print("hbm refill parity ok")
        test_hbm_any_refill_parity_on_device()
        print("hbm any-hit refill parity ok")
        test_windowed_gather_parity_on_device()
        print("windowed gather parity ok")
        test_windowed_texture_frame_parity_on_device()
        print("windowed texture frame parity ok")
        test_hbm_pump_parity_on_device()
        print("hbm pump parity ok")
        test_windowed_leaf_gather_frame_parity_on_device()
        print("windowed leaf gather frame parity ok")
