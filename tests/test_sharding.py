"""Multi-device sharding on the virtual 8-device CPU mesh.

The sharded paths must produce the same image as the single-device
pipeline, and the shard_map training step must produce the same gradients
as plain jax.grad (collectives correctness)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracebvh_tpu import Camera, RenderConfig, render_frame_jit
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.inverse import apply_params, init_params
from raytracebvh_tpu.models.procedural import random_triangles
from raytracebvh_tpu.parallel.mesh import make_mesh
from raytracebvh_tpu.parallel.render import (
    render_geo_sharded,
    render_sharded,
    train_step_sharded,
)


def _scene_cfg(ntris=16, h=32, w=16):
    scene = scene_to_device(
        random_triangles(ntris, seed=5, extent=8.0, tri_size=2.0,
                         with_texture=True)
    )
    cfg = RenderConfig(width=w, height=h, bounces=1, leaf_pad_multiple=32)
    return scene, Camera.default(), cfg


def test_eight_devices_available():
    assert len(jax.devices()) == 8


def test_render_sharded_matches_single():
    scene, cam, cfg = _scene_cfg()
    mesh = make_mesh(8, geo=1)
    img_s = np.asarray(render_sharded(scene, cam, cfg, mesh))
    img_1 = np.asarray(render_frame_jit(scene, cam, cfg))
    np.testing.assert_allclose(img_s, img_1, atol=1e-6)


def test_render_geo_sharded_matches_single():
    # 16 tris -> 48 verts/indices divide geo=2; 32 rows divide rays=4
    scene, cam, cfg = _scene_cfg()
    mesh = make_mesh(8, geo=2)
    img_s = np.asarray(render_geo_sharded(scene, cam, cfg, mesh))
    img_1 = np.asarray(render_frame_jit(scene, cam, cfg))
    # the gathered-geometry program compiles differently, so f32
    # reassociation shifts a few boundary texels by ~1e-5
    np.testing.assert_allclose(img_s, img_1, atol=1e-3)


def test_train_step_sharded_grads_match():
    scene, cam, cfg = _scene_cfg()
    mesh = make_mesh(8, geo=2)
    params = init_params(scene)
    target = jnp.zeros((cfg.height, cfg.width, 4), jnp.float32)

    loss_s, grads_s = train_step_sharded(
        params, apply_params, scene, cam, target, cfg, mesh
    )

    from raytracebvh_tpu.models.inverse import loss_fn

    loss_1, grads_1 = jax.value_and_grad(loss_fn)(
        params, scene, cam, target, cfg
    )
    np.testing.assert_allclose(float(loss_s), float(loss_1), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_s), jax.tree_util.tree_leaves(grads_1)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_dryrun_multichip_entry():
    """The driver-facing dry run must work for 8 virtual devices."""
    import importlib.util
    import os

    spec = importlib.util.spec_from_file_location(
        "graft_entry",
        os.path.join(os.path.dirname(__file__), "..", "__graft_entry__.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
