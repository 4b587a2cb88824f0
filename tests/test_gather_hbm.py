"""Windowed HBM gather (ops/gather_hbm.py): exactness, vjp, and the
windowed texture path's image/grad parity with the XLA gather.

Runs in Pallas interpret mode on the CPU mesh (conftest pins cpu)."""

import jax
import jax.numpy as jnp
import numpy as np

from raytracebvh_tpu import Camera, RenderConfig, render_frame_jit
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.inverse import init_params, loss_fn
from raytracebvh_tpu.models.procedural import random_triangles
from raytracebvh_tpu.ops.gather_hbm import (
    gather_rows_hbm,
    gather_rows_packed,
    pack_rows_windowed,
)


def test_gather_rows_hbm_exact_and_vjp():
    rng = np.random.default_rng(0)
    rows, c, r = 5000, 16, 4096
    tbl = jnp.asarray(rng.normal(size=(rows, c)), jnp.float32)
    # clustered runs + jumps + repeats (the coherence contract)
    base = np.repeat(rng.integers(0, rows - 300, 16), r // 16)
    idx = np.clip(base + rng.integers(0, 300, r), 0, rows - 1).astype(
        np.int32
    )
    out = gather_rows_hbm(tbl, jnp.asarray(idx))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(tbl)[idx].T)

    # unpadded ray count + vjp = scatter-add of the cotangent
    idx2 = jnp.asarray(idx[:3000])
    g = jax.grad(lambda t: (gather_rows_hbm(t, idx2) * 0.5).sum())(tbl)
    gref = np.zeros((rows, c), np.float32)
    np.add.at(gref, np.asarray(idx2), 0.5)
    np.testing.assert_allclose(np.asarray(g), gref, rtol=1e-6)


def test_gather_rows_packed_channel_pad():
    # c not a multiple of 8: pack pads, gather slices back
    rng = np.random.default_rng(1)
    tbl = jnp.asarray(rng.normal(size=(700, 5)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 700, 500), jnp.int32)
    out = gather_rows_packed(pack_rows_windowed(tbl), idx, 5)
    assert out.shape == (5, 500)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(tbl)[np.asarray(idx)].T
    )


def _scene_cam():
    scene = scene_to_device(
        random_triangles(150, seed=9, with_texture=True)
    )
    return scene, Camera.default()


def test_windowed_texture_image_parity():
    scene, cam = _scene_cam()
    base = RenderConfig(width=32, height=32, bounces=2, ortho_scale=0.2)
    a = np.asarray(render_frame_jit(
        scene, cam, base.replace(texture_gather_backend="xla")))
    b = np.asarray(render_frame_jit(
        scene, cam, base.replace(texture_gather_backend="windowed")))
    np.testing.assert_array_equal(a, b)
    # u32-packed UNORM8 windowed == plain u8 xla (same quantization)
    c = np.asarray(render_frame_jit(scene, cam, base.replace(
        texture_gather_backend="xla", texture_dtype="uint8")))
    d = np.asarray(render_frame_jit(scene, cam, base.replace(
        texture_gather_backend="windowed", texture_dtype="uint8")))
    np.testing.assert_array_equal(c, d)


def test_windowed_texture_grad_parity():
    scene, cam = _scene_cam()
    cfg = RenderConfig(width=16, height=16, bounces=1, ortho_scale=0.2)
    target = jnp.zeros((16, 16, 4), jnp.float32)
    params = init_params(scene)

    def grads(c):
        return jax.grad(
            lambda p: loss_fn(p, scene, cam, target, c))(params)

    g0 = grads(cfg.replace(texture_gather_backend="xla"))
    g1 = grads(cfg.replace(texture_gather_backend="windowed"))
    for a, b in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-7)


def test_windowed_leaf_gather_parity():
    """shade_gather_backend='windowed' (the >32k-leaf TPU auto choice)
    must match the XLA row gather exactly — image and grads."""
    scene, cam = _scene_cam()
    base = RenderConfig(width=32, height=32, bounces=1, ortho_scale=0.2)
    a = np.asarray(render_frame_jit(
        scene, cam, base.replace(shade_gather_backend="xla")))
    b = np.asarray(render_frame_jit(
        scene, cam, base.replace(shade_gather_backend="windowed")))
    np.testing.assert_array_equal(a, b)

    cfg = RenderConfig(width=16, height=16, bounces=1, ortho_scale=0.2)
    target = jnp.zeros((16, 16, 4), jnp.float32)
    params = init_params(scene)

    def grads(c):
        return jax.grad(
            lambda p: loss_fn(p, scene, cam, target, c))(params)

    g0 = grads(cfg.replace(shade_gather_backend="xla"))
    g1 = grads(cfg.replace(shade_gather_backend="windowed"))
    for x, y in zip(jax.tree_util.tree_leaves(g0),
                    jax.tree_util.tree_leaves(g1)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y),
                                   rtol=1e-6, atol=1e-7)
