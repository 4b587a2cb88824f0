"""Refraction pass — the capability the reference allocates but never
dispatches (reference: RayTraceLaunch.hlsl:69-80 spawns refract rays into
u5; Graphics.cpp:805-809 comments out the dispatch; quirk Q4).  Here it
runs for real and must match the float64 golden model."""

import jax
import numpy as np

from raytracebvh_tpu import Camera, RenderConfig, render_frame_jit
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import random_triangles
from raytracebvh_tpu.ref.golden import render_golden

EYE = np.array([0.0, 5.0, -100.0])
AT = np.zeros(3)
UP = np.array([0.0, 1.0, 0.0])


def _scene():
    # semi-transparent glassy triangles: alpha .4, eta .7
    return random_triangles(200, seed=11, alpha=0.4, optical_density=0.7)


def test_refraction_matches_golden_f64():
    scene_h = _scene()
    with jax.enable_x64(True):
        import jax.numpy as jnp

        cfg = RenderConfig(width=48, height=48, bounces=2, dtype="float64",
                           texture_dtype="float32",
                           enable_refraction=True, ortho_scale=0.2)
        scene = scene_to_device(scene_h, dtype=jnp.float64)
        cam = Camera.default(jnp.float64)
        img = np.asarray(render_frame_jit(scene, cam, cfg))
    gold = render_golden(scene_h, EYE, AT, UP, 48, 48, bounces=2,
                         refraction=True, ortho_scale=0.2)
    np.testing.assert_allclose(img, gold, atol=1e-9)


def test_refraction_changes_transparent_pixels_only():
    scene_h = _scene()
    scene = scene_to_device(scene_h)
    cam = Camera.default()
    base = RenderConfig(width=48, height=48, bounces=1, ortho_scale=0.2)
    img_off = np.asarray(render_frame_jit(scene, cam, base))
    img_on = np.asarray(
        render_frame_jit(scene, cam, base.replace(enable_refraction=True))
    )
    assert not np.allclose(img_on, img_off)  # transparency visible

    # fully opaque scene: refraction must be a no-op
    opaque_h = random_triangles(200, seed=11, alpha=1.0, optical_density=0.7)
    opaque = scene_to_device(opaque_h)
    o_off = np.asarray(render_frame_jit(opaque, cam, base))
    o_on = np.asarray(
        render_frame_jit(opaque, cam, base.replace(enable_refraction=True))
    )
    np.testing.assert_allclose(o_on, o_off)
