"""End-to-end renders vs the golden model, on the reference's own assets."""

import jax
import numpy as np
import pytest

from raytracebvh_tpu import Camera, RenderConfig, render_frame_jit
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import random_triangles
from raytracebvh_tpu.ref.golden import render_golden

EYE = np.array([0.0, 5.0, -100.0])
AT = np.zeros(3)
UP = np.array([0.0, 1.0, 0.0])


def _compare(scene_h, w, h, bounces, f64=False, cfg_extra=()):
    import jax.numpy as jnp
    import jax as _jax

    cfg = RenderConfig(width=w, height=h, bounces=bounces,
                       dtype="float64" if f64 else "float32",
                       texture_dtype="float32",
                       **dict(cfg_extra))
    dtype = jnp.float64 if f64 else jnp.float32
    scene = scene_to_device(scene_h, dtype=dtype)
    cam = Camera.default(dtype)
    img = np.asarray(render_frame_jit(scene, cam, cfg))
    gold = render_golden(scene_h, EYE, AT, UP, w, h, bounces=bounces)
    return img, gold


def test_rect_f64_exact(rect_scene):
    """In float64 the pipeline must match the brute-force golden model to
    near machine precision (same math, different execution strategy)."""
    with jax.enable_x64(True):
        img, gold = _compare(rect_scene, 64, 64, bounces=3, f64=True)
    np.testing.assert_allclose(img, gold, atol=1e-9)


def test_rect_f32_close(rect_scene):
    img, gold = _compare(rect_scene, 64, 64, bounces=3)
    diff = np.abs(img - gold)
    assert diff.mean() < 0.02
    assert (diff > 0.05).mean() < 0.02  # only isolated boundary pixels


def test_procedural_f64_exact():
    scene_h = random_triangles(300, seed=7, with_texture=True)
    with jax.enable_x64(True):
        img, gold = _compare(scene_h, 48, 48, bounces=2, f64=True)
    np.testing.assert_allclose(img, gold, atol=1e-9)


def test_bounces_change_image(rect_scene):
    """Rect.mtl has Ns 94.1 -> reflection intensity .094: bounce passes
    must alter the image (reference runs 3, Graphics.cpp:795)."""
    img0, _ = _compare(rect_scene, 32, 32, bounces=0)
    img3, _ = _compare(rect_scene, 32, 32, bounces=3)
    assert np.abs(img0 - img3).max() > 1e-4


def test_test_obj_renders(test_scene):
    """Test.obj (1952 tris, 3 materials + texture) end-to-end, f64 vs
    golden."""
    with jax.enable_x64(True):
        img, gold = _compare(test_scene, 32, 32, bounces=1, f64=True)
    np.testing.assert_allclose(img, gold, atol=1e-9)
