"""UNORM8 texture path (cfg.texture_dtype='uint8', the default).

For 8-bit-sourced textures (every texture the reference ships) the u8
quad table is bit-exact with the float path; for synthetic float
textures it quantizes to the nearest 1/255 — matching what a real
DirectX UNORM8 texture would store anyway.
"""

import jax
import numpy as np
import pytest

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.models.procedural import random_triangles
from raytracebvh_tpu.pipeline import render_frame
from raytracebvh_tpu.utils.assets import find_asset


def _render(scene, tex_dtype):
    cfg = RenderConfig(width=48, height=48, bounces=1,
                       texture_dtype=tex_dtype)
    return np.asarray(jax.jit(
        lambda s, c: render_frame(s, c, cfg)
    )(scene, Camera.default()))


def test_u8_exact_for_8bit_sources():
    obj = find_asset("Rect.obj")
    if obj is None:
        pytest.skip("reference assets not mounted")
    scene = scene_to_device(load_obj(obj))
    img8 = _render(scene, "uint8")
    img32 = _render(scene, "float32")
    np.testing.assert_allclose(img8, img32, atol=1e-6)


def test_u8_close_for_float_textures():
    scene = scene_to_device(random_triangles(
        300, seed=7, extent=4.0, tri_size=1.5, with_texture=True))
    img8 = _render(scene, "uint8")
    img32 = _render(scene, "float32")
    # quantization error bounded by diffuse * (0.5/255)
    assert np.abs(img8 - img32).max() <= 1.0 / 255.0 + 1e-6
