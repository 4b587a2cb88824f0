"""Ray tile-ordering (cfg.ray_tile): a pure permutation of trace order.

Square pixel tiles keep a traversal lane-block's tree-path union tight —
the coherence analog of the reference's 15x15 threadgroup dispatch
(reference: Graphics.cpp:788-792).  The image must be bit-identical to
row-major tracing.
"""

import numpy as np

from raytracebvh_tpu import Camera, RenderConfig, render_frame_jit
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import random_triangles


def test_ray_tile_order_identical_image():
    scene = scene_to_device(random_triangles(150, seed=11, with_texture=True))
    cam = Camera.default()
    base = RenderConfig(width=48, height=32, bounces=1)
    img_row = np.asarray(render_frame_jit(scene, cam, base))
    img_tile = np.asarray(
        render_frame_jit(scene, cam, base.replace(ray_tile=16))
    )
    np.testing.assert_array_equal(img_tile, img_row)


def test_ray_tile_with_shadows_and_chunks():
    """Tile order composes with shadows and ray chunking."""
    scene = scene_to_device(random_triangles(100, seed=3, with_texture=True))
    cam = Camera.default()
    base = RenderConfig(width=32, height=32, bounces=1, enable_shadows=True)
    img_row = np.asarray(render_frame_jit(scene, cam, base))
    img_tile = np.asarray(render_frame_jit(
        scene, cam, base.replace(ray_tile=8, ray_chunk=256)
    ))
    np.testing.assert_array_equal(img_tile, img_row)


def test_tile_order_perm_inverse():
    from raytracebvh_tpu.camera import tile_order

    for w, h, t in ((48, 32, 16), (30, 20, 8), (17, 13, 16)):
        perm, inv = tile_order(w, h, t)
        assert np.array_equal(np.sort(perm), np.arange(w * h))
        assert np.array_equal(perm[inv], np.arange(w * h))


def test_structured_tile_matches_gather_order():
    """The reshape-based tile path must equal the gather permutation
    exactly (same tile-major visit order when th == tw == tile), and
    render identical images through render_frame for rectangular tiles."""
    import jax.numpy as jnp
    import numpy as np

    from raytracebvh_tpu.camera import (
        structured_tile_shape,
        tile_flat,
        tile_order,
        untile_flat,
    )

    w, h, t = 32, 32, 16
    st = structured_tile_shape(w, h, t)
    assert st == (16, 16)
    perm, inv = tile_order(w, h, t)
    x = np.arange(w * h, dtype=np.float32)
    got = np.asarray(tile_flat(jnp.asarray(x), w, h, *st))
    np.testing.assert_array_equal(got, x[perm])
    back = np.asarray(untile_flat(jnp.asarray(got), w, h, *st))
    np.testing.assert_array_equal(back, x)

    # rectangular fallback shape: height not divisible by 16
    assert structured_tile_shape(32, 24, 16) == (8, 16)
    got = np.asarray(tile_flat(jnp.asarray(
        np.arange(32 * 24, dtype=np.float32)), 32, 24, 8, 16))
    back = np.asarray(untile_flat(jnp.asarray(got), 32, 24, 8, 16))
    np.testing.assert_array_equal(back, np.arange(32 * 24, dtype=np.float32))


def test_structured_tile_render_identical():
    from raytracebvh_tpu import Camera, RenderConfig, render_frame_jit
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.models.procedural import random_triangles
    import numpy as np

    scene = scene_to_device(random_triangles(80, seed=3, with_texture=True))
    cam = Camera.default()
    # 24 rows: structured shape (8, 16) — the rectangular path
    base = RenderConfig(width=32, height=24, bounces=1, ortho_scale=0.2)
    a = np.asarray(render_frame_jit(scene, cam, base))
    b = np.asarray(render_frame_jit(scene, cam, base.replace(ray_tile=16)))
    np.testing.assert_allclose(a, b, atol=2e-5)


def test_ray_tile_col_order_identical():
    """'col' tile sequencing (square kernel-block footprints) is a pure
    permutation: images match 'row' and untiled bit-for-bit up to f32
    fusion noise."""
    import numpy as np

    from raytracebvh_tpu import Camera, RenderConfig, render_frame_jit
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.models.procedural import random_triangles

    scene = scene_to_device(random_triangles(120, seed=7,
                                             with_texture=True))
    cam = Camera.default()
    base = RenderConfig(width=32, height=32, bounces=1, ortho_scale=0.2,
                        ray_tile=16)
    a = np.asarray(render_frame_jit(scene, cam, base))
    b = np.asarray(render_frame_jit(
        scene, cam, base.replace(ray_tile_order="col")))
    np.testing.assert_array_equal(a, b)


def test_tile_flat_col_roundtrip():
    import jax.numpy as jnp
    import numpy as np

    from raytracebvh_tpu.camera import tile_flat, untile_flat

    W, H, th, tw = 48, 40, 8, 16
    x = jnp.arange(H * W, dtype=jnp.float32)
    for order in ("row", "col"):
        t = tile_flat(x, W, H, th, tw, order)
        u = untile_flat(t, W, H, th, tw, order)
        np.testing.assert_array_equal(np.asarray(u), np.asarray(x))
    # col order: the second tile is the one BELOW the first
    t = np.asarray(tile_flat(x, W, H, th, tw, "col"))
    assert t[0] == 0 and t[th * tw] == th * W
