"""Traversal vs brute force: the BVH must return true nearest hits."""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import Rays, scene_to_device
from raytracebvh_tpu.models.procedural import random_triangles
from raytracebvh_tpu.pipeline import build_bvh, _traverse_ids
from raytracebvh_tpu.ref import golden


@pytest.mark.parametrize("num_tris,seed", [(50, 0), (500, 1), (2000, 2)])
def test_random_scene_matches_brute_force(num_tris, seed):
    scene_h = random_triangles(num_tris, seed=seed)
    scene = scene_to_device(scene_h)
    cfg = RenderConfig(width=32, height=32, leaf_pad_multiple=256)
    cam = Camera.default()
    wvp, wv = camera_matrices(cam, cfg.width, cfg.height)
    bvh = build_bvh(scene, wvp, wv, cfg)

    rng = np.random.default_rng(seed + 100)
    nrays = 512
    origin = rng.uniform(-60, 60, (nrays, 3)).astype(np.float32)
    direction = rng.normal(size=(nrays, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    rays = Rays(origin=jnp.asarray(origin), direction=jnp.asarray(direction))

    rec = _traverse_ids(bvh, rays, cfg)
    hit = np.asarray(rec.hit)
    prim = np.asarray(bvh.prim)[np.asarray(rec.leaf)]
    dist = np.asarray(rec.distance)

    verts_t = np.asarray(scene_h.verts, np.float64) @ np.asarray(wvp)[
        :3, :3
    ].astype(np.float64) + np.asarray(wvp)[3, :3].astype(np.float64)
    tris = verts_t[scene_h.indices.reshape(-1, 3)]
    bhit, bt, bface = golden.nearest_hit(
        origin.astype(np.float64), direction.astype(np.float64), tris
    )

    assert (hit == bhit).mean() > 0.995  # f32-vs-f64 grazing-edge slack
    both = hit & bhit
    agree = prim[both] == bface[both]
    assert agree.mean() > 0.995
    np.testing.assert_allclose(dist[both][agree], bt[both][agree], rtol=1e-3)


def test_empty_padding_never_hit():
    """Padding leaves (prim == -1) must never be reported as hits."""
    scene_h = random_triangles(10, seed=3)  # pads 10 -> 256 leaves
    scene = scene_to_device(scene_h)
    cfg = RenderConfig(width=16, height=16)
    cam = Camera.default()
    wvp, wv = camera_matrices(cam, cfg.width, cfg.height)
    bvh = build_bvh(scene, wvp, wv, cfg)

    rng = np.random.default_rng(4)
    origin = rng.uniform(-100, 100, (256, 3)).astype(np.float32)
    direction = rng.normal(size=(256, 3)).astype(np.float32)
    direction /= np.linalg.norm(direction, axis=-1, keepdims=True)
    rec = _traverse_ids(
        bvh, Rays(origin=jnp.asarray(origin), direction=jnp.asarray(direction)), cfg
    )
    prim = np.asarray(bvh.prim)[np.asarray(rec.leaf)]
    assert np.all(prim[np.asarray(rec.hit)] >= 0)
