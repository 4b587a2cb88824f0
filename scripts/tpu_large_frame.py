#!/usr/bin/env python
"""Where do 382 ms of the standalone large-scene fwd frame go?

tpu_shade_large.py's in-stream marginal says the whole frame is ~100 ms
of device work; the standalone jit(render_frame) measures 382 ms.  Time
cumulative standalone prefixes to localize the rest.

Run: python scripts/tpu_large_frame.py [subdiv]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices, permute_rays, tile_order
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import sphere_grid
from raytracebvh_tpu.ops.traverse_hbm import pack_table_rank17
from raytracebvh_tpu.pipeline import (
    _launch_soa,
    _split_rays,
    _traverse_ids,
    build_bvh,
    make_rays,
    render_frame,
    shade_rays,
)

SUBDIV = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 40
W, H = 1920, 1080

scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=SUBDIV))
print(f"tris={scene.num_faces}", flush=True)
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=0, ray_tile=16)
wvp, wv = camera_matrices(cam, W, H)


def timed(name, f, *a, iters=3):
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<36} {dt*1e3:8.1f} ms", flush=True)
    return out


@jax.jit
def f_build(s):
    return build_bvh(s, wvp, wv, cfg)


@jax.jit
def f_build_pack(s):
    b = build_bvh(s, wvp, wv, cfg)
    return b.replace(hbm_table=pack_table_rank17(b))


@jax.jit
def f_rays(s):
    perm, inv = tile_order(W, H, 16)
    return permute_rays(make_rays(cam, cfg), jnp.asarray(perm))


@jax.jit
def f_to_traverse(s):
    b = f_build_pack.__wrapped__(s)
    r = f_rays.__wrapped__(s)
    rec = _traverse_ids(b, r, cfg)
    return rec.distance.sum() + rec.leaf.sum()


@jax.jit
def f_to_launch(s):
    b = f_build_pack.__wrapped__(s)
    r = f_rays.__wrapped__(s)
    o3, d3 = _split_rays(r)
    color, _, _, _, _ = _launch_soa(scene, b, o3, d3, cfg)
    return sum(c.sum() for c in color)


@jax.jit
def f_shade_rays(s):
    b = f_build_pack.__wrapped__(s)
    r = f_rays.__wrapped__(s)
    color = shade_rays(s, b, r, cfg)
    return color.sum()


@jax.jit
def f_frame(s):
    return render_frame(s, cam, cfg)


@jax.jit
def f_frame_sum(s):
    return render_frame(s, cam, cfg).sum()


timed("build", f_build, scene)
timed("build+pack", f_build_pack, scene)
timed("rays(perm)", f_rays, scene)
timed("build+pack+rays+traverse", f_to_traverse, scene)
timed("build+pack+rays+launch(color)", f_to_launch, scene)
timed("build+pack+rays+shade_rays", f_shade_rays, scene)
timed("render_frame (full image out)", f_frame, scene)
timed("render_frame.sum()", f_frame_sum, scene)
