#!/usr/bin/env python
"""Profiler trace of the large-scene shade stage; prints top ops.

Run: python scripts/tpu_profile_shade.py
"""
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices, permute_rays, tile_order
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import sphere_grid
from raytracebvh_tpu.pipeline import (
    _shade_rays_one,
    _traverse_ids,
    build_bvh,
    make_rays,
    shade_rays,
)

W, H = 1920, 1080
scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=40))
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=0)
wvp, wv = camera_matrices(cam, W, H)
bvh = jax.block_until_ready(jax.jit(
    lambda s: build_bvh(s, wvp, wv, cfg))(scene))
from raytracebvh_tpu.ops.traverse_hbm import pack_table_rank17
bvh = jax.block_until_ready(
    bvh.replace(hbm_table=jax.jit(pack_table_rank17)(bvh)))
perm, _ = tile_order(W, H, 16)
rays = permute_rays(make_rays(cam, cfg), jnp.asarray(perm))


@jax.jit
def f(b, r):
    color = _shade_rays_one(scene, b, r, cfg)
    return color.sum()


jax.block_until_ready(f(bvh, rays))  # compile+warm

tdir = "/tmp/jxtrace"
os.system(f"rm -rf {tdir}")
with jax.profiler.trace(tdir):
    for _ in range(3):
        jax.block_until_ready(f(bvh, rays))

# parse the trace.json.gz for TPU op events
files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
print("trace files:", files, flush=True)
tot = {}
for fn in files:
    with gzip.open(fn, "rt") as fh:
        data = json.load(fh)
    for ev in data.get("traceEvents", []):
        if ev.get("ph") != "X":
            continue
        pidname = ev.get("pid")
        name = ev.get("name", "")
        dur = ev.get("dur", 0)
        cat = ev.get("args", {}) or {}
        tot.setdefault(name, [0, 0])
        tot[name][0] += dur
        tot[name][1] += 1

top = sorted(tot.items(), key=lambda kv: -kv[1][0])[:40]
for name, (dur, cnt) in top:
    print(f"{dur/1e3:9.2f} ms  x{cnt:<5d} {name[:100]}", flush=True)
