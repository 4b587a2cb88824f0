#!/usr/bin/env python
"""Prototype: chunk-level empty culling of the shade path.

Image_Test at the reference camera hits only ~3k of 2M rays at 1080p;
the shade math runs on every lane anyway (~120 ms of the 144 ms
in-stream frame).  Chunked lax.map + scalar lax.cond skips shading for
all-miss chunks at real-branch cost — output is bit-identical (all-miss
chunks are pure background; spawns carry zero intensity).

Run: python scripts/tpu_cull_proto.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.pipeline import (
    _shade_rays_one,
    _traverse_ids,
    build_bvh,
    make_rays,
)
from raytracebvh_tpu.utils.assets import find_asset

W, H = 1920, 1080
R = W * H
scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=1)
wvp, wv = camera_matrices(cam, W, H)
bvh = jax.block_until_ready(jax.jit(
    lambda s: build_bvh(s, wvp, wv, cfg))(scene))
rays = make_rays(cam, cfg)


def frame_plain(b, r):
    return _shade_rays_one(scene, b, r, cfg)


def frame_culled(chunk):
    def f(b, r):
        nrays = r.origin.shape[0]
        nc = nrays // chunk
        tiles = jax.tree_util.tree_map(
            lambda x: x.reshape((nc, chunk) + x.shape[1:]), r)
        bg = jnp.broadcast_to(
            jnp.asarray(cfg.background, jnp.float32), (chunk, 4))

        def one(rt):
            rec = _traverse_ids(b, rt, cfg)
            return jax.lax.cond(
                jnp.any(rec.hit),
                lambda: _shade_rays_one(scene, b, rt, cfg),
                lambda: bg,
            )

        color = jax.lax.map(one, tiles)
        return color.reshape(nrays, 4)
    return f


def scan_k(digest, k):
    @jax.jit
    def f(b, r):
        def step(acc, dt):
            rr = r.replace(origin=r.origin + dt)
            return acc + digest(b, rr).sum(), None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0.0), jnp.linspace(0.0, 1e-6, k))
        return acc
    return f


def marginal(name, digest, k=4, iters=3):
    f1, fk = scan_k(digest, 1), scan_k(digest, k)
    jax.block_until_ready(f1(bvh, rays))
    jax.block_until_ready(fk(bvh, rays))
    ts = []
    for f in (f1, fk):
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(f(bvh, rays))
        ts.append((time.perf_counter() - t0) / iters)
    m = max((ts[1] - ts[0]) / (k - 1), 0.0)
    print(f"{name:<28} in-stream {m*1e3:8.2f} ms", flush=True)
    return m


# exact-output check first
a = np.asarray(jax.jit(frame_plain)(bvh, rays))
for chunk in (12800,):
    b = np.asarray(jax.jit(frame_culled(chunk))(bvh, rays))
    err = np.abs(a - b).max()
    print(f"cull chunk={chunk}: max |diff| = {err:.2e}", flush=True)

marginal("frame plain", frame_plain)
for chunk in (3200, 6400, 12800, 25600):
    marginal(f"frame culled c={chunk}", frame_culled(chunk))
