#!/usr/bin/env python
"""Cost of the BOUNCE pass's traversal vs the primary pass.

Primary rays at 1080p traverse in 13.2 ms (tile-coherent lock-step);
reflected rays diverge, and miss lanes currently re-traverse with their
unchanged primary ray.  Measures: primary traversal, bounce-ray
traversal, bounce traversal with dead lanes parked at 1e30, and the hit
fraction.

Run: python scripts/tpu_bounce_cost.py
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
from raytracebvh_tpu.core.types import Rays, scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.pipeline import (
    _launch_soa,
    _split_rays,
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


@jax.jit
def spawn(b, r):
    o3, d3 = _split_rays(r)
    color, refl, inten, refr, ri = _launch_soa(scene, b, o3, d3, cfg)
    ro, rd = refl
    return (jnp.stack(ro, -1), jnp.stack(rd, -1), inten)


ro, rd, inten = jax.block_until_ready(spawn(bvh, rays))
live = np.asarray(inten) > 0.0
print(f"bounce live lanes: {live.sum()} / {R} ({100*live.mean():.1f}%)",
      flush=True)

rays_b = Rays(origin=ro, direction=rd)
# dead lanes parked far outside every AABB -> instant root miss
park = jnp.where(jnp.asarray(live)[:, None], ro, 1.0e30)
rays_p = Rays(origin=park, direction=rd)


def scan_k(digest, k):
    @jax.jit
    def f(b, r):
        def step(acc, dt):
            rr = r.replace(origin=r.origin + dt)
            return acc + digest(b, rr), None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0.0), jnp.linspace(0.0, 1e-6, k))
        return acc
    return f


def marginal(name, digest, r, k=4, iters=3):
    f1, fk = scan_k(digest, 1), scan_k(digest, k)
    jax.block_until_ready(f1(bvh, r))
    jax.block_until_ready(fk(bvh, r))
    ts = []
    for f in (f1, fk):
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(f(bvh, r))
        ts.append((time.perf_counter() - t0) / iters)
    m = max((ts[1] - ts[0]) / (k - 1), 0.0)
    print(f"{name:<28} in-stream {m*1e3:8.2f} ms", flush=True)
    return m


def d_trav(b, r):
    rec = _traverse_ids(b, r, cfg)
    return rec.distance.sum() + rec.leaf.astype(jnp.float32).sum()


marginal("traverse primary", d_trav, rays)
marginal("traverse bounce rays", d_trav, rays_b)
marginal("traverse bounce (parked)", d_trav, rays_p)
