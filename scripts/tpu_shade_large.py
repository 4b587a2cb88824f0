#!/usr/bin/env python
"""In-stream shade-path breakdown at 102k tris / 1080p (VERDICT r4:
large fwd frame is 382 ms of which traversal is only ~69 — find where
the other ~310 ms goes).

Same marginal-scan method as tpu_shade_stages.py.
Run: python scripts/tpu_shade_large.py [subdiv]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices, permute_rays, tile_order
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import sphere_grid
from raytracebvh_tpu.ops import shade as shade_ops
from raytracebvh_tpu.ops.traverse_hbm import pack_table_rank17
from raytracebvh_tpu.pipeline import (
    _launch_soa,
    _shade_hit_soa,
    _split_rays,
    _traverse_ids,
    build_bvh,
    make_rays,
    shade_rays,
)

SUBDIV = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 40
W, H = 1920, 1080

scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=SUBDIV))
print(f"tris={scene.num_faces}", flush=True)
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=0, ray_tile=16)
wvp, wv = camera_matrices(cam, W, H)
bvh = jax.jit(lambda s: build_bvh(s, wvp, wv, cfg))(scene)
bvh = bvh.replace(
    hbm_table=jax.jit(lambda b: pack_table_rank17(b))(bvh))
bvh = jax.block_until_ready(bvh)
perm, _ = tile_order(W, H, 16)
rays = permute_rays(make_rays(cam, cfg), jnp.asarray(perm))
R = W * H
tex_quads = shade_ops.pack_texture_quads(scene.textures, scene.tex_hw)


def scan_k(digest, k):
    @jax.jit
    def f(b, r):
        def step(acc, dt):
            rr = r.replace(origin=r.origin + dt)
            return acc + digest(b, rr), None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0.0), jnp.linspace(0.0, 1e-6, k)
        )
        return acc
    return f


def marginal(name, digest, r=rays, k=3, iters=3):
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
    print(f"{name:<30} in-stream {m*1e3:8.2f} ms "
          f"({R/max(m,1e-9)/1e6:7.1f} Mray/s)", flush=True)
    return m


def d_trav(b, r):
    rec = _traverse_ids(b, r, cfg)
    return rec.distance.sum() + rec.leaf.astype(jnp.float32).sum()


def d_gather(b, r):
    rec = _traverse_ids(b, r, cfg)
    A = b.leaf_attrs[rec.leaf]  # the XLA row gather (pipeline xla path)
    return rec.distance.sum() + sum(A[:, k].sum() for k in range(0, 40, 7))


def d_shade(b, r):
    o3, d3 = _split_rays(r)
    rec = _traverse_ids(b, r, cfg)
    hit_loc, normal, color, shin, alpha, opt = _shade_hit_soa(
        scene, b, o3, d3, rec, tex_quads, None, cfg
    )
    return sum(c.sum() for c in color) + hit_loc[0].sum() + shin.sum()


def d_launch(b, r):
    o3, d3 = _split_rays(r)
    out = _launch_soa(scene, b, o3, d3, cfg, tex_quads)
    color, refl, inten, refr, ri = out
    return (sum(c.sum() for c in color) + refl[0][0].sum() + inten.sum()
            + ri.sum())


def d_frame(b, r):
    color = shade_rays(scene, b, r, cfg)
    return color.sum()


prev = 0.0
for name, digest in (
    ("traverse (hbm)", d_trav),
    ("+ 40ch XLA row gather", d_gather),
    ("+ full hit shade", d_shade),
    ("+ launch (spawns)", d_launch),
    ("frame (bounces=0)", d_frame),
):
    m = marginal(name, digest)
    print(f"    delta: {(m - prev)*1e3:+8.2f} ms", flush=True)
    prev = m
