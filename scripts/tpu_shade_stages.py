"""In-stream breakdown of the 1080p headline frame's shading path.

CAVEAT (round 4): the standalone "tex sample" digest feeds the sampler
synthetic uv over the full frame; the shipping pipeline pins miss-lane
uv to texel 0, where the same gather costs ~8 ms (tpu_tex_variants.py).
Stage deltas between separately-jitted digests are also only
directional — XLA optimizes each digest globally (DCE differs), so
cross-check any conclusion with a dedicated A/B.

Same marginal-scan method as tpu_build_stages.py: K iterations of a
frame PREFIX inside one jitted scan; consecutive prefixes differ by one
stage.  Targets: where do the ~90 ms of non-traversal forward time go
(row gather, MT/barycentric math, texture sample, bounce pass), and does
tile-ordered ray coherence speed up the u16 traversal kernel.

Run: python scripts/tpu_shade_stages.py
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
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.ops import shade as shade_ops
from raytracebvh_tpu.pipeline import (
    _launch_soa,
    _shade_hit_soa,
    _split_rays,
    _traverse_ids,
    build_bvh,
    make_rays,
    shade_rays,
)
from raytracebvh_tpu.utils.assets import find_asset

W, H = 1920, 1080
scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=1)
wvp, wv = camera_matrices(cam, W, H)
bvh = jax.jit(lambda s: build_bvh(s, wvp, wv, cfg))(scene)
bvh = jax.block_until_ready(bvh)
rays = make_rays(cam, cfg)
R = W * H


def scan_k(digest, k):
    @jax.jit
    def f(b, r):
        def step(acc, dt):
            rr = r.replace(origin=r.origin + dt)  # fold-proof perturbation
            return acc + digest(b, rr), None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0.0), jnp.linspace(0.0, 1e-6, k)
        )
        return acc
    return f


def marginal(name, digest, r=rays, k=4, iters=3):
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
          f"({R/m/1e6:7.1f} Mray/s)", flush=True)
    return m


tex_quads = shade_ops.pack_texture_quads(scene.textures, scene.tex_hw)


def d_trav(b, r):
    rec = _traverse_ids(b, r, cfg)
    return rec.distance.sum() + rec.leaf.astype(jnp.float32).sum()


def d_gather(b, r):
    from raytracebvh_tpu.ops.gather_pallas import gather_rows

    rec = _traverse_ids(b, r, cfg)
    A = gather_rows(b.leaf_attrs.T, rec.leaf)
    return rec.distance.sum() + sum(A[k].sum() for k in range(0, 40, 7))


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


cfg_u8 = cfg.replace(texture_dtype="uint8")


def d_frame_u8(b, r):
    color = shade_rays(scene, b, r, cfg_u8)
    return color.sum()


def d_tex(b, r):
    # texture quad gather+bilerp alone, at frame scale (2.07M lookups)
    rec = _traverse_ids(b, r, cfg)
    uvu = jnp.abs(jnp.sin(rec.distance))  # data-dependent uv
    uvv = jnp.abs(jnp.cos(rec.distance))
    tid = jnp.where(rec.hit, 0, 0)
    hmax, wmax = scene.textures.shape[1], scene.textures.shape[2]
    tex = shade_ops.sample_texture_quads(
        tex_quads, scene.tex_hw, tid, uvu, uvv, hmax, wmax
    )
    return rec.distance.sum() + sum(t.sum() for t in tex)


perm, _ = tile_order(W, H, 16)
rays_t16 = permute_rays(rays, jnp.asarray(perm))

prev = 0.0
for name, digest in (
    ("traverse", d_trav),
    ("+ 40ch row gather", d_gather),
    ("tex sample (vs traverse)", d_tex),
    ("+ full hit shade", d_shade),
    ("+ launch (spawns)", d_launch),
    ("frame (launch+1 bounce)", d_frame),
):
    m = marginal(name, digest)
    print(f"    delta: {(m - prev)*1e3:+8.2f} ms", flush=True)
    prev = m

print("-- texture table variants --", flush=True)
marginal("frame u8 quads", d_frame_u8)

print("-- tile-16 ray order --", flush=True)
marginal("traverse tile16", d_trav, r=rays_t16)
marginal("frame tile16", d_frame, r=rays_t16)
