"""Sub-breakdown of _shade_hit_soa at 1080p.

CAVEAT (round 4): the "+ texture sample" stage here feeds the sampler
UNPINNED uv — miss lanes carry garbage barycentric uv and random-walk
the ~100 MB quad table, inflating that stage to ~50 ms.  The PIPELINE
pins miss-lane uv to texel 0 (_shade_hit_soa), where the same gather
measures ~8 ms (scripts/tpu_tex_variants.py).  Treat the tex number as
the un-pinned worst case, not the shipping cost.

Run: python scripts/tpu_shade_inner.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.ops import shade as shade_ops
from raytracebvh_tpu.ops.gather_pallas import gather_rows
from raytracebvh_tpu.pipeline import (
    _split_rays,
    _traverse_ids,
    build_bvh,
    make_rays,
)
from raytracebvh_tpu.utils.assets import find_asset

W, H = 1920, 1080
scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=1)
wvp, wv = camera_matrices(cam, W, H)
bvh = jax.block_until_ready(jax.jit(lambda s: build_bvh(s, wvp, wv, cfg))(scene))
rays = make_rays(cam, cfg)
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
    print(f"{name:<30} in-stream {m*1e3:8.2f} ms", flush=True)
    return m


def shade_prefix(depth):
    def digest(b, r):
        o3, d3 = _split_rays(r)
        rec = _traverse_ids(b, r, cfg)
        A = gather_rows(b.leaf_attrs.T, rec.leaf)
        a = lambda k: A[k]
        t0 = (a(0), a(1), a(2))
        t1 = (a(3), a(4), a(5))
        t2 = (a(6), a(7), a(8))
        acc = rec.distance.sum()
        if depth == 0:
            return acc + sum(x.sum() for x in t0 + t1 + t2)
        e1 = shade_ops.sub3(t1, t0)
        e2 = shade_ops.sub3(t2, t0)
        p = shade_ops.cross3(d3, e2)
        det = shade_ops.dot3(e1, p)
        det_ok = jnp.abs(det) >= 1e-12
        inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        tv = shade_ops.sub3(o3, t0)
        u = shade_ops.dot3(tv, p) * inv_det
        q = shade_ops.cross3(tv, e1)
        v = shade_ops.dot3(d3, q) * inv_det
        t = shade_ops.dot3(e2, q) * inv_det
        ok = (det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0)
              & (u + v <= 1.0) & (t > 1e-12))
        t = jnp.where(ok, t, -1.0)
        t = jnp.where(rec.hit, t, 0.0)
        hit_loc = tuple(o3[i] + d3[i] * t for i in range(3))
        if depth == 1:
            return acc + sum(x.sum() for x in hit_loc)
        w0, w1, w2 = shade_ops.barycentric_weights3(t0, t1, t2, hit_loc)
        if depth == 2:
            return acc + w0.sum() + w1.sum() + w2.sum()
        n0 = (a(9), a(10), a(11))
        n1 = (a(12), a(13), a(14))
        n2 = (a(15), a(16), a(17))
        normal = tuple(
            n0[i] * w0 + n1[i] * w1 + n2[i] * w2 for i in range(3)
        )
        uvu = a(18) * w0 + a(20) * w1 + a(22) * w2
        uvv = a(19) * w0 + a(21) * w1 + a(23) * w2
        if depth == 3:
            return acc + sum(x.sum() for x in normal) + uvu.sum() + uvv.sum()
        tex_id = a(39).astype(jnp.int32)
        hmax, wmax = scene.textures.shape[1], scene.textures.shape[2]
        tex = shade_ops.sample_texture_quads(
            tex_quads, scene.tex_hw, tex_id, uvu, uvv, hmax, wmax
        )
        if depth == 4:
            return acc + sum(x.sum() for x in tex)
        color = tuple(
            jnp.clip(a(24 + c) + a(28 + c) * tex[c], 0.0, 1.0) * a(32 + c)
            for c in range(4)
        )
        return acc + sum(c.sum() for c in color)
    return digest


prev = 0.0
for depth, name in (
    (0, "trav + gather + corners"),
    (1, "+ MT distance recompute"),
    (2, "+ barycentric weights"),
    (3, "+ normal/uv interp"),
    (4, "+ texture sample"),
    (5, "+ color combine"),
):
    m = marginal(name, shade_prefix(depth))
    print(f"    delta: {(m - prev)*1e3:+8.2f} ms", flush=True)
    prev = m
