#!/usr/bin/env python
"""Texture-sample strategies under REAL uv traffic (Image_Test, 1080p).

The bilinear sample is the dominant shade cost (+50 ms/pass,
tpu_shade_inner.py): one random gather of 64-byte rows over a 102 MB
quad table.  u8 quads (16 B rows, 26 MB) measured ~neutral -> the cost
is row-count x locality, not bytes.  Candidates:

  quad_f32   — shipping path (baseline)
  quad_u8    — 16 B rows, 26 MB table
  texel_i32  — u8 RGBA packed in ONE int32: raw 6.4 MB table, FOUR
               corner gathers + shift-unpack (working set 16x smaller)
  quad_sorted— f32 quads gathered in sorted-index order + unsort

Run: python scripts/tpu_tex_variants.py
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
from raytracebvh_tpu.ops import shade as shade_ops
from raytracebvh_tpu.pipeline import (
    _shade_hit_soa,
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

# real uv/tex_id traffic from the actual primary hits, computed once
o3, d3 = _split_rays(rays)


@jax.jit
def uv_of(b, r):
    rec = _traverse_ids(b, r, cfg)
    a = b.leaf_attrs[rec.leaf]
    from raytracebvh_tpu.ops.shade import barycentric_weights3
    t0 = (a[:, 0], a[:, 1], a[:, 2])
    t1 = (a[:, 3], a[:, 4], a[:, 5])
    t2 = (a[:, 6], a[:, 7], a[:, 8])
    t = jnp.where(rec.hit, rec.distance, 0.0)
    hit_loc = tuple(o3[i] + d3[i] * t for i in range(3))
    w0, w1, w2 = barycentric_weights3(t0, t1, t2, hit_loc)
    uvu = a[:, 18] * w0 + a[:, 20] * w1 + a[:, 22] * w2
    uvv = a[:, 19] * w0 + a[:, 21] * w1 + a[:, 23] * w2
    live = rec.hit
    return (jnp.where(live, uvu, 0.0), jnp.where(live, uvv, 0.0),
            a[:, 39].astype(jnp.int32))


uvu, uvv, tex_id = jax.block_until_ready(uv_of(bvh, rays))
print(f"live {int((tex_id >= 0).sum())} / {R}", flush=True)

tex_quads = jax.block_until_ready(jax.jit(
    shade_ops.pack_texture_quads)(scene.textures, scene.tex_hw))
quads_u8 = jax.block_until_ready(jax.jit(
    shade_ops.quantize_quads_u8)(tex_quads))
t_, hmax, wmax, _c = scene.textures.shape

# u8 RGBA in one int32 per texel
tex_u8 = np.asarray(
    jnp.round(jnp.clip(scene.textures, 0, 1) * 255).astype(jnp.uint32))
tex_i32 = jnp.asarray(
    (tex_u8[..., 0] | (tex_u8[..., 1] << 8) | (tex_u8[..., 2] << 16)
     | (tex_u8[..., 3] << 24)).astype(np.int32).reshape(t_ * hmax * wmax))
print(f"tables: quads_f32 {tex_quads.nbytes/1e6:.1f} MB, quads_u8 "
      f"{quads_u8.nbytes/1e6:.1f} MB, texel_i32 {tex_i32.nbytes/1e6:.1f} MB",
      flush=True)


def addr(u, v):
    tid = jnp.maximum(tex_id, 0)
    h = scene.tex_hw[tid, 0].astype(u.dtype)
    w = scene.tex_hw[tid, 1].astype(u.dtype)
    uu = u - jnp.floor(u)
    vv = v - jnp.floor(v)
    x = uu * w - 0.5
    y = vv * h - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    fx = x - x0
    fy = y - y0
    xi = x0.astype(jnp.int32)
    yi = y0.astype(jnp.int32)
    xi = jnp.where(xi < 0, xi + w.astype(jnp.int32), xi)
    yi = jnp.where(yi < 0, yi + h.astype(jnp.int32), yi)
    return tid, xi, yi, fx, fy, h.astype(jnp.int32), w.astype(jnp.int32)


def bilerp(q, fx, fy):
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    return [q[0][c] * w00 + q[1][c] * w10 + q[2][c] * w01 + q[3][c] * w11
            for c in range(4)]


def d_quad_f32(u, v):
    tex = shade_ops.sample_texture_quads(
        tex_quads, scene.tex_hw, tex_id, u, v, hmax, wmax)
    return sum(x.sum() for x in tex)


def d_quad_u8(u, v):
    tex = shade_ops.sample_texture_quads(
        quads_u8, scene.tex_hw, tex_id, u, v, hmax, wmax)
    return sum(x.sum() for x in tex)


def d_texel_i32(u, v):
    tid, xi, yi, fx, fy, h, w = addr(u, v)
    x1 = jnp.where(xi + 1 >= w, 0, xi + 1)
    y1 = jnp.where(yi + 1 >= h, 0, yi + 1)
    base = tid * (hmax * wmax)
    corners = []
    for yy, xx in ((yi, xi), (yi, x1), (y1, xi), (y1, x1)):
        p = tex_i32[base + yy * wmax + xx]
        pu = jax.lax.bitcast_convert_type(p, jnp.uint32)
        corners.append([
            ((pu >> (8 * c)) & 0xFF).astype(jnp.float32) / 255.0
            for c in range(4)
        ])
    tex = bilerp(corners, fx, fy)
    return sum(x.sum() for x in tex)


def d_quad_sorted(u, v):
    tid, xi, yi, fx, fy, h, w = addr(u, v)
    flat = (tid * hmax + yi) * wmax + xi
    order = jnp.argsort(flat)
    q = tex_quads[flat[order]]
    # inverse permutation scatter to restore ray order
    qb = jnp.zeros_like(q).at[order].set(q)
    w00 = (1 - fx) * (1 - fy)
    w10 = fx * (1 - fy)
    w01 = (1 - fx) * fy
    w11 = fx * fy
    out = 0.0
    for c in range(4):
        out += (qb[:, c] * w00 + qb[:, 4 + c] * w10 + qb[:, 8 + c] * w01
                + qb[:, 12 + c] * w11).sum()
    return out


def scan_k(digest, k):
    @jax.jit
    def f(u, v):
        def step(acc, dt):
            return acc + digest(u + dt, v + dt), None
        acc, _ = jax.lax.scan(
            step, jnp.float32(0.0), jnp.linspace(0.0, 1e-7, k))
        return acc
    return f


def marginal(name, digest, k=4, iters=3):
    f1, fk = scan_k(digest, 1), scan_k(digest, k)
    jax.block_until_ready(f1(uvu, uvv))
    jax.block_until_ready(fk(uvu, uvv))
    ts = []
    for f in (f1, fk):
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(f(uvu, uvv))
        ts.append((time.perf_counter() - t0) / iters)
    m = max((ts[1] - ts[0]) / (k - 1), 0.0)
    print(f"{name:<16} in-stream {m*1e3:8.2f} ms/pass", flush=True)
    return m


# value parity check (u8 quantization tolerance)
ref = jax.jit(lambda u, v: jnp.stack(shade_ops.sample_texture_quads(
    tex_quads, scene.tex_hw, tex_id, u, v, hmax, wmax)))(uvu, uvv)


def check(name, fn):
    tid, xi, yi, fx, fy, h, w = addr(uvu, uvv)
    if name == "texel_i32":
        x1 = jnp.where(xi + 1 >= w, 0, xi + 1)
        y1 = jnp.where(yi + 1 >= h, 0, yi + 1)
        base = tid * (hmax * wmax)
        corners = []
        for yy, xx in ((yi, xi), (yi, x1), (y1, xi), (y1, x1)):
            p = tex_i32[base + yy * wmax + xx]
            pu = jax.lax.bitcast_convert_type(p, jnp.uint32)
            corners.append([
                ((pu >> (8 * c)) & 0xFF).astype(jnp.float32) / 255.0
                for c in range(4)])
        tex = jnp.stack(bilerp(corners, fx, fy))
        has = tex_id >= 0
        tex = jnp.where(has[None, :], tex, 1.0)
        err = jnp.abs(tex - ref).max()
        print(f"  {name} max err vs f32 quads: {float(err):.5f}", flush=True)


check("texel_i32", None)

marginal("quad_f32", d_quad_f32)
marginal("quad_u8", d_quad_u8)
marginal("texel_i32", d_texel_i32)
marginal("quad_sorted", d_quad_sorted)
