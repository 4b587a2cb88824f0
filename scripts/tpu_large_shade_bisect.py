"""Round-5: drain-timed bisect of the large-scene (102k tris) b0 frame.

The frame is ~152 ms drain-marginal: build ~15, traversal ~64 — what is
the remaining ~70 ms?  Each variant rebuilds the frame from pipeline
parts, adding one component at a time (all variants return a [H*W]-sized
array so the drain fetch forces completion).

Run on the chip: python scripts/tpu_large_shade_bisect.py
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, ".")

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import (camera_matrices, orbit,
                                    structured_tile_shape, tile_rays,
                                    untile_flat)
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import sphere_grid
from raytracebvh_tpu.ops import shade as shade_ops
from raytracebvh_tpu.ops.gather_hbm import gather_rows_hbm
from raytracebvh_tpu.pipeline import (_frame_tex_quads, _split_rays,
                                      _traverse_ids, build_bvh, make_rays)

W, H = 1920, 1080
CFG = RenderConfig(width=W, height=H, bounces=0, ray_tile=16, ray_chunk=0,
                   traversal_backend="hbm")


def drain_marginal(f, scene, cams, k0):
    np.asarray(f(scene, cams[k0])[0])
    def run(ks):
        out = None
        t0 = time.perf_counter()
        for k in ks:
            out = f(scene, cams[k])
        np.asarray(out[0])
        return time.perf_counter() - t0
    t1 = run(range(k0 + 1, k0 + 4))
    t2 = run(range(k0 + 4, k0 + 13))
    return (t2 - t1) / 6.0


def make_variant(stage):
    def f(scene, cam):
        wvp, wv = camera_matrices(cam, W, H)
        bvh = build_bvh(scene, wvp, wv, CFG)
        rays = make_rays(cam, CFG)
        th, tw = structured_tile_shape(W, H, 16)
        rays = tile_rays(rays, W, H, th, tw)
        o3, d3 = _split_rays(rays)
        rec = _traverse_ids(bvh, rays, CFG)
        if stage == "trav":
            return rec.distance
        A = gather_rows_hbm(bvh.leaf_attrs, rec.leaf)
        a = lambda k: A[k]
        if stage == "gather":
            return sum(A[k] for k in range(40))
        t0 = (a(0), a(1), a(2))
        t1_ = (a(3), a(4), a(5))
        t2_ = (a(6), a(7), a(8))
        e1 = shade_ops.sub3(t1_, t0)
        e2 = shade_ops.sub3(t2_, t0)
        p = shade_ops.cross3(d3, e2)
        det = shade_ops.dot3(e1, p)
        det_ok = jnp.abs(det) >= 1e-12
        inv = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
        tv = shade_ops.sub3(o3, t0)
        u = shade_ops.dot3(tv, p) * inv
        q = shade_ops.cross3(tv, e1)
        v = shade_ops.dot3(d3, q) * inv
        t = shade_ops.dot3(e2, q) * inv
        ok = (det_ok & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
              & (t > 1e-12))
        t = jnp.where(ok & rec.hit, t, 0.0)
        hl = tuple(o3[i] + d3[i] * t for i in range(3))
        if stage == "mt":
            return t + hl[0]
        w0, w1, w2 = shade_ops.barycentric_weights3(t0, t1_, t2_, hl)
        if stage == "bary":
            return w0 + w1 + w2
        uvu = a(18) * w0 + a(20) * w1 + a(22) * w2
        uvv = a(19) * w0 + a(21) * w1 + a(23) * w2
        uvu = jnp.where(rec.hit, uvu, 0.0)
        uvv = jnp.where(rec.hit, uvv, 0.0)
        tq = _frame_tex_quads(scene, CFG)
        tex_id = a(39).astype(jnp.int32)
        tex = shade_ops.sample_texture_quads(
            tq, scene.tex_hw, tex_id, uvu, uvv,
            scene.textures.shape[1], scene.textures.shape[2])
        if stage == "tex":
            return sum(tex[c] for c in range(4))
        color = tuple(
            jnp.clip(a(24 + c) + a(28 + c) * tex[c], 0, 1) * a(32 + c)
            for c in range(4))
        color = tuple(
            jnp.where(rec.hit, color[c], CFG.background[c])
            for c in range(4))
        if stage == "color":
            return sum(color)
        # spawn math (launch computes these even at bounces=0)
        n0 = (a(9), a(10), a(11))
        n1 = (a(12), a(13), a(14))
        n2 = (a(15), a(16), a(17))
        normal = tuple(n0[i] * w0 + n1[i] * w1 + n2[i] * w2
                       for i in range(3))
        refl = shade_ops.normalize3(shade_ops.reflect3(d3, normal))
        refr = shade_ops.refract3(d3, normal, a(37))
        if stage == "spawn":
            return sum(color) + refl[0] + refr[0]
        # untile + [H, W, 4] assemble
        img = jnp.stack(
            [untile_flat(color[c], W, H, th, tw) for c in range(4)], -1
        ).reshape(H, W, 4)
        return img.reshape(-1)
    return f


def main():
    scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=40))
    cams = [Camera.default()]
    for _ in range(14 * 9):
        cams.append(orbit(cams[-1], 0.0003, 0.0))
    prev = None
    k0 = 0
    for stage in ["trav", "gather", "mt", "bary", "tex", "color",
                  "spawn", "full"]:
        f = jax.jit(make_variant(stage))
        m = drain_marginal(f, scene, cams, k0)
        k0 += 13
        d = "" if prev is None else f"  (+{(m - prev)*1e3:.1f})"
        print(f"{stage:7s}: {m*1e3:7.1f} ms{d}", flush=True)
        prev = m


if __name__ == "__main__":
    main()
