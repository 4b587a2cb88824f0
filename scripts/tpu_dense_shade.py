"""Round-5: decompose the dense-frame launch-shade pass (64 ms of the
157 ms hbm-backend frame — scripts/tpu_dense_sweep.py stages hbm).

Cumulative in-stream stages on top of build+traversal; the delta between
consecutive rows isolates each component.

Run on the chip: python scripts/tpu_dense_shade.py

NB timing caveat (round-5 metrology): the block_until_ready timed() here
reads enqueue time + backpressure on the tunneled chip; it is stable and
comparable WITHIN one run (the sweeps pick winners by large deltas), but
carries a ~25-40 ms constant — scripts/bench_util.timed_drain is the
bias-free method and was used to confirm every decision this script's
numbers motivated.
"""

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.ops import shade as shade_ops
from raytracebvh_tpu.pipeline import (
    _frame_tex_quads,
    _split_rays,
    _traverse_ids,
    build_bvh,
    make_rays,
)
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.utils.assets import find_asset

W, H = 1920, 1080
SCALE = 256.0


def timed(fn, *a, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / iters


def main():
    scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
    cam = Camera.default()
    cfg = RenderConfig(width=W, height=H, ortho_scale=SCALE,
                       traversal_backend="hbm")
    wvp, wv = camera_matrices(cam, W, H)

    def upto(stage):
        def f(s):
            bvh = build_bvh(s, wvp, wv, cfg)
            rays = make_rays(cam, cfg)
            o3, d3 = _split_rays(rays)
            rec = _traverse_ids(bvh, rays, cfg)
            acc = rec.distance.sum() + rec.leaf.sum()
            if stage == "trav":
                return acc
            from raytracebvh_tpu.ops.gather_pallas import gather_rows

            A = gather_rows(bvh.leaf_attrs.T, rec.leaf)
            a = lambda k: A[k]
            if stage == "gather":
                return acc + sum(A[k].sum() for k in range(40))
            t0 = (a(0), a(1), a(2))
            t1 = (a(3), a(4), a(5))
            t2 = (a(6), a(7), a(8))
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
            t = jnp.where(ok & rec.hit, t, 0.0)
            hit_loc = tuple(o3[i] + d3[i] * t for i in range(3))
            w0, w1, w2 = shade_ops.barycentric_weights3(t0, t1, t2, hit_loc)
            if stage == "mt":
                return acc + t.sum() + w0.sum() + w1.sum() + w2.sum()
            uvu = a(18) * w0 + a(20) * w1 + a(22) * w2
            uvv = a(19) * w0 + a(21) * w1 + a(23) * w2
            live = rec.hit
            uvu = jnp.where(live, uvu, 0.0)
            uvv = jnp.where(live, uvv, 0.0)
            tex_quads = _frame_tex_quads(s, cfg)
            tex_id = a(39).astype(jnp.int32)
            hmax, wmax = s.textures.shape[1], s.textures.shape[2]
            tex = shade_ops.sample_texture_quads(
                tex_quads, s.tex_hw, tex_id, uvu, uvv, hmax, wmax)
            if stage == "tex":
                return acc + sum(tex[c].sum() for c in range(4))
            color = tuple(
                jnp.clip(a(24 + c) + a(28 + c) * tex[c], 0.0, 1.0)
                * a(32 + c) for c in range(4))
            n0 = (a(9), a(10), a(11))
            n1 = (a(12), a(13), a(14))
            n2 = (a(15), a(16), a(17))
            normal = tuple(
                n0[i] * w0 + n1[i] * w1 + n2[i] * w2 for i in range(3))
            refl = shade_ops.normalize3(shade_ops.reflect3(d3, normal))
            return acc + sum(c.sum() for c in color) + sum(
                r.sum() for r in refl)
        return f

    prev = None
    for stage in ["trav", "gather", "mt", "tex", "full"]:
        t = timed(jax.jit(upto(stage)), scene)
        d = "" if prev is None else f"  (+{(t - prev)*1e3:.1f} ms)"
        print(f"upto {stage:8s}: {t*1e3:7.1f} ms{d}", flush=True)
        prev = t


if __name__ == "__main__":
    main()
