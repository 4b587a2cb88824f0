"""On-chip bench + parity for the HBM windowed-sweep traversal at 102k tris.

Run:  python scripts/tpu_hbm.py [subdiv] [--full]
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
from raytracebvh_tpu.ops.traverse_hbm import traverse_hbm_pallas
from raytracebvh_tpu.pipeline import build_bvh, make_rays

SUBDIV = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 40
W, H = 1920, 1080

scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=SUBDIV))
print(f"scene: {scene.num_faces} tris", flush=True)
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=0)
wvp, wv = camera_matrices(cam, W, H)


def timed(label, fn, *a, iters=3):
    t0 = time.time()
    out = jax.block_until_ready(fn(*a))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*a))
    dt = (time.time() - t0) / iters
    print(f"{label:<30} compile {tc:7.1f}s   run {dt*1e3:9.2f} ms", flush=True)
    return out, dt


bvh, _ = timed("build", jax.jit(lambda s: build_bvh(s, wvp, wv, cfg)), scene)
rays = make_rays(cam, cfg)
R = W * H

for tile, br, win in ((0, 1024, 1024), (16, 1024, 1024), (16, 2048, 1024),
                      (16, 512, 1024), (16, 1024, 2048)):
    if tile:
        perm, _ = tile_order(W, H, tile)
        r = permute_rays(rays, jnp.asarray(perm))
    else:
        r = rays
    f = jax.jit(lambda b, rr, br=br, win=win: traverse_hbm_pallas(
        b, rr, cfg.epsilon, block_rays=br, win=win))
    rec, t = timed(f"hbm tile={tile} br={br} win={win}", f, bvh, r)
    print(f"  -> {R/t/1e6:.2f} Mrays/s   hits {int(np.asarray(rec.hit).sum())}",
          flush=True)

# parity vs the XLA walk on a strided subset
perm, _ = tile_order(W, H, 16)
r16 = permute_rays(rays, jnp.asarray(perm))
rec = jax.jit(lambda b, rr: traverse_hbm_pallas(b, rr, cfg.epsilon))(bvh, r16)
sub = jax.tree_util.tree_map(lambda x: x[::977][:2048], r16)
from raytracebvh_tpu.ops.traverse import traverse

rec_x, _ = timed("xla walk (2048 subset)", jax.jit(
    lambda b, rr: traverse(b, rr, cfg.epsilon)), bvh, sub, iters=1)
rec_s = jax.tree_util.tree_map(lambda x: x[::977][:2048], rec)
hx, hs = np.asarray(rec_x.hit), np.asarray(rec_s.hit)
assert (hx == hs).all(), f"hit mismatch {int((hx != hs).sum())}"
assert (np.asarray(rec_x.leaf)[hx] == np.asarray(rec_s.leaf)[hx]).all()
np.testing.assert_allclose(np.asarray(rec_s.distance)[hx],
                           np.asarray(rec_x.distance)[hx],
                           rtol=2e-5, atol=2e-5)
print("parity: hits/leaves equal, distances allclose", flush=True)

if "--full" in sys.argv:
    from raytracebvh_tpu.pipeline import render_frame

    cfg_f = cfg.replace(bounces=1, ray_tile=16, traversal_backend="hbm")
    f_fwd = jax.jit(lambda s, c: render_frame(s, c, cfg_f))
    _, t_fwd = timed("full fwd frame (1 bounce)", f_fwd, scene, cam)
    print(f"  -> {R*2/t_fwd/1e6:.2f} Mrays/s fwd", flush=True)
