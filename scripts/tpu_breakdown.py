"""One-shot TPU timing breakdown at 1080p on Image_Test.obj.

Times each layer of the frame separately so optimization targets the
right stage: build, pallas traversal, launch(+shade), full forward,
fwd+bwd.  Run on the real chip:  python scripts/tpu_breakdown.py
"""
import os, sys, time
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import jax, jax.numpy as jnp

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.models.inverse import init_params, loss_fn
from raytracebvh_tpu.pipeline import build_bvh, make_rays, render_frame, shade_rays
from raytracebvh_tpu.ops.traverse_pallas import traverse_pallas
from raytracebvh_tpu.utils.assets import find_asset

W, H, BOUNCES = 1920, 1080, 1
scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=BOUNCES)
R = W * H
RAYS = R * (1 + BOUNCES)

def timed(label, fn, *a, iters=5):
    t0 = time.time(); out = jax.block_until_ready(fn(*a)); tc = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*a))
    dt = (time.time() - t0) / iters
    print(f"{label:<24} compile {tc:7.1f}s   run {dt*1e3:9.2f} ms", flush=True)
    return out, dt

wvp, wv = camera_matrices(cam, W, H)
f_build = jax.jit(lambda s: build_bvh(s, wvp, wv, cfg))
bvh, t_build = timed("build", f_build, scene)
print(f"  -> {1.0/t_build:.0f} builds/sec", flush=True)

rays = make_rays(cam, cfg)
f_trav = jax.jit(lambda b, r: traverse_pallas(b, r, cfg.epsilon))
_, t_trav = timed("traverse(pallas) 2.07M", f_trav, bvh, rays)
print(f"  -> {R/t_trav/1e6:.1f} Mrays/s traversal-only", flush=True)

f_shade = jax.jit(lambda s, b, r: shade_rays(s, b, r, cfg))
_, t_shade = timed("launch+bounce (fwd)", f_shade, scene, bvh, rays)

f_fwd = jax.jit(lambda s, c: render_frame(s, c, cfg))
_, t_fwd = timed("full forward frame", f_fwd, scene, cam)
print(f"  -> {RAYS/t_fwd/1e6:.2f} Mrays/s fwd", flush=True)

params = init_params(scene)
target = jnp.zeros((H, W, 4), jnp.float32)
f_grad = jax.jit(jax.value_and_grad(lambda p: loss_fn(p, scene, cam, target, cfg)))
_, t_step = timed("fwd+bwd", f_grad, params, iters=3)
print(f"  -> {RAYS/t_step/1e6:.2f} Mrays/s fwd+bwd", flush=True)
