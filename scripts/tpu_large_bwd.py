#!/usr/bin/env python
"""Large-scene (102 400 tris) fwd+bwd probe at 1080p on device.

BASELINE config 5 has zero backward evidence (VERDICT r3 item 2); this
measures it: grads w.r.t. vertex offsets + materials through the HBM
windowed-sweep traversal (stop-grad ids) + XLA shade gather, at several
ray_chunk settings.

Run: python scripts/tpu_large_bwd.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.inverse import init_params, loss_fn
from raytracebvh_tpu.models.procedural import sphere_grid


def timed(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=40))
    print(f"tris={scene.num_faces}", flush=True)
    cam = Camera.default()
    width, height = 1920, 1080
    rays = width * height
    target = jnp.zeros((height, width, 4), jnp.float32)
    params = init_params(scene)

    for chunk in (0, 259200):
        cfg = RenderConfig(width=width, height=height, bounces=0,
                           ray_tile=16, ray_chunk=chunk)
        try:
            grad_fn = jax.jit(jax.value_and_grad(
                lambda p: loss_fn(p, scene, cam, target, cfg)))
            t = timed(grad_fn, params)
            loss, g = grad_fn(params)
            gv = np.asarray(g.vert_offsets)
            finite = np.isfinite(gv).all()
            print(f"ray_chunk={chunk:7d}: fwd+bwd {t*1e3:7.1f} ms "
                  f"({rays/t/1e6:5.2f} Mrays/s) loss={float(loss):.5f} "
                  f"|g_verts|={np.abs(gv).sum():.4g} finite={finite}",
                  flush=True)
        except Exception as e:
            print(f"ray_chunk={chunk:7d}: FAILED {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
