#!/usr/bin/env python
"""Large-scene fwd+bwd vs ray_chunk size (pipeline path, tile order).

Run: python scripts/tpu_large_chunksweep.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.inverse import init_params, loss_fn
from raytracebvh_tpu.models.procedural import sphere_grid

W, H = 1920, 1080
R = W * H
scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=40))
cam = Camera.default()
target = jnp.zeros((H, W, 4), jnp.float32)
params = init_params(scene)


def timed(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


for c in (0, 25600, 51840, 129600, 259200):
    cfg = RenderConfig(width=W, height=H, bounces=0, ray_tile=16,
                       ray_chunk=c)
    try:
        f = jax.jit(jax.value_and_grad(
            lambda p, cfg=cfg: loss_fn(p, scene, cam, target, cfg)))
        t = timed(f, params)
        print(f"ray_chunk={c:7d}: fwd+bwd {t*1e3:8.1f} ms "
              f"({R/t/1e6:5.2f} Mrays/s)", flush=True)
    except Exception as e:
        print(f"ray_chunk={c:7d}: FAILED {type(e).__name__}: {str(e)[:200]}",
              flush=True)
