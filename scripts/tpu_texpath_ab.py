#!/usr/bin/env python
"""Quick headline timing probe: fwd and fwd+bwd at 1080p on
Image_Test.obj (the bench's two hot configs, nothing else).

Round-4 A/B record (this script, on device): the round-3 morton-swizzled
texture quad table measured fwd 353.6 ms / fwd+bwd 309.5 ms vs row-major
170.1 / 207.5 — the swizzle lost end-to-end and was deleted.

Run: python scripts/tpu_texpath_ab.py
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
from raytracebvh_tpu.pipeline import render_frame
from raytracebvh_tpu.utils.assets import find_asset
from raytracebvh_tpu.io.obj import load_obj


def timed(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def main():
    scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
    width, height, bounces = 1920, 1080, 1
    cfg = RenderConfig(width=width, height=height, bounces=bounces)
    cam = Camera.default()
    rays = width * height * (1 + bounces)

    fwd = jax.jit(lambda s, c: render_frame(s, c, cfg))
    t_fwd = timed(fwd, scene, cam)
    params = init_params(scene)
    target = jnp.zeros((height, width, 4), jnp.float32)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, scene, cam, target, cfg)))
    t_gb = timed(grad_fn, params)
    print(f"fwd {t_fwd*1e3:7.1f} ms ({rays/t_fwd/1e6:5.2f} Mrays/s)   "
          f"fwd+bwd {t_gb*1e3:7.1f} ms ({rays/t_gb/1e6:5.2f} Mrays/s)",
          flush=True)


if __name__ == "__main__":
    main()
