#!/usr/bin/env python
"""Texture table dtype A/B on the headline config (u8 = UNORM8, the
reference's own DevIL texture format — bit-exact for 8-bit sources).

fwd and fwd+bwd at 1080p on Image_Test.obj with ray_tile 0 vs 16.
Run: python scripts/tpu_headline_tile.py
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
    cam = Camera.default()
    rays = width * height * (1 + bounces)
    target = jnp.zeros((height, width, 4), jnp.float32)
    params = init_params(scene)

    for name, kw in (("f32", {}), ("u8", {"texture_dtype": "uint8"})):
        cfg = RenderConfig(width=width, height=height, bounces=bounces,
                           **kw)
        fwd = jax.jit(lambda s, c, cfg=cfg: render_frame(s, c, cfg))
        t_fwd = timed(fwd, scene, cam)
        grad_fn = jax.jit(jax.value_and_grad(
            lambda p, cfg=cfg: loss_fn(p, scene, cam, target, cfg)))
        t_gb = timed(grad_fn, params)
        cfg_sh = cfg.replace(bounces=0, enable_shadows=True)
        fwd_sh = jax.jit(lambda s, c, cfg=cfg_sh: render_frame(s, c, cfg))
        t_sh = timed(fwd_sh, scene, cam)
        print(f"{name:>4s}: fwd {t_fwd*1e3:7.1f} ms "
              f"({rays/t_fwd/1e6:5.2f} Mr/s)  fwd+bwd {t_gb*1e3:7.1f} ms "
              f"({rays/t_gb/1e6:5.2f} Mr/s)  shadows {t_sh*1e3:7.1f} ms",
              flush=True)


if __name__ == "__main__":
    main()
