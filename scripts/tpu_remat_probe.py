#!/usr/bin/env python
"""Does per-chunk remat speed the chunked fwd+bwd?

Headline fwd+bwd is 140 ms of which forward is only 46 — the backward
loads per-chunk residual stacks.  jax.checkpoint on the per-chunk shade
makes the backward recompute each (culled!) chunk instead.

Run: python scripts/tpu_remat_probe.py
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
from raytracebvh_tpu.models.inverse import apply_params, init_params
from raytracebvh_tpu.models.procedural import sphere_grid
from raytracebvh_tpu.pipeline import (
    _shade_rays_one,
    _traverse_ids,
    build_bvh,
    make_rays,
    shade_rays,
)
from raytracebvh_tpu.utils.assets import find_asset

W, H = 1920, 1080
R = W * H


def timed(fn, *args, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*args))
    return (time.perf_counter() - t0) / iters


def chunked_loss(scene, cam, cfg, chunk, remat):
    wvp, wv = camera_matrices(cam, W, H)
    target = jnp.zeros((R, 4), jnp.float32)

    def loss(p):
        s = apply_params(p, scene)
        bvh = build_bvh(s, wvp, wv, cfg)
        if (bvh.hbm_table is None and 2 * bvh.n_leaves >= 0xFFFF):
            from raytracebvh_tpu.ops.traverse_hbm import pack_table_rank17
            bvh = bvh.replace(
                hbm_table=jax.lax.stop_gradient(pack_table_rank17(bvh)))
        rays = make_rays(cam, cfg)
        tiles = jax.tree_util.tree_map(
            lambda x: x.reshape((R // chunk, chunk) + x.shape[1:]), rays)
        bg = jnp.broadcast_to(
            jnp.asarray(cfg.background, jnp.float32), (chunk, 4))

        shade = _shade_rays_one
        if remat:
            shade = jax.checkpoint(
                lambda s_, b_, r_, rec_: _shade_rays_one(
                    s_, b_, r_, cfg, None, rec_),
                static_argnums=())

        def one(r):
            rec = _traverse_ids(bvh, r, cfg)
            if remat:
                return jax.lax.cond(
                    jnp.any(rec.hit),
                    lambda: shade(s, bvh, r, rec),
                    lambda: bg)
            return jax.lax.cond(
                jnp.any(rec.hit),
                lambda: _shade_rays_one(s, bvh, r, cfg, None, rec),
                lambda: bg)

        color = jax.lax.map(one, tiles)
        return jnp.mean((color.reshape(R, 4) - target) ** 2)

    return loss


def run(name, scene, cfg, chunk, remat):
    cam = Camera.default()
    params = init_params(scene)
    f = jax.jit(jax.value_and_grad(
        chunked_loss(scene, cam, cfg, chunk, remat)))
    t = timed(f, params)
    print(f"{name:<36} fwd+bwd {t*1e3:8.1f} ms ({R*(1+cfg.bounces)/t/1e6:5.2f}"
          f" Mrays/s eq)", flush=True)


scene_s = scene_to_device(load_obj(find_asset("Image_Test.obj")))
cfg_s = RenderConfig(width=W, height=H, bounces=1)
run("small plain  c=25600", scene_s, cfg_s, 25600, False)
run("small remat  c=25600", scene_s, cfg_s, 25600, True)

scene_l = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=40))
cfg_l = RenderConfig(width=W, height=H, bounces=0, ray_tile=16)
run("large plain  c=25600", scene_l, cfg_l, 25600, False)
run("large remat  c=25600", scene_l, cfg_l, 25600, True)
