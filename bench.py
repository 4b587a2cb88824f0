#!/usr/bin/env python
"""Headline benchmark: rays/sec/chip (fwd+bwd) at 1080p on Image_Test.obj.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The reference publishes no numbers (BASELINE.md: only a runtime FPS print,
Graphics.cpp:65-92), so the baseline is self-established per BASELINE.json:
the metric is traced rays per second per chip for a full frame that
rebuilds the LBVH from scratch, traces primary rays + one reflection
bounce, and runs the backward pass producing vertex/material gradients.
Secondary metrics (BVH builds/sec, forward-only rays/sec) go to stderr.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 20.0e6  # self-established round-1 target (see BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from raytracebvh_tpu import Camera, RenderConfig
    from raytracebvh_tpu.camera import camera_matrices, orbit
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.models.inverse import apply_params, init_params, loss_fn
    from raytracebvh_tpu.pipeline import build_bvh, render_frame
    from raytracebvh_tpu.utils.assets import find_asset

    path = find_asset("Image_Test.obj")
    if path is not None:
        from raytracebvh_tpu.io.obj import load_obj

        scene_h = load_obj(path)
    else:
        from raytracebvh_tpu.models.procedural import sphere_grid

        scene_h = sphere_grid(nx=4, ny=3, subdiv=8)  # ~3k tris
    scene = scene_to_device(scene_h)

    width, height, bounces = 1920, 1080, 1
    cfg = RenderConfig(
        width=width,
        height=height,
        bounces=bounces,
        # traversal_backend="auto" -> pallas megakernel on TPU;
        # traversal_chunk only matters for the jnp fallback path
        traversal_chunk=129600,  # 1920*1080 / 16
    )
    cam = Camera.default()
    rays_per_frame = width * height * (1 + bounces)

    def timed(fn, *args, warmup=1, iters=3):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fn(*args))
        return (time.perf_counter() - t0) / iters

    # ---- BVH builds/sec (full morton+sort+karras+fit+links rebuild)
    @jax.jit
    def build_fn(scene, cam):
        wvp, wv = camera_matrices(cam, width, height)
        return build_bvh(scene, wvp, wv, cfg)

    t_build = timed(build_fn, scene, cam, warmup=1, iters=10)
    print(f"# bvh_build: {t_build*1e3:.3f} ms -> {1.0/t_build:.1f} builds/sec "
          f"({scene_h.num_faces} tris)", file=sys.stderr)

    # ---- forward-only frame
    fwd = jax.jit(lambda s, c: render_frame(s, c, cfg))
    t_fwd = timed(fwd, scene, cam, warmup=1, iters=3)
    print(f"# forward frame: {t_fwd*1e3:.1f} ms -> "
          f"{rays_per_frame/t_fwd/1e6:.2f} Mrays/s", file=sys.stderr)

    # ---- fwd+bwd (the headline): gradient of the image loss w.r.t.
    # vertex offsets + material colors
    params = init_params(scene)
    target = jnp.zeros((height, width, 4), jnp.float32)
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, scene, cam, target, cfg)
    ))
    t_step = timed(grad_fn, params, warmup=1, iters=3)
    rays_per_sec = rays_per_frame / t_step
    print(f"# fwd+bwd frame: {t_step*1e3:.1f} ms -> "
          f"{rays_per_sec/1e6:.2f} Mrays/s", file=sys.stderr)

    print(json.dumps({
        "metric": "rays_per_sec_fwd_bwd_1080p_image_test",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
