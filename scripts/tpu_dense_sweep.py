"""Round-5: dense-frame (ortho_scale=256, 71.5% hit) config sweep + stage
breakdown at 1080p on Image_Test.obj.

The sparse headline's levers (chunk culling) buy ~nothing here; this probe
finds what does: ray_chunk size (incl. unchunked), ray_tile coherence,
remat, and a stage decomposition of the fwd frame.

Run on the chip: python scripts/tpu_dense_sweep.py [fwd|bwd|stages]

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
from raytracebvh_tpu.models.inverse import init_params, loss_fn
from raytracebvh_tpu.pipeline import render_frame
from raytracebvh_tpu.utils.assets import find_asset

W, H, B = 1920, 1080, 1
SCALE = 256.0


def timed(fn, *a, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / iters


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
    scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
    cam = Camera.default()
    rays = W * H * (1 + B)
    base = RenderConfig(width=W, height=H, bounces=B, ortho_scale=SCALE)

    if which == "fwd":
        for tag, cfg in [
            ("chunk25600+cull", base.replace(ray_chunk=25600)),
            ("chunk25600", base.replace(ray_chunk=25600,
                                        cull_empty_chunks=False)),
            ("chunk51840", base.replace(ray_chunk=51840,
                                        cull_empty_chunks=False)),
            ("chunk129600", base.replace(ray_chunk=129600,
                                         cull_empty_chunks=False)),
            ("chunk259200", base.replace(ray_chunk=259200,
                                         cull_empty_chunks=False)),
            ("unchunked", base),
            ("unchunked+tile16", base.replace(ray_tile=16)),
            ("chunk51840+tile16", base.replace(
                ray_chunk=51840, ray_tile=16, cull_empty_chunks=False)),
            ("unchunked+hbm", base.replace(traversal_backend="hbm")),
            ("unchunked+tile16+hbm", base.replace(
                ray_tile=16, traversal_backend="hbm")),
            ("chunk51840+hbm", base.replace(
                ray_chunk=51840, cull_empty_chunks=False,
                traversal_backend="hbm")),
        ]:
            f = jax.jit(lambda s, c, cfg=cfg: render_frame(s, c, cfg))
            t = timed(f, scene, cam)
            print(f"fwd {tag:22s}: {t*1e3:7.1f} ms  "
                  f"{rays/t/1e6:6.2f} Mrays/s", flush=True)
    elif which == "bwd":
        params = init_params(scene)
        target = jnp.zeros((H, W, 4), jnp.float32)
        for tag, cfg in [
            ("chunk25600+cull", base.replace(ray_chunk=25600)),
            ("chunk25600+hbm", base.replace(
                ray_chunk=25600, cull_empty_chunks=False,
                traversal_backend="hbm")),
            ("chunk51840+hbm", base.replace(
                ray_chunk=51840, cull_empty_chunks=False,
                traversal_backend="hbm")),
            ("chunk129600+hbm", base.replace(
                ray_chunk=129600, cull_empty_chunks=False,
                traversal_backend="hbm")),
            ("unchunked+hbm", base.replace(traversal_backend="hbm")),
            ("chunk25600+cull+hbm", base.replace(
                ray_chunk=25600, traversal_backend="hbm")),
        ]:
            g = jax.jit(jax.value_and_grad(
                lambda p, cfg=cfg: loss_fn(p, scene, cam, target, cfg)))
            try:
                t = timed(g, params)
                print(f"fwd+bwd {tag:22s}: {t*1e3:7.1f} ms  "
                      f"{rays/t/1e6:6.2f} Mrays/s", flush=True)
            except Exception as e:
                print(f"fwd+bwd {tag:22s}: FAILED {type(e).__name__}",
                      flush=True)
    elif which == "stages":
        # in-stream stage decomposition of the unchunked dense fwd frame
        from raytracebvh_tpu.camera import camera_matrices
        from raytracebvh_tpu.pipeline import (
            _frame_tex_quads,
            _launch_soa,
            _shade_rays_one,
            _split_rays,
            _traverse_ids,
            build_bvh,
            make_rays,
        )

        cfg = base
        if len(sys.argv) > 2:  # e.g. "stages hbm"
            cfg = cfg.replace(traversal_backend=sys.argv[2])
        wvp, wv = camera_matrices(cam, W, H)

        def f_build(s):
            b = build_bvh(s, wvp, wv, cfg)
            return b.bbmin.sum() + b.skip_link.sum()

        def f_trav(s):
            b = build_bvh(s, wvp, wv, cfg)
            r = make_rays(cam, cfg)
            rec = _traverse_ids(b, r, cfg)
            return rec.distance.sum() + rec.leaf.sum()

        def f_launch(s):
            b = build_bvh(s, wvp, wv, cfg)
            r = make_rays(cam, cfg)
            o3, d3 = _split_rays(r)
            tq = _frame_tex_quads(s, cfg)
            color, refl, ri, refr, qi = _launch_soa(
                s, b, o3, d3, cfg, tq, None, None)
            return sum(c.sum() for c in color)

        def f_full(s):
            return render_frame(s, cam, cfg).sum()

        ts = {}
        for tag, f in [("build", f_build), ("build+trav", f_trav),
                       ("build+trav+launch", f_launch), ("full", f_full)]:
            t = timed(jax.jit(f), scene)
            ts[tag] = t
            print(f"stage {tag:18s}: {t*1e3:7.1f} ms", flush=True)
        print(f"-> primary traversal ~{(ts['build+trav']-ts['build'])*1e3:.1f}"
              f" ms, launch shade ~"
              f"{(ts['build+trav+launch']-ts['build+trav'])*1e3:.1f} ms, "
              f"bounce pass ~{(ts['full']-ts['build+trav+launch'])*1e3:.1f} ms")


if __name__ == "__main__":
    main()
