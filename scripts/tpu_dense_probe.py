"""Round-5 probe: hit rate vs ortho_scale at 1080p on Image_Test.obj.

The round-4 headline frame hits 0.15% of rays (the reference's ortho rays
are spaced in fixed world units, RayTraceLaunch.hlsl:23-27, so at 1080p
the subject covers the same ~3k pixels as at 800x800).  The dense headline
config needs an ortho_scale where the subject covers >= 50% of pixels —
this probe finds it (timing variants live in tpu_dense_sweep.py).

Run on the chip: python scripts/tpu_dense_probe.py
"""

import sys

import jax
import jax.numpy as jnp

sys.path.insert(0, ".")

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.pipeline import build_bvh, make_rays
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.utils.assets import find_asset


def main():
    scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
    width, height = 1920, 1080
    cam = Camera.default()

    # --- hit-rate sweep
    from raytracebvh_tpu.ops.traverse_pallas import traverse_pallas

    wvp, wv = camera_matrices(cam, width, height)

    def hits_at(scale):
        cfg = RenderConfig(width=width, height=height, ortho_scale=scale)
        bvh = build_bvh(scene, wvp, wv, cfg)
        rays = make_rays(cam, cfg)
        rec = traverse_pallas(bvh, rays, cfg.epsilon)
        return rec.hit.sum()

    f = jax.jit(hits_at)
    for scale in [4.0, 16.0, 32.0, 48.0, 64.0, 80.0, 96.0, 128.0]:
        n = int(f(jnp.float32(scale)))
        print(f"ortho_scale {scale:6.1f}: {n:8d} hits "
              f"({100.0 * n / (width * height):.1f}%)")


if __name__ == "__main__":
    main()
