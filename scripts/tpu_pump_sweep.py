"""Round-5 item 4: refill-kernel pump sweep + lane-occupancy census at
102k tris / 1080p.

``pump`` = serve rounds per subtile load.  The micro-step is
latency-bound (645 cyc; doubling the shuffle costs +39 —
tpu_sweep_diag.py), and descend (rank+1) / short skips usually stay in
the loaded 128-rank subtile, so re-serving it advances those lanes at
~zero marginal latency.

Run on the chip: python scripts/tpu_pump_sweep.py

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
import numpy as np

sys.path.insert(0, ".")

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices, permute_rays, tile_order
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import sphere_grid
from raytracebvh_tpu.ops.traverse_hbm import traverse_hbm_pallas
from raytracebvh_tpu.pipeline import build_bvh, make_rays


def timed(fn, *a, warmup=1, iters=3):
    for _ in range(warmup):
        jax.block_until_ready(fn(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(fn(*a))
    return (time.perf_counter() - t0) / iters


def main():
    W, H = 1920, 1080
    cfg = RenderConfig(width=W, height=H)
    cam = Camera.default()
    wvp, wv = camera_matrices(cam, W, H)
    scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=40))
    bvh = jax.jit(lambda s: build_bvh(s, wvp, wv, cfg))(scene)
    perm, _ = tile_order(W, H, 16)
    rays = permute_rays(make_rays(cam, cfg), jnp.asarray(perm))

    ref_hits = None
    for pump in (1, 2, 3, 4):
        f = jax.jit(lambda b, r, p=pump: traverse_hbm_pallas(
            b, r, cfg.epsilon, pump=p, return_steps=True))
        t = timed(f, bvh, rays)
        rec, steps = f(bvh, rays)
        hits = int(np.asarray(rec.hit).sum())
        if ref_hits is None:
            ref_hits = (np.asarray(rec.hit), np.asarray(rec.leaf),
                        np.asarray(rec.distance))
        else:
            assert np.array_equal(ref_hits[0], np.asarray(rec.hit))
            assert np.array_equal(ref_hits[1], np.asarray(rec.leaf))
            np.testing.assert_allclose(ref_hits[2],
                                       np.asarray(rec.distance))
        st = int(np.asarray(steps).sum())
        # occupancy census (separate instrumented call)
        _, st_o, occ = jax.jit(lambda b, r, p=pump: traverse_hbm_pallas(
            b, r, cfg.epsilon, pump=p, return_occupancy=True))(bvh, rays)
        occ_tot = float(np.asarray(occ).sum())
        st_tot = float(np.asarray(st_o).sum())
        print(f"pump={pump}: {t*1e3:6.1f} ms -> {W*H/t/1e6:5.2f} Mrays/s, "
              f"{st} steps, occupancy {100*occ_tot/(st_tot*2048):.1f}% "
              f"(parity exact)", flush=True)


if __name__ == "__main__":
    main()
