"""TPU timing breakdown for the LARGE scene (BASELINE config 5 class):
sphere_grid 102 400 tris, 1080p primary rays.

Times each build stage separately (morton, sort, topology, fit, links,
leaf-attr pack) and the large-scene traversal backends, with a parity
check of the sweep kernel against the XLA walk on a ray subset.

Run on the real chip:  python scripts/tpu_large.py [n_subdiv]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler
faulthandler.dump_traceback_later(120, repeat=True)

import jax
import jax.numpy as jnp
import numpy as np

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import Rays, scene_to_device
from raytracebvh_tpu.models.procedural import sphere_grid
from raytracebvh_tpu.ops import bvh as bvh_ops
from raytracebvh_tpu.ops import morton as morton_ops
from raytracebvh_tpu.ops import sort as sort_ops
from raytracebvh_tpu.pipeline import build_bvh, make_rays

SUBDIV = int(sys.argv[1]) if len(sys.argv) > 1 else 40
W, H = 1920, 1080

scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=SUBDIV))
print(f"scene: {scene.num_faces} tris", flush=True)
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=0)
wvp, wv = camera_matrices(cam, W, H)


def timed(label, fn, *a, iters=3):
    t0 = time.time()
    out = jax.block_until_ready(fn(*a))
    tc = time.time() - t0
    t0 = time.time()
    for _ in range(iters):
        out = jax.block_until_ready(fn(*a))
    dt = (time.time() - t0) / iters
    print(f"{label:<28} compile {tc:7.1f}s   run {dt*1e3:9.2f} ms", flush=True)
    return out, dt


# ---- stage-by-stage build breakdown (standalone dispatches: compare
# ratios, not absolutes — per-dispatch host overhead is ~25-40ms)
dtype = jnp.float32
from raytracebvh_tpu.camera import transform_points

nf = scene.num_faces
n = ((nf + 255) // 256) * 256

def stage_morton(s):
    verts_t = transform_points(s.verts, wvp)
    smin, smax = morton_ops.scene_aabb(verts_t)
    codes, lmin, lmax, _ = morton_ops.triangle_leaves(
        verts_t, s.indices, smin, smax)
    return codes, lmin, lmax

(codes, lmin, lmax), t_m = timed("morton", jax.jit(stage_morton), scene)
pad = n - nf
codes_p = jnp.concatenate([codes, jnp.full(pad, morton_ops.SENTINEL_CODE, jnp.uint32)])

(sc, order), t_s = timed("sort (lax.sort)", jax.jit(sort_ops.sort_by_code), codes_p)

from raytracebvh_tpu.ops.sort_pallas import bitonic_sort_by_code

(sc_b, order_b), t_sb = timed("sort (bitonic pallas)",
                              jax.jit(bitonic_sort_by_code), codes_p)
assert (np.asarray(sc_b) == np.asarray(sc)).all()
assert (np.asarray(order_b) == np.asarray(order)).all()
print("  bitonic sort parity ok", flush=True)

# karras sub-stages
from raytracebvh_tpu.ops.bvh import karras_children

_, t_kc = timed("karras_children only", jax.jit(karras_children), sc)

topo, t_t = timed("topology (karras)", jax.jit(bvh_ops.build_topology), sc)

lmin_p = jnp.concatenate([lmin, jnp.full((pad, 3), bvh_ops.BIG, dtype)])
lmax_p = jnp.concatenate([lmax, jnp.full((pad, 3), -bvh_ops.BIG, dtype)])
lmin_s = jnp.stack([lmin_p[:, k][order] for k in range(3)], -1)
lmax_s = jnp.stack([lmax_p[:, k][order] for k in range(3)], -1)

(_, _), t_f = timed(
    "fit (RMQ)", jax.jit(lambda lo, hi, a, b: bvh_ops.fit_aabbs(lo, hi, a, b)),
    topo.node_lo, topo.node_hi, lmin_s, lmax_s)

(_, _), t_l = timed(
    "links", jax.jit(lambda tp: bvh_ops.compute_links(tp, n)), topo)

bvh, t_b = timed("full build (standalone)", jax.jit(
    lambda s: build_bvh(s, wvp, wv, cfg)), scene)

# in-stream marginal build (scanned) like bench.py
def builds_k(k):
    @jax.jit
    def f(s):
        def step(acc, yaw):
            w2 = wvp.at[0, 0].mul(jnp.cos(yaw))
            b = build_bvh(s, w2, wv, cfg)
            return acc + b.bbmin[s.num_faces].sum() + b.skip_link.sum(), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0), jnp.linspace(0.0, 0.1, k))
        return acc
    return f

_, t1 = timed("build scan k=1", builds_k(1), scene, iters=3)
_, t5 = timed("build scan k=5", builds_k(5), scene, iters=3)
t_build = max((t5 - t1) / 4.0, 1e-9)
print(f"  -> in-stream build {t_build*1e3:.1f} ms = {1/t_build:.1f} builds/sec",
      flush=True)

# ---- traversal backends at 1080p primary rays
rays = make_rays(cam, cfg)
R = W * H

from raytracebvh_tpu.ops.traverse_hbm import traverse_hbm_pallas

f_sweep = jax.jit(lambda b, r: traverse_hbm_pallas(b, r, cfg.epsilon))
rec_sweep, t_sw = timed("hbm sweep traversal 2.07M", f_sweep, bvh, rays)
print(f"  -> {R/t_sw/1e6:.2f} Mrays/s (hbm sweep)", flush=True)
print(f"  hits: {int(np.asarray(rec_sweep.hit).sum())}/{R}", flush=True)

# parity vs the XLA walk on a strided ray subset
sub = jax.tree_util.tree_map(lambda x: x[:: 977][:2048], rays)
from raytracebvh_tpu.ops.traverse import traverse

f_x = jax.jit(lambda b, r: traverse(b, r, cfg.epsilon))
rec_x, _ = timed("xla walk (2048 subset)", f_x, bvh, sub, iters=1)
rec_s2 = jax.tree_util.tree_map(lambda x: x[:: 977][:2048], rec_sweep)
hit_x = np.asarray(rec_x.hit)
hit_s = np.asarray(rec_s2.hit)
assert (hit_x == hit_s).all(), f"hit mismatch {int((hit_x!=hit_s).sum())}"
leaf_ok = (np.asarray(rec_x.leaf)[hit_x] == np.asarray(rec_s2.leaf)[hit_x])
print(f"  parity: hits equal; leaf match {leaf_ok.mean()*100:.2f}%", flush=True)
np.testing.assert_allclose(
    np.asarray(rec_s2.distance)[hit_x], np.asarray(rec_x.distance)[hit_x],
    rtol=2e-5, atol=2e-5)
print("  parity: distances allclose", flush=True)

