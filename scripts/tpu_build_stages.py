"""In-stream per-stage breakdown of the large-scene LBVH build.

Standalone dispatches pay ~25-40 ms host/runtime overhead on the
tunneled chip, so stage costs are measured the same way bench.py
measures builds/sec: K iterations of a build PREFIX inside one jitted
scan, marginal cost = (t(K) - t(1)) / (K - 1).  Consecutive prefixes
differ by one stage; their marginal-cost difference is that stage's
in-stream cost.

Run: python scripts/tpu_build_stages.py [subdiv]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices, transform_normals, transform_points
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import sphere_grid
from raytracebvh_tpu.ops import bvh as bvh_ops
from raytracebvh_tpu.ops import morton as morton_ops
from raytracebvh_tpu.ops import sort as sort_ops
from raytracebvh_tpu.ops.traverse_hbm import pack_table_rank17
from raytracebvh_tpu.pipeline import _pad_count, assemble_bvh, build_bvh

SUBDIV = int(sys.argv[1]) if len(sys.argv) > 1 else 40
W, H = 1920, 1080

scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=SUBDIV))
print(f"scene: {scene.num_faces} tris", flush=True)
cam = Camera.default()
cfg = RenderConfig(width=W, height=H, bounces=0)
wvp, wv = camera_matrices(cam, W, H)
dtype = jnp.float32
nf = scene.num_faces
n = _pad_count(nf, cfg.leaf_pad_multiple)
pad = n - nf


def leaf_stage(s, w2):
    verts_t = transform_points(s.verts.astype(dtype), w2.astype(dtype))
    normals_t = transform_normals(s.normals.astype(dtype), wv.astype(dtype))
    smin, smax = morton_ops.scene_aabb(verts_t)
    codes, lmin, lmax, _ = morton_ops.triangle_leaves(
        verts_t, s.indices, smin, smax)
    codes = jnp.concatenate(
        [codes, jnp.full(pad, morton_ops.SENTINEL_CODE, jnp.uint32)])
    lmin = jnp.concatenate([lmin, jnp.full((pad, 3), bvh_ops.BIG, dtype)])
    lmax = jnp.concatenate([lmax, jnp.full((pad, 3), -bvh_ops.BIG, dtype)])
    return verts_t, normals_t, codes, lmin, lmax


def d_leaf(s, w2):
    verts_t, normals_t, codes, lmin, lmax = leaf_stage(s, w2)
    return (codes.astype(jnp.float32).sum() + lmin.sum() + lmax.sum()
            + normals_t.sum())


def d_sort(s, w2):
    verts_t, normals_t, codes, lmin, lmax = leaf_stage(s, w2)
    sc, order = sort_ops.sort_by_code(codes)
    return (sc.astype(jnp.float32).sum() + order.astype(jnp.float32).sum()
            + normals_t.sum())


def d_perm(s, w2):
    verts_t, normals_t, codes, lmin, lmax = leaf_stage(s, w2)
    sc, order = sort_ops.sort_by_code(codes)
    lmin_s = jnp.stack([lmin[:, k][order] for k in range(3)], -1)
    lmax_s = jnp.stack([lmax[:, k][order] for k in range(3)], -1)
    return sc.astype(jnp.float32).sum() + lmin_s.sum() + lmax_s.sum() + normals_t.sum()


def d_topo(s, w2):
    verts_t, normals_t, codes, lmin, lmax = leaf_stage(s, w2)
    sc, order = sort_ops.sort_by_code(codes)
    lmin_s = jnp.stack([lmin[:, k][order] for k in range(3)], -1)
    lmax_s = jnp.stack([lmax[:, k][order] for k in range(3)], -1)
    topo = bvh_ops.build_topology(sc)
    return (topo.child_l.sum() + topo.parent.sum() + lmin_s.sum()
            + lmax_s.sum() + normals_t.sum()).astype(jnp.float32)


def d_fit(s, w2):
    verts_t, normals_t, codes, lmin, lmax = leaf_stage(s, w2)
    sc, order = sort_ops.sort_by_code(codes)
    lmin_s = jnp.stack([lmin[:, k][order] for k in range(3)], -1)
    lmax_s = jnp.stack([lmax[:, k][order] for k in range(3)], -1)
    topo = bvh_ops.build_topology(sc)
    bbmin, bbmax = bvh_ops.fit_aabbs(topo.node_lo, topo.node_hi, lmin_s, lmax_s)
    return (bbmin[nf].sum() + bbmax.sum() + topo.child_l.sum().astype(jnp.float32)
            + normals_t.sum())


def d_links(s, w2):
    verts_t, normals_t, codes, lmin, lmax = leaf_stage(s, w2)
    sc, order = sort_ops.sort_by_code(codes)
    lmin_s = jnp.stack([lmin[:, k][order] for k in range(3)], -1)
    lmax_s = jnp.stack([lmax[:, k][order] for k in range(3)], -1)
    topo = bvh_ops.build_topology(sc)
    bbmin, bbmax = bvh_ops.fit_aabbs(topo.node_lo, topo.node_hi, lmin_s, lmax_s)
    entry, skip = bvh_ops.compute_links(topo, n)
    return bbmin[nf].sum() + skip.sum().astype(jnp.float32) + normals_t.sum()


def d_full(s, w2):
    b = build_bvh(s, w2, wv, cfg)
    return b.bbmin[nf].sum() + b.skip_link.sum() + b.leaf_attrs.sum()


def d_full_tbl(s, w2):
    b = build_bvh(s, w2, wv, cfg)
    tbl = pack_table_rank17(b)
    return b.leaf_attrs.sum() + tbl.sum()


def scan_k(digest, k):
    @jax.jit
    def f(s):
        def step(acc, yaw):
            w2 = wvp.at[0, 0].mul(jnp.cos(yaw))
            return acc + digest(s, w2), None
        acc, _ = jax.lax.scan(step, jnp.float32(0.0),
                              jnp.linspace(0.0, 0.1, k))
        return acc
    return f


def marginal(name, digest, k=5, iters=3):
    f1, fk = scan_k(digest, 1), scan_k(digest, k)
    jax.block_until_ready(f1(scene))
    jax.block_until_ready(fk(scene))
    ts = []
    for f, kk in ((f1, 1), (fk, k)):
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(f(scene))
        ts.append((time.perf_counter() - t0) / iters)
    m = max((ts[1] - ts[0]) / (k - 1), 0.0)
    print(f"{name:<22} in-stream {m*1e3:8.2f} ms", flush=True)
    return m


prev = 0.0
for name, digest in (
    ("leaf (morton)", d_leaf),
    ("+ sort", d_sort),
    ("+ perm", d_perm),
    ("+ topology", d_topo),
    ("+ fit", d_fit),
    ("+ links", d_links),
    ("full build", d_full),
    ("+ rank17 table", d_full_tbl),
):
    m = marginal(name, digest)
    print(f"    stage delta: {(m - prev)*1e3:+8.2f} ms", flush=True)
    prev = m
