import time, functools
import jax, jax.numpy as jnp
from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.utils.assets import find_asset
from raytracebvh_tpu.ops import morton as morton_ops, sort as sort_ops, bvh as bvh_ops
from raytracebvh_tpu import pipeline as pl

scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
cfg = RenderConfig(width=64, height=64, bounces=1)
cam = Camera.default()
wvp, wv = camera_matrices(cam, cfg.width, cfg.height)

def tm(name, fn, *a):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(20):
        out = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / 20
    print(f"{name:30s} {dt*1e3:8.3f} ms")
    return out

# full build
tm("build_bvh(full)", lambda s: pl.build_bvh(s, wvp, wv, cfg), scene)

# stage by stage
from raytracebvh_tpu.camera import transform_points, transform_normals
dtype = jnp.float32
def stage_transform(s):
    return transform_points(s.verts, wvp), transform_normals(s.normals, wv)
verts_t, normals_t = tm("transform", stage_transform, scene)

nf = scene.num_faces
n = pl._pad_count(nf, cfg.leaf_pad_multiple)
def stage_morton(vt, idx):
    smin, smax = morton_ops.scene_aabb(vt)
    return morton_ops.triangle_leaves(vt, idx, smin, smax)
codes, lmin, lmax, _ = tm("morton", stage_morton, verts_t, scene.indices)

pad = n - nf
codes_p = jnp.concatenate([codes, jnp.full(pad, morton_ops.SENTINEL_CODE, jnp.uint32)])
sorted_codes, order = tm("lax.sort", sort_ops.sort_by_code, codes_p)
cl, cr, parent = tm("karras topology", bvh_ops.build_topology, sorted_codes)
lmin_p = jnp.concatenate([lmin, jnp.full((pad,3), bvh_ops.BIG, dtype)])[order]
lmax_p = jnp.concatenate([lmax, jnp.full((pad,3), -bvh_ops.BIG, dtype)])[order]
bbmin, bbmax = tm("fit_aabbs", bvh_ops.fit_aabbs, cl, cr, lmin_p, lmax_p)
tm("compute_links", functools.partial(bvh_ops.compute_links, n=n), cl, cr, parent)

# leaf_attrs packing: the rest of build_bvh
def stage_pack(s, order_):
    prim = jnp.concatenate([jnp.arange(nf, dtype=jnp.int32), jnp.full(pad, -1, jnp.int32)])[order_]
    safe_prim = jnp.maximum(prim, 0)
    face_idx = s.indices.reshape(-1, 3)[safe_prim]
    tri_verts = verts_t[face_idx]
    tri_normals = normals_t[face_idx]
    tri_uv = s.uv[face_idx]
    tri_mat = s.mat_index[safe_prim]
    mats = s.materials
    cols = ([tri_verts[:, v, k] for v in range(3) for k in range(3)]
        + [tri_normals[:, v, k] for v in range(3) for k in range(3)]
        + [tri_uv[:, v, k] for v in range(3) for k in range(2)]
        + [mats.ambient[tri_mat][:, c] for c in range(4)]
        + [mats.diffuse[tri_mat][:, c] for c in range(4)]
        + [mats.specular[tri_mat][:, c] for c in range(4)]
        + [mats.shininess[tri_mat], mats.optical_density[tri_mat], mats.alpha[tri_mat],
           mats.tex_id[tri_mat].astype(dtype)])
    return jnp.stack(cols, axis=-1)
tm("leaf_attrs pack", stage_pack, scene, order)

from raytracebvh_tpu.ops.traverse_pallas import pack_tables
bvh = jax.jit(lambda s: pl.build_bvh(s, wvp, wv, cfg))(scene)
tm("pack_tables (pallas)", pack_tables, bvh)
