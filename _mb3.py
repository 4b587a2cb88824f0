import time, functools
import jax, jax.numpy as jnp
from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.utils.assets import find_asset
from raytracebvh_tpu import pipeline as pl
from raytracebvh_tpu.ops import shade as shade_ops
from raytracebvh_tpu.ops.traverse_pallas import traverse_pallas
from raytracebvh_tpu.core.types import HitRecord

scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
cam = Camera.default()
W, H = 1920, 1080
cfg = RenderConfig(width=W, height=H, bounces=1)

def tm(name, fn, *a, iters=10):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt*1e3:9.3f} ms")
    return out

wvp, wv = camera_matrices(cam, W, H)
bvh = jax.jit(lambda s: pl.build_bvh(s, wvp, wv, cfg))(scene)
rays = jax.jit(lambda: pl.make_rays(cam, cfg))()
rec = jax.jit(lambda b, r: traverse_pallas(b, r, cfg.epsilon, cfg.max_traversal_steps))(bvh, rays)
o3 = tuple(rays.origin[:, k] for k in range(3))
d3 = tuple(rays.direction[:, k] for k in range(3))

# the one row gather
tm("leaf_attrs[leaf] gather [2M,40]", lambda b, l: b.leaf_attrs[l], bvh, rec.leaf)

tq = jax.jit(lambda s: shade_ops.pack_texture_quads(s.textures, s.tex_hw))(scene)
tm("pack_texture_quads", lambda s: shade_ops.pack_texture_quads(s.textures, s.tex_hw), scene)

tm("_shade_hit_soa", lambda s, b, rc: pl._shade_hit_soa(s, b, o3, d3, rc, tq), scene, bvh, rec)

# texture sampling alone
a = jax.jit(lambda b, l: b.leaf_attrs[l])(bvh, rec.leaf)
uvu = a[:, 18]; uvv = a[:, 19]; tex_id = a[:, 39].astype(jnp.int32)
hmax, wmax = scene.textures.shape[1], scene.textures.shape[2]
tm("sample_texture_quads", lambda tq_, ti, u, v: shade_ops.sample_texture_quads(tq_, scene.tex_hw, ti, u, v, hmax, wmax), tq, tex_id, uvu, uvv)

# full launch minus traversal: emulate by feeding precomputed rec
def launch_given_rec(s, b, rc):
    hit_loc, normal, hit_color, shininess, alpha, optical = pl._shade_hit_soa(s, b, o3, d3, rc, tq)
    return hit_color
tm("shade only (given rec)", launch_given_rec, scene, bvh, rec)

# bwd of shading alone
def shade_loss(lat, rc):
    b2 = bvh._replace(leaf_attrs=lat) if hasattr(bvh, "_replace") else bvh.replace(leaf_attrs=lat)
    out = pl._shade_hit_soa(scene, b2, o3, d3, rc, tq)
    return sum(jnp.sum(c) for c in out[2])
tm("shade bwd (d/leaf_attrs)", jax.grad(shade_loss), bvh.leaf_attrs, rec, iters=5)
