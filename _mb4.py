"""In-frame ablations: replace pieces of the shading path and time full frames."""
import time
import jax, jax.numpy as jnp
from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.utils.assets import find_asset
from raytracebvh_tpu import pipeline as pl
from raytracebvh_tpu.ops import shade as shade_ops

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
    print(f"{name:44s} {dt*1e3:9.3f} ms")
    return out

tm("frame baseline (b=1)", lambda s, c: pl.render_frame(s, c, cfg), scene, cam)

orig_sample = shade_ops.sample_texture_quads
orig_shade = pl._shade_hit_soa

# ablation 1: texture sample -> white
shade_ops.sample_texture_quads = (
    lambda tq, hw, ti, u, v, hm, wm: tuple(jnp.ones_like(u) for _ in range(4))
)
tm("frame, texture=white", lambda s, c: pl.render_frame(s, c, cfg), scene, cam)
shade_ops.sample_texture_quads = orig_sample

# ablation 2: leaf_attrs gather -> broadcast row 0
def shade_bcast(scene, bvh, o3, d3, rec, tex_quads=None):
    bvh2 = bvh.replace(leaf_attrs=bvh.leaf_attrs * 0 + bvh.leaf_attrs[0:1]) if hasattr(bvh, "replace") else bvh
    return orig_shade(scene, bvh2, o3, d3, rec.replace(leaf=jnp.zeros_like(rec.leaf)) if hasattr(rec, "replace") else rec._replace(leaf=jnp.zeros_like(rec.leaf)), tex_quads)
pl._shade_hit_soa = shade_bcast
tm("frame, leaf gather->row0", lambda s, c: pl.render_frame(s, c, cfg), scene, cam)
pl._shade_hit_soa = orig_shade

# ablation 3: both off
pl._shade_hit_soa = shade_bcast
shade_ops.sample_texture_quads = (
    lambda tq, hw, ti, u, v, hm, wm: tuple(jnp.ones_like(u) for _ in range(4))
)
tm("frame, gather->row0 + tex=white", lambda s, c: pl.render_frame(s, c, cfg), scene, cam)
pl._shade_hit_soa = orig_shade
shade_ops.sample_texture_quads = orig_sample

# ablation 4: bounces=0 vs 1 again for per-pass delta
cfg0 = RenderConfig(width=W, height=H, bounces=0)
tm("frame b=0", lambda s, c: pl.render_frame(s, c, cfg0), scene, cam)

# fwd+bwd with ablations
from raytracebvh_tpu.models.inverse import init_params, apply_params
params = init_params(scene)
target = jax.jit(lambda s, c: pl.render_frame(s, c, cfg))(scene, cam)
def loss(p):
    img = pl.render_frame(apply_params(p, scene), cam, cfg)
    return jnp.mean((img - target) ** 2)
tm("fwd+bwd baseline", jax.grad(loss), params, iters=5)

shade_ops.sample_texture_quads = (
    lambda tq, hw, ti, u, v, hm, wm: tuple(jnp.ones_like(u) for _ in range(4))
)
tm("fwd+bwd, tex=white", jax.grad(loss), params, iters=5)
shade_ops.sample_texture_quads = orig_sample

pl._shade_hit_soa = shade_bcast
tm("fwd+bwd, gather->row0", jax.grad(loss), params, iters=5)
pl._shade_hit_soa = orig_shade
