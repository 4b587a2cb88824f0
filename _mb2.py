import time, functools
import jax, jax.numpy as jnp
from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.io.obj import load_obj
from raytracebvh_tpu.utils.assets import find_asset
from raytracebvh_tpu import pipeline as pl
from raytracebvh_tpu.ops.traverse_pallas import traverse_pallas, pack_tables
from raytracebvh_tpu.core.types import Rays

scene = scene_to_device(load_obj(find_asset("Image_Test.obj")))
cam = Camera.default()

def tm(name, fn, *a, iters=10):
    f = jax.jit(fn)
    out = jax.block_until_ready(f(*a))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = jax.block_until_ready(f(*a))
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:38s} {dt*1e3:9.3f} ms")
    return out

W, H = 1920, 1080
cfg0 = RenderConfig(width=W, height=H, bounces=0)
cfg1 = RenderConfig(width=W, height=H, bounces=1)

# noop baseline: measures pure call overhead
tm("noop (overhead floor)", lambda x: x + 1.0, jnp.ones(8))

wvp, wv = camera_matrices(cam, W, H)
bvh = jax.jit(lambda s: pl.build_bvh(s, wvp, wv, cfg1))(scene)
rays = jax.jit(lambda: pl.make_rays(cam, cfg1))()

tm("traverse_pallas 2.07M rays", lambda b, r: traverse_pallas(b, r, cfg1.epsilon, cfg1.max_traversal_steps), bvh, rays)
tm("frame bounces=0", lambda s, c: pl.render_frame(s, c, cfg0), scene, cam)
tm("frame bounces=1", lambda s, c: pl.render_frame(s, c, cfg1), scene, cam)

# shading chain alone (launch with traversal replaced? just launch_full incl. traversal)
tm("launch_full (trace+shade)", lambda s, b, r: pl.launch_full(s, b, r, cfg1), scene, bvh, rays)

# fwd+bwd like bench
from raytracebvh_tpu.models.inverse import apply_params, init_params, loss_fn
params = init_params(scene)
target = jax.jit(lambda s, c: pl.render_frame(s, c, cfg1))(scene, cam)
def loss(p):
    s2 = apply_params(scene, p)
    img = pl.render_frame(s2, cam, cfg1)
    return jnp.mean((img - target) ** 2)
tm("fwd+bwd frame", jax.grad(loss), params, iters=5)
