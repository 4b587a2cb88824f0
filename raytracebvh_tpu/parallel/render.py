"""Sharded rendering and the distributed training step.

Two levels of explicitness, both producing bit-identical images to the
single-device pipeline:

  * ``render_sharded`` — jit + sharding constraints: rays (pixels) are
    sharded over the 'rays' mesh axis, the scene is replicated, and XLA
    propagates shardings through the whole frame (the BVH build is small
    and replicates; traversal/shading are elementwise+gather and shard
    cleanly).  Zero collectives in the forward pass — rays are
    embarrassingly parallel, exactly like the reference's independent
    15x15 pixel threadgroups (Graphics.cpp:788-792).

  * ``render_geo_sharded`` — shard_map with *explicit* collectives:
    geometry arrays arrive sharded over the 'geo' axis and are
    all-gathered over ICI before the local build+trace; each device then
    traces only its ray tile.  This is the scaling path for scenes too
    large to replicate (BASELINE.md config 5).

``train_step_sharded`` runs the inverse-rendering objective with
jax.grad *inside* shard_map: per-device gradients over the local ray tile
are psum'd over the mesh — the gradient all-reduce rides ICI exactly like
a data-parallel training step.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..config import RenderConfig
from ..core.types import Camera, Rays, Scene
from ..pipeline import (
    build_bvh,
    light_in_ray_space,
    make_rays,
    render_frame,
    shade_rays,
)
from ..camera import camera_matrices
from .mesh import GEO_AXIS, RAYS_AXIS, ray_sharded, replicated


def render_sharded(scene: Scene, camera: Camera, cfg: RenderConfig, mesh: Mesh):
    """Rays sharded over the mesh via sharding constraints (pjit style)."""

    @functools.partial(jax.jit, static_argnames=("cfg",))
    def _render(scene, camera, cfg):
        img = render_frame(scene, camera, cfg)
        return jax.lax.with_sharding_constraint(
            img, NamedSharding(mesh, P(RAYS_AXIS, None, None))
        )

    scene = jax.device_put(scene, replicated(mesh))
    camera = jax.device_put(camera, replicated(mesh))
    return _render(scene, camera, cfg)


def _trace_tile(scene: Scene, bvh, rays: Rays, cfg: RenderConfig, wvp=None):
    """Launch + bounces (+ refraction + shadows) for a tile of rays
    (inside shard_map); the SoA chain from pipeline.py."""
    light3 = None
    if cfg.enable_shadows and wvp is not None:
        light3 = light_in_ray_space(cfg, wvp, wvp.dtype)
    return shade_rays(scene, bvh, rays, cfg, light3)


def render_geo_sharded(
    scene: Scene, camera: Camera, cfg: RenderConfig, mesh: Mesh
):
    """Geometry sharded over 'geo' (explicit all_gather), rays over 'rays'.

    Host-side requirement: scene arrays must divide evenly by the mesh
    axis sizes (use parallel.mesh.pad_to_multiple when preparing the
    scene; OBJ scenes pad with degenerate triangles).
    """
    wvp, wv = camera_matrices(camera, cfg.width, cfg.height)
    rays = make_rays(camera, cfg)

    geo_spec = Scene(
        verts=P(GEO_AXIS),
        normals=P(GEO_AXIS),
        uv=P(GEO_AXIS),
        indices=P(GEO_AXIS),
        mat_index=P(GEO_AXIS),
        materials=jax.tree_util.tree_map(lambda _: P(), scene.materials),
        textures=P(),
        tex_hw=P(),
    )

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(geo_spec, P(), P(), Rays(origin=P(RAYS_AXIS), direction=P(RAYS_AXIS))),
        out_specs=P(RAYS_AXIS),
        check_vma=False,
    )
    def _tile(scene_shard: Scene, wvp, wv, rays_tile: Rays):
        # geometry all-gather over ICI (BASELINE.md: "triangles ...
        # sharded with an all-gather"); replaces nothing in the reference
        # — it has no multi-device path at all (SURVEY.md 2.3).
        full = Scene(
            verts=jax.lax.all_gather(scene_shard.verts, GEO_AXIS, tiled=True),
            normals=jax.lax.all_gather(scene_shard.normals, GEO_AXIS, tiled=True),
            uv=jax.lax.all_gather(scene_shard.uv, GEO_AXIS, tiled=True),
            indices=jax.lax.all_gather(scene_shard.indices, GEO_AXIS, tiled=True),
            mat_index=jax.lax.all_gather(scene_shard.mat_index, GEO_AXIS, tiled=True),
            materials=scene_shard.materials,
            textures=scene_shard.textures,
            tex_hw=scene_shard.tex_hw,
        )
        bvh = build_bvh(full, wvp, wv, cfg)
        return _trace_tile(full, bvh, rays_tile, cfg, wvp)

    color = jax.jit(_tile)(scene, wvp, wv, rays)
    return color.reshape(cfg.height, cfg.width, 4)


def train_step_sharded(
    params,
    scene_fn,
    scene: Scene,
    camera: Camera,
    target,
    cfg: RenderConfig,
    mesh: Mesh,
):
    """One inverse-rendering step: returns (loss, grads) with grads
    pmean'd over every mesh axis (the distributed backward pass of
    BASELINE.md: "geometry gradients all-reduced via psum").

    Args:
      params: pytree of optimizable parameters (replicated).
      scene_fn: (params, scene) -> Scene applying params.
      target: [H, W, 4] target image (ray-sharded over rows).
    """
    wvp, wv = camera_matrices(camera, cfg.width, cfg.height)
    rays = make_rays(camera, cfg)
    target_flat = target.reshape(-1, 4)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(
            P(),
            jax.tree_util.tree_map(lambda _: P(), scene),
            P(),
            P(),
            Rays(origin=P(RAYS_AXIS), direction=P(RAYS_AXIS)),
            P(RAYS_AXIS),
        ),
        out_specs=(P(), P()),
        check_vma=False,
    )
    def _step(params, scene, wvp, wv, rays_tile, target_tile):
        def local_loss(p):
            s = scene_fn(p, scene)
            bvh = build_bvh(s, wvp, wv, cfg)
            color = _trace_tile(s, bvh, rays_tile, cfg, wvp)
            return jnp.mean((color - target_tile) ** 2)

        loss, grads = jax.value_and_grad(local_loss)(params)
        # gradient all-reduce over ICI (data-parallel psum/pmean)
        grads = jax.lax.pmean(grads, RAYS_AXIS)
        grads = jax.lax.pmean(grads, GEO_AXIS)
        loss = jax.lax.pmean(loss, RAYS_AXIS)
        loss = jax.lax.pmean(loss, GEO_AXIS)
        return loss, grads

    return jax.jit(_step)(params, scene, wvp, wv, rays, target_flat)
