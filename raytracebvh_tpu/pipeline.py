"""The frame pipeline: transform -> morton -> sort -> build -> trace -> shade.

This is the TPU replacement for the reference's command-list orchestration
(reference: Graphics.cpp:667-831 ``computeBVH`` records 40+ dispatches with
UAV barriers and a full CPU fence wait per frame).  Here the whole frame is
one jitted function; XLA's dataflow replaces every barrier and the host
never blocks mid-frame.

Differentiability: traversal returns discrete hit ids through a
``stop_gradient`` boundary; hit distances, positions, normals, uv and
colors are *recomputed* differentiably from those ids, so gradients flow to
vertices, normals, uv, materials, textures and the camera — a new
capability on top of the reference (forward-only renderer).
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from .camera import (
    camera_matrices,
    perspective_rays,
    reference_rays,
    transform_normals,
    transform_points,
)
from .config import RenderConfig
from .core.types import BVH, Camera, HitRecord, Rays, Scene
from .ops import bvh as bvh_ops
from .ops import morton as morton_ops
from .ops import shade as shade_ops
from .ops import sort as sort_ops
from .ops.traverse import moller_trumbore, traverse


def _pad_count(nf: int, multiple: int) -> int:
    """Padded leaf count.  Matches the reference's sizing:
    numObjects = 256 * ceil(numIndices/256/3) (Graphics.cpp:368,523)."""
    return max(multiple, ((nf + multiple - 1) // multiple) * multiple)


def build_bvh(scene: Scene, wvp, wv, cfg: RenderConfig) -> BVH:
    """Per-frame LBVH rebuild (reference pipeline stages CS_MORTON_CODES,
    CS_RADIX_SORT_P1/P2, CS_BVH_CONSTRUCTION_P1/P2)."""
    dtype = jnp.dtype(cfg.dtype)
    verts_t = transform_points(scene.verts.astype(dtype), wvp.astype(dtype))
    normals_t = transform_normals(scene.normals.astype(dtype), wv.astype(dtype))

    nf = scene.num_faces
    n = _pad_count(nf, cfg.leaf_pad_multiple)

    smin, smax = morton_ops.scene_aabb(verts_t)
    codes, lmin, lmax, _ = morton_ops.triangle_leaves(
        verts_t, scene.indices, smin, smax
    )

    # pad to the static leaf count with sentinel codes + empty boxes
    pad = n - nf
    codes = jnp.concatenate(
        [codes, jnp.full(pad, morton_ops.SENTINEL_CODE, jnp.uint32)]
    )
    lmin = jnp.concatenate([lmin, jnp.full((pad, 3), bvh_ops.BIG, dtype)])
    lmax = jnp.concatenate([lmax, jnp.full((pad, 3), -bvh_ops.BIG, dtype)])
    prim = jnp.concatenate(
        [
            jnp.arange(nf, dtype=jnp.int32),
            jnp.full(pad, -1, jnp.int32),
        ]
    )

    if cfg.sort_backend == "radix":
        sorted_codes, order = sort_ops.radix_sort_by_code(codes)
    else:
        sorted_codes, order = sort_ops.sort_by_code(codes)
    prim = prim[order]
    lmin = lmin[order]
    lmax = lmax[order]

    child_l, child_r, parent = bvh_ops.build_topology(sorted_codes)
    bbmin, bbmax = bvh_ops.fit_aabbs(child_l, child_r, lmin, lmax)
    entry, skip = bvh_ops.compute_links(child_l, child_r, parent, n)

    # gather leaf triangle data into morton order ONCE (fixes quirk Q7,
    # the reference's per-leaf-visit WVP transform)
    safe_prim = jnp.maximum(prim, 0)
    face_idx = scene.indices.reshape(-1, 3)[safe_prim]  # [n, 3]
    tri_verts = verts_t[face_idx]  # [n, 3, 3]
    tri_normals = normals_t[face_idx]
    tri_uv = scene.uv.astype(dtype)[face_idx]
    tri_mat = scene.mat_index[safe_prim]

    return BVH(
        codes=sorted_codes,
        prim=prim,
        bbmin=bbmin,
        bbmax=bbmax,
        child_l=child_l,
        child_r=child_r,
        parent=parent,
        entry_link=entry,
        skip_link=skip,
        tri_verts=tri_verts,
        tri_normals=tri_normals,
        tri_uv=tri_uv,
        tri_mat=tri_mat,
    )


def _traverse_ids(bvh: BVH, rays: Rays, cfg: RenderConfig) -> HitRecord:
    """Traversal with a stop_gradient boundary on the discrete outputs."""
    bvh_ng = jax.lax.stop_gradient(bvh)
    rays_ng = jax.lax.stop_gradient(rays)
    nrays = rays_ng.origin.shape[0]
    if cfg.traversal_backend == "pallas":
        from .ops.traverse_pallas import traverse_pallas

        rec = traverse_pallas(
            bvh_ng, rays_ng, cfg.epsilon, cfg.max_traversal_steps
        )
        return HitRecord(
            hit=rec.hit,
            distance=jax.lax.stop_gradient(rec.distance),
            leaf=rec.leaf,
        )
    if cfg.traversal_chunk > 0 and nrays > cfg.traversal_chunk:
        assert nrays % cfg.traversal_chunk == 0, (
            f"traversal_chunk {cfg.traversal_chunk} must divide ray count {nrays}"
        )
        chunked = jax.tree_util.tree_map(
            lambda x: x.reshape((nrays // cfg.traversal_chunk, cfg.traversal_chunk) + x.shape[1:]),
            rays_ng,
        )
        rec = jax.lax.map(
            lambda r: traverse(bvh_ng, r, cfg.epsilon, cfg.max_traversal_steps),
            chunked,
        )
        rec = jax.tree_util.tree_map(
            lambda x: x.reshape((nrays,) + x.shape[2:]), rec
        )
    else:
        rec = traverse(bvh_ng, rays_ng, cfg.epsilon, cfg.max_traversal_steps)
    return HitRecord(
        hit=rec.hit,
        distance=jax.lax.stop_gradient(rec.distance),
        leaf=rec.leaf,
    )


def _shade_hit(scene: Scene, bvh: BVH, rays: Rays, rec: HitRecord):
    """Differentiable re-evaluation of a hit: distance, position, uv,
    normal, surface color (renderPixel * specular — reference:
    RayTraceLaunch.hlsl:57-59), and per-hit material scalars."""
    leaf = rec.leaf
    tri = bvh.tri_verts[leaf]  # [R, 3, 3]
    # recompute the hit distance differentiably (traversal's is stop-grad)
    t = moller_trumbore(
        rays.origin, rays.direction, tri[:, 0], tri[:, 1], tri[:, 2], 1e-12
    )
    t = jnp.where(rec.hit, t, 0.0)
    hit_loc = rays.origin + rays.direction * t[:, None]

    uv, normal = shade_ops.barycentric_normal_uv(
        tri, bvh.tri_normals[leaf], bvh.tri_uv[leaf], hit_loc
    )
    mat_id = bvh.tri_mat[leaf]
    base = shade_ops.render_pixel(
        scene.materials, mat_id, scene.textures, scene.tex_hw, uv
    )
    color = base * scene.materials.specular[mat_id]
    shininess = scene.materials.shininess[mat_id]
    alpha = scene.materials.alpha[mat_id]
    optical = scene.materials.optical_density[mat_id]
    return hit_loc, normal, color, shininess, alpha, optical


def launch_full(scene: Scene, bvh: BVH, rays: Rays, cfg: RenderConfig):
    """Primary-ray pass (reference: RayTraceLaunch.hlsl).

    Returns (color [R,4], refl_rays, refl_intensity [R], refr_rays,
    refr_intensity [R]) — the two RayPresent buffers the reference stores
    to u4/u5 (RayTraceGlobal.hlsl:117-118).  The refraction spawn follows
    RayTraceLaunch.hlsl:69-80 (intensity = (1-alpha)*REFRACTION_DECAY,
    origin offset *into* the surface, HLSL refract with eta =
    opticalDensity) — a pass the reference allocates but never dispatches
    (Graphics.cpp:805-809, quirk Q4); here it actually runs when
    cfg.enable_refraction.
    """
    rec = _traverse_ids(bvh, rays, cfg)
    hit_loc, normal, hit_color, shininess, alpha, optical = _shade_hit(
        scene, bvh, rays, rec
    )

    background = jnp.asarray(cfg.background, hit_color.dtype)
    color = jnp.where(rec.hit[:, None], hit_color, background)

    # reflection spawn (reference: RayTraceLaunch.hlsl:48-67)
    intensity = jnp.where(
        rec.hit, shininess / 1000.0 * cfg.reflection_decay, 0.0
    )
    refl_origin = hit_loc + normal * cfg.ray_offset
    refl_dir = shade_ops.normalize(shade_ops.reflect(rays.direction, normal))
    refl = Rays(
        origin=jnp.where(rec.hit[:, None], refl_origin, rays.origin),
        direction=jnp.where(rec.hit[:, None], refl_dir, rays.direction),
    )

    # refraction spawn (reference: RayTraceLaunch.hlsl:69-80)
    refr_dir_raw = shade_ops.refract(rays.direction, normal, optical)
    tir = jnp.sum(refr_dir_raw * refr_dir_raw, axis=-1) == 0.0  # total internal refl
    refr_intensity = jnp.where(
        rec.hit & ~tir, (1.0 - alpha) * cfg.refraction_decay, 0.0
    )
    refr_origin = hit_loc - normal * cfg.ray_offset
    refr_dir = shade_ops.normalize(refr_dir_raw)
    refr = Rays(
        origin=jnp.where(rec.hit[:, None], refr_origin, rays.origin),
        direction=jnp.where(
            (rec.hit & ~tir)[:, None], refr_dir, rays.direction
        ),
    )
    return color, refl, intensity, refr, refr_intensity


def launch(scene: Scene, bvh: BVH, rays: Rays, cfg: RenderConfig):
    """Primary-ray pass, reflection outputs only (see launch_full)."""
    color, refl, intensity, _, _ = launch_full(scene, bvh, rays, cfg)
    return color, refl, intensity


def bounce(scene: Scene, bvh: BVH, color, rays: Rays, intensity, cfg: RenderConfig):
    """One reflection pass (reference: RayTraceReflection.hlsl).

    Live rays (intensity > INTENSITY_MIN) re-trace; hits lerp the carried
    color toward the new surface color and respawn; misses lerp toward the
    background and die.
    """
    live = intensity > cfg.intensity_min
    rec = _traverse_ids(bvh, rays, cfg)
    hit_loc, normal, hit_color, shininess, _, _ = _shade_hit(scene, bvh, rays, rec)

    background = jnp.asarray(cfg.background, color.dtype)
    target = jnp.where(rec.hit[:, None], hit_color, background)
    lerped = color + intensity[:, None] * (target - color)
    new_color = jnp.where(live[:, None], lerped, color)

    new_intensity = jnp.where(
        live & rec.hit,
        intensity * shininess / 1000.0 * cfg.reflection_decay,
        0.0,
    )
    new_origin = hit_loc + normal * cfg.bounce_ray_offset
    new_dir = shade_ops.normalize(shade_ops.reflect(rays.direction, normal))
    upd = (live & rec.hit)[:, None]
    new_rays = Rays(
        origin=jnp.where(upd, new_origin, rays.origin),
        direction=jnp.where(upd, new_dir, rays.direction),
    )
    return new_color, new_rays, new_intensity


def bounce_refract(scene: Scene, bvh: BVH, color, rays: Rays, intensity,
                   cfg: RenderConfig):
    """One refraction (transmission) pass — the dispatch the reference
    stubbed out (Graphics.cpp:805-809).  Mirrors ``bounce`` but continues
    *through* surfaces: same color lerp, intensity decays by the hit
    material's transparency (1-alpha), respawn offset into the surface
    with an HLSL-refract direction; total internal reflection kills the
    ray."""
    live = intensity > cfg.intensity_min
    rec = _traverse_ids(bvh, rays, cfg)
    hit_loc, normal, hit_color, _, alpha, optical = _shade_hit(
        scene, bvh, rays, rec
    )

    background = jnp.asarray(cfg.background, color.dtype)
    target = jnp.where(rec.hit[:, None], hit_color, background)
    lerped = color + intensity[:, None] * (target - color)
    new_color = jnp.where(live[:, None], lerped, color)

    refr_dir_raw = shade_ops.refract(rays.direction, normal, optical)
    tir = jnp.sum(refr_dir_raw * refr_dir_raw, axis=-1) == 0.0
    new_intensity = jnp.where(
        live & rec.hit & ~tir,
        intensity * (1.0 - alpha) * cfg.refraction_decay,
        0.0,
    )
    new_origin = hit_loc - normal * cfg.bounce_ray_offset
    new_dir = shade_ops.normalize(refr_dir_raw)
    upd = (live & rec.hit & ~tir)[:, None]
    new_rays = Rays(
        origin=jnp.where(upd, new_origin, rays.origin),
        direction=jnp.where(upd, new_dir, rays.direction),
    )
    return new_color, new_rays, new_intensity


def make_rays(camera: Camera, cfg: RenderConfig) -> Rays:
    if cfg.camera_mode == "reference":
        return reference_rays(
            cfg.width, cfg.height, cfg.ortho_scale, jnp.dtype(cfg.dtype)
        )
    return perspective_rays(camera, cfg.width, cfg.height, jnp.dtype(cfg.dtype))


def render_frame(scene: Scene, camera: Camera, cfg: RenderConfig):
    """Full frame: returns [height, width, 4] float image.

    Equivalent to one iteration of the reference's onUpdate/onRender
    (Graphics.cpp:40-61,663-831): rebuild the LBVH from scratch, launch
    primary rays, run ``cfg.bounces`` reflection passes, present.
    """
    wvp, wv = camera_matrices(camera, cfg.width, cfg.height)
    if cfg.camera_mode == "reference":
        bvh = build_bvh(scene, wvp, wv, cfg)
        rays = make_rays(camera, cfg)
    else:
        # world-space tracing: identity transform
        eye4 = jnp.eye(4, dtype=jnp.dtype(cfg.dtype))
        bvh = build_bvh(scene, eye4, eye4, cfg)
        rays = make_rays(camera, cfg)

    color = shade_rays(scene, bvh, rays, cfg)
    return color.reshape(cfg.height, cfg.width, 4)


def _shade_rays_one(scene: Scene, bvh: BVH, rays: Rays, cfg: RenderConfig):
    """launch + bounce chain (+ refraction) for one batch of rays."""
    color, refl, intensity, refr, refr_int = launch_full(scene, bvh, rays, cfg)
    for _ in range(cfg.bounces):
        color, refl, intensity = bounce(scene, bvh, color, refl, intensity, cfg)
    if cfg.enable_refraction:
        # the refraction chain starts from a white carrier color
        # (reference: RayTraceLaunch.hlsl:70 refrRay.color = 1,1,1,1) and
        # the final present blends it over the reflection result by the
        # primary transparency — the combine the reference's PS never got
        # (it reads only reflectRay, RayTraceBVHPS.hlsl:16, quirk Q4).
        w0 = refr_int
        # chain intensity starts at 1 (the spawn transparency is applied
        # once, in the final blend), so rcolor = "the color seen through
        # the surface"; deeper transparent hits recurse with their own
        # (1-alpha) via bounce_refract.
        chain_int = jnp.where(refr_int > 0.0, jnp.ones_like(refr_int), 0.0)
        rcolor = jnp.ones_like(color)
        for _ in range(cfg.bounces):
            rcolor, refr, chain_int = bounce_refract(
                scene, bvh, rcolor, refr, chain_int, cfg
            )
        color = color + w0[:, None] * (rcolor - color)
    return color


def shade_rays(scene: Scene, bvh: BVH, rays: Rays, cfg: RenderConfig):
    """The whole per-ray pipeline, optionally in sequential ray tiles.

    cfg.ray_chunk > 0 runs launch+bounces tile-by-tile under ``lax.map``
    so the live per-ray state (and, under autodiff, the saved residuals)
    never exceeds one tile — the reason the reference tiles its ray
    dispatch 15x15 (Graphics.cpp:788-792) is occupancy; ours is HBM:
    full-frame [R,...] temps at 1080p OOM the backward pass otherwise.
    """
    nrays = rays.origin.shape[0]
    if cfg.ray_chunk > 0 and nrays > cfg.ray_chunk:
        assert nrays % cfg.ray_chunk == 0, (
            f"ray_chunk {cfg.ray_chunk} must divide ray count {nrays}"
        )
        tiles = jax.tree_util.tree_map(
            lambda x: x.reshape(
                (nrays // cfg.ray_chunk, cfg.ray_chunk) + x.shape[1:]
            ),
            rays,
        )
        color = jax.lax.map(
            lambda r: _shade_rays_one(scene, bvh, r, cfg), tiles
        )
        return color.reshape(nrays, 4)
    return _shade_rays_one(scene, bvh, rays, cfg)


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_frame_jit(scene: Scene, camera: Camera, cfg: RenderConfig):
    return render_frame(scene, camera, cfg)
