"""Rank-sweep Pallas traversal: monotone pre-order column sweep, no gathers.

The third traversal backend, built for LARGE BVHs (BASELINE config 5,
100k+ triangles) where the per-lane row gather of ``traverse_pallas`` /
``traverse_pre_pallas`` collapses: those kernels fetch a node row per ray
per step, and the in-vreg shuffle decomposition pays for every 128-lane
source tile between the min and max node id in the tile — hundreds of
tiles once rays diverge in a big tree.

Key property exploited here: in DFS pre-order rank space the skip-link
walk is *strictly monotone* — descend is ``rank+1`` and every skip target
has a larger rank, so each ray visits ranks in increasing order.  A whole
ray tile can therefore sweep the tree ONCE, front to back:

    k = min over live lanes of their current rank
    process column k for the lanes sitting at it (slab test; Moeller-
    Trumbore if k is a leaf), advance them, repeat.

Per step that is ONE 128-aligned dynamic slice of the channel-major node
table plus one constant-index lane splat — no per-lane gather at all, and
the work per tile is bounded by the size of the *union* of the lanes'
paths (<= 2n, and close to one ray's path for coherent tiles), not by
(steps x divergence-range) like the gather kernels.

Tables are the pre-order tables of ``traverse_pallas.pack_tables_preorder``
(box_tbl [8, 2n]: bbox, skip rank, original id; tri_tbl [9, n]: v0/e1/e2),
so this backend shares their VMEM budget (~10 MB at 100k tris) and their
build-side cost.  Algorithm semantics are the reference's traversal loop
(RayTraceTraversal.hlsl:41-104,133-192): slab test, nearest-hit
Moeller-Trumbore, identical hit records (parity-tested against
ops/traverse.traverse).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import BVH, HitRecord, Rays
from .traverse_pallas import LANES, _round_up, pack_tables_preorder


def _splat_col(tbl_ref, c, k, w):
    """[c, w] where every lane holds channel ch of column ``k`` of the
    channel-major table ref ``tbl_ref`` [c, width] (VMEM).

    One 128-aligned dynamic VMEM load + one constant-lane shuffle; tiled
    out to ``w`` lanes by cheap vreg copies when w > 128."""
    kt = jax.lax.div(k, LANES) * LANES
    kl = jax.lax.rem(k, LANES)
    block = tbl_ref[:, pl.ds(pl.multiple_of(kt, LANES), LANES)]  # [c, 128]
    idx = jnp.full((c, LANES), kl, jnp.int32)
    splat = jnp.take_along_axis(block, idx, axis=1)  # all lanes = col k
    if w > LANES:
        splat = jnp.concatenate([splat] * (w // LANES), axis=1)
    return splat


def _slab(row, ox, oy, oz, idx_, idy_, idz_):
    """Slab test of every lane's ray against the (splatted) box in
    ``row`` channels 0-5.  Empty boxes (bmin > bmax) never hit."""
    bminx, bminy, bminz = row[0:1], row[1:2], row[2:3]
    bmaxx, bmaxy, bmaxz = row[3:4], row[4:5], row[5:6]
    t0x = (bminx - ox) * idx_
    t1x = (bmaxx - ox) * idx_
    t0y = (bminy - oy) * idy_
    t1y = (bmaxy - oy) * idy_
    t0z = (bminz - oz) * idz_
    t1z = (bmaxz - oz) * idz_
    tmin = jnp.maximum(
        jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
        jnp.minimum(t0z, t1z),
    )
    tmax = jnp.minimum(
        jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
        jnp.maximum(t0z, t1z),
    )
    nonempty = bminx <= bmaxx
    return tmin, (0.0 <= tmax) & (tmin <= tmax) & nonempty


def _mt(trow, ox, oy, oz, dx, dy, dz, epsilon):
    """Moeller-Trumbore of every lane's ray against the splatted triangle
    (v0/e1/e2 in trow channels 0-8).  Returns (t, ok)."""
    v0x, v0y, v0z = trow[0:1], trow[1:2], trow[2:3]
    e1x, e1y, e1z = trow[3:4], trow[4:5], trow[5:6]
    e2x, e2y, e2z = trow[6:7], trow[7:8], trow[8:9]
    px = dy * e2z - dz * e2y
    py = dz * e2x - dx * e2z
    pz = dx * e2y - dy * e2x
    det = e1x * px + e1y * py + e1z * pz
    det_ok = jnp.abs(det) >= epsilon
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvx, tvy, tvz = ox - v0x, oy - v0y, oz - v0z
    u = (tvx * px + tvy * py + tvz * pz) * inv_det
    qx = tvy * e1z - tvz * e1y
    qy = tvz * e1x - tvx * e1z
    qz = tvx * e1y - tvy * e1x
    v = (dx * qx + dy * qy + dz * qz) * inv_det
    t = (e2x * qx + e2y * qy + e2z * qz) * inv_det
    ok = (
        det_ok
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > epsilon)
    )
    return t, ok


def _sweep_kernel(
    box_ref, tri_ref, o_ref, d_ref, out_ref,
    *, n_leaves, epsilon, max_steps,
):
    two_n = 2 * n_leaves

    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    idx_ = 1.0 / dx
    idy_ = 1.0 / dy
    idz_ = 1.0 / dz

    w = ox.shape[1]

    def cond(state):
        _, _, _, _, k, step = state
        return jnp.logical_and(k < two_n, step < max_steps)

    def body(state):
        node, hit, dist, leaf, k, step = state
        active = node == k

        row = _splat_col(box_ref, 8, k, w)
        skipr = pltpu.bitcast(row[6:7], jnp.int32)
        skipr = jnp.where(skipr < 0, two_n, skipr)
        orig = pltpu.bitcast(row[7:8], jnp.int32)

        tmin, bhit0 = _slab(row, ox, oy, oz, idx_, idy_, idz_)
        hitb = hit > 0
        bhit = bhit0 & (jnp.logical_not(hitb) | (tmin <= dist)) & active

        is_leaf_v = orig < n_leaves
        # the column's id is the same in every lane; lane 0 gives the
        # scalar that decides whether this step needs the triangle table
        orig_s = orig[0, 0]
        at_leaf = bhit & is_leaf_v

        def leaf_fn(_):
            trow = _splat_col(tri_ref, 9, orig_s, w)
            return _mt(trow, ox, oy, oz, dx, dy, dz, epsilon)

        def no_leaf_fn(_):
            return jnp.zeros((1, w), jnp.float32), jnp.zeros((1, w), jnp.bool_)

        t, tri_ok = jax.lax.cond(
            jnp.logical_and(orig_s < n_leaves, jnp.any(at_leaf)),
            leaf_fn, no_leaf_fn, None,
        )

        upd = at_leaf & tri_ok & (jnp.logical_not(hitb) | (t < dist))
        dist = jnp.where(upd, t, dist)
        leaf = jnp.where(upd, orig, leaf)
        hit = jnp.where(upd, 1, hit)

        # monotone advance: descend (internal box hit) = k+1, everything
        # else (miss, or leaf just tested) = the column's skip rank
        nxt = jnp.where(bhit & jnp.logical_not(is_leaf_v), k + 1, skipr)
        node = jnp.where(active, nxt, node)
        return node, hit, dist, leaf, jnp.min(node), step + 1

    state = (
        jnp.zeros((1, w), jnp.int32),  # every lane starts at rank 0 (root)
        jnp.zeros((1, w), jnp.int32),
        jnp.zeros((1, w), jnp.float32),
        jnp.zeros((1, w), jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
    )
    _, hit, dist, leaf, _, _ = jax.lax.while_loop(cond, body, state)
    out_ref[0:1, :] = dist
    out_ref[1:2, :] = pltpu.bitcast(leaf, jnp.float32)
    out_ref[2:3, :] = pltpu.bitcast(hit, jnp.float32)


def _sweep_any_kernel(
    box_ref, tri_ref, o_ref, d_ref, tmax_ref, out_ref,
    *, n_leaves, epsilon, max_steps,
):
    """Any-hit sweep (occlusion query): no nearest-hit bookkeeping, lanes
    leave the sweep on their first confirmed hit."""
    two_n = 2 * n_leaves

    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    ray_tmax = tmax_ref[0:1, :]
    idx_ = 1.0 / dx
    idy_ = 1.0 / dy
    idz_ = 1.0 / dz

    w = ox.shape[1]

    def cond(state):
        _, _, k, step = state
        return jnp.logical_and(k < two_n, step < max_steps)

    def body(state):
        node, occ, k, step = state
        active = node == k

        row = _splat_col(box_ref, 8, k, w)
        skipr = pltpu.bitcast(row[6:7], jnp.int32)
        skipr = jnp.where(skipr < 0, two_n, skipr)
        orig = pltpu.bitcast(row[7:8], jnp.int32)

        tmin, bhit0 = _slab(row, ox, oy, oz, idx_, idy_, idz_)
        bhit = bhit0 & (tmin <= ray_tmax) & active

        is_leaf_v = orig < n_leaves
        orig_s = orig[0, 0]
        at_leaf = bhit & is_leaf_v

        def leaf_fn(_):
            trow = _splat_col(tri_ref, 9, orig_s, w)
            t, ok = _mt(trow, ox, oy, oz, dx, dy, dz, epsilon)
            return ok & (t < ray_tmax)

        tri_ok = jax.lax.cond(
            jnp.logical_and(orig_s < n_leaves, jnp.any(at_leaf)),
            leaf_fn, lambda _: jnp.zeros((1, w), jnp.bool_), None,
        )

        found = at_leaf & tri_ok
        occ = jnp.where(found, 1, occ)

        nxt = jnp.where(bhit & jnp.logical_not(is_leaf_v), k + 1, skipr)
        nxt = jnp.where(found, two_n, nxt)  # early exit on first hit
        node = jnp.where(active, nxt, node)
        return node, occ, jnp.min(node), step + 1

    state = (
        jnp.zeros((1, w), jnp.int32),
        jnp.zeros((1, w), jnp.int32),
        jnp.int32(0),
        jnp.int32(0),
    )
    _, occ, _, _ = jax.lax.while_loop(cond, body, state)
    out_ref[0:1, :] = pltpu.bitcast(occ, jnp.float32)


def _prep_rays(rays: Rays, block_rays: int):
    nrays = rays.origin.shape[0]
    rpad = _round_up(nrays, block_rays)
    origin = jnp.full((3, rpad), 1.0e30, jnp.float32).at[:, :nrays].set(
        rays.origin.astype(jnp.float32).T
    )
    # padding rays: origin far outside every box, direction (1,1,1)
    direction = jnp.ones((3, rpad), jnp.float32).at[:, :nrays].set(
        rays.direction.astype(jnp.float32).T
    )
    return origin, direction, nrays, rpad


def traverse_sweep_pallas(
    bvh: BVH,
    rays: Rays,
    epsilon: float,
    max_steps: int = 0,
    block_rays: int = 256,
    interpret: bool | None = None,
) -> HitRecord:
    """Nearest-hit traversal by monotone rank sweep (see module doc).

    Same contract as ops.traverse.traverse / traverse_pallas; built for
    BVHs beyond a few tens of thousands of leaves."""
    n = bvh.n_leaves
    if max_steps <= 0:
        max_steps = 4 * n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    box_tbl, tri_tbl = pack_tables_preorder(bvh)
    box_width = box_tbl.shape[1]
    tri_width = tri_tbl.shape[1]

    origin, direction, nrays, rpad = _prep_rays(rays, block_rays)

    kernel = functools.partial(
        _sweep_kernel,
        n_leaves=n,
        epsilon=epsilon,
        max_steps=max_steps,
    )
    grid = (rpad // block_rays,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, box_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tri_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((3, rpad), jnp.float32),
        interpret=interpret,
    )(box_tbl, tri_tbl, origin, direction)

    dist = out[0, :nrays]
    leaf = jax.lax.bitcast_convert_type(out[1, :nrays], jnp.int32)
    hit = jax.lax.bitcast_convert_type(out[2, :nrays], jnp.int32) > 0
    return HitRecord(hit=hit, distance=dist, leaf=leaf)


def traverse_any_sweep_pallas(
    bvh: BVH,
    rays: Rays,
    epsilon: float,
    max_t,
    max_steps: int = 0,
    block_rays: int = 256,
    interpret: bool | None = None,
):
    """Any-hit rank-sweep traversal: [R] bool occlusion mask."""
    n = bvh.n_leaves
    if max_steps <= 0:
        max_steps = 4 * n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    box_tbl, tri_tbl = pack_tables_preorder(bvh)
    box_width = box_tbl.shape[1]
    tri_width = tri_tbl.shape[1]

    origin, direction, nrays, rpad = _prep_rays(rays, block_rays)
    tmax = jnp.full((1, rpad), -1.0, jnp.float32).at[0, :nrays].set(
        jnp.asarray(max_t, jnp.float32)
    )

    kernel = functools.partial(
        _sweep_any_kernel,
        n_leaves=n,
        epsilon=epsilon,
        max_steps=max_steps,
    )
    grid = (rpad // block_rays,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((8, box_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((9, tri_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rays), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, rpad), jnp.float32),
        interpret=interpret,
    )(box_tbl, tri_tbl, origin, direction, tmax)

    return jax.lax.bitcast_convert_type(out[0, :nrays], jnp.int32) > 0
