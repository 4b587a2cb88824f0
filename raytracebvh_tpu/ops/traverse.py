"""Batched stackless BVH traversal with Moeller-Trumbore intersection.

The reference traverses with a per-thread 32-entry stack and a DFS loop
(reference: RayTraceTraversal.hlsl:106-193), re-transforming every leaf's
three vertices by WVP on *every visit* (RayTraceTraversal.hlsl:146-148,
quirk Q7).  On TPU both choices are wrong: per-lane stacks need dynamic
per-lane indexing (scatter/gather into scratch) and the re-transform wastes
bandwidth.

TPU-native design: all rays advance in lock-step through precomputed skip
links (see ops/bvh.py).  Each step is, for every live ray, a handful of
gathers by node id plus pure vector math:

    box hit & internal  -> entry_link (descend left-first)
    box hit & leaf      -> Moeller-Trumbore against the leaf triangle
                           (pre-gathered into leaf order), then skip_link
    box miss            -> skip_link (prune the subtree)

The visit order equals the reference's stack DFS whenever both children
are hit; only the "right-only" case costs one extra box test.  Rays finish
when they walk off the root's skip link (-1); finished lanes idle at node
-1 until the batch drains.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.types import BVH, HitRecord, Rays


def ray_box_hit(origin, inv_dir, bbmin, bbmax, has_hit, best_t):
    """Slab test (reference: RayTraceTraversal.hlsl:92-104), plus an
    explicit empty-box rejection (bbmin > bbmax) for padding leaves — the
    reference instead traverses garbage boxes (quirk Q2)."""
    dmin = (bbmin - origin) * inv_dir
    dmax = (bbmax - origin) * inv_dir
    lo = jnp.minimum(dmin, dmax)
    hi = jnp.maximum(dmin, dmax)
    tmin = jnp.max(lo, axis=-1)
    tmax = jnp.min(hi, axis=-1)
    nonempty = jnp.all(bbmin <= bbmax, axis=-1)
    hit = (0.0 <= tmax) & (tmin <= tmax) & nonempty
    # prune against the current nearest hit (reference: ...hlsl:103)
    return hit & (~has_hit | (tmin <= best_t))


def moller_trumbore(origin, direction, v0, v1, v2, epsilon):
    """Moeller-Trumbore (reference: RayTraceTraversal.hlsl:41-86).

    Returns distance, or -1 on miss — exactly the reference's contract,
    including the EPSILON determinant cutoff and min-distance.
    """
    edge1 = v1 - v0
    edge2 = v2 - v0
    pvec = jnp.cross(direction, edge2)
    det = jnp.sum(edge1 * pvec, axis=-1)
    # no-determinant cutoff (reference: :50-51)
    det_ok = jnp.abs(det) >= epsilon
    inv_det = jnp.where(det_ok, 1.0 / jnp.where(det_ok, det, 1.0), 0.0)
    tvec = origin - v0
    u = jnp.sum(tvec * pvec, axis=-1) * inv_det
    qvec = jnp.cross(tvec, edge1)
    v = jnp.sum(direction * qvec, axis=-1) * inv_det
    t = jnp.sum(edge2 * qvec, axis=-1) * inv_det
    ok = (
        det_ok
        & (u >= 0.0)
        & (u <= 1.0)
        & (v >= 0.0)
        & (u + v <= 1.0)
        & (t > epsilon)
    )
    return jnp.where(ok, t, -1.0)


def traverse(bvh: BVH, rays: Rays, epsilon: float, max_steps: int = 0) -> HitRecord:
    """Nearest-hit traversal for a batch of rays.

    Args:
      bvh: built BVH (ops/bvh.py) with leaf triangles pre-gathered.
      rays: [R] rays (flat).
      epsilon: Moeller-Trumbore epsilon (reference EPSILON .01).
      max_steps: safety cap on traversal steps (0 = 4n, an upper bound on
        skip-walk length: every node is entered at most once plus once
        skipped).

    Returns HitRecord with leaf ids into the BVH's leaf arrays
    (reference stores index/3 = face id in ColTri,
    RayTraceTraversal.hlsl:157; recover it as ``bvh.prim[leaf]``).
    """
    n = bvh.n_leaves
    root = jnp.int32(n)
    origin = rays.origin
    inv_dir = rays.inv_direction
    direction = rays.direction
    nrays = origin.shape[0]
    if max_steps <= 0:
        max_steps = 4 * n

    def cond(state):
        node, _, _, _, it = state
        return jnp.any(node >= 0) & (it < max_steps)

    def body(state):
        node, hit, dist, leaf, it = state
        live = node >= 0
        nid = jnp.maximum(node, 0)

        bmin = bvh.bbmin[nid]
        bmax = bvh.bbmax[nid]
        bhit = ray_box_hit(origin, inv_dir, bmin, bmax, hit, dist) & live

        is_leaf = nid < n
        # leaf triangle test (masked; padding leaves have prim == -1 and
        # empty boxes, so bhit already excludes them)
        lid = jnp.where(is_leaf, nid, 0)
        tri = bvh.tri_verts[lid]  # [R, 3, 3]
        t = moller_trumbore(
            origin, direction, tri[:, 0], tri[:, 1], tri[:, 2], epsilon
        )
        upd = (
            live
            & is_leaf
            & bhit
            & (t != -1.0)
            & (~hit | (t < dist))
        )
        dist = jnp.where(upd, t, dist)
        leaf = jnp.where(upd, nid, leaf)
        hit = hit | upd

        descend = bhit & ~is_leaf
        nxt = jnp.where(descend, bvh.entry_link[nid], bvh.skip_link[nid])
        node = jnp.where(live, nxt, node)
        return node, hit, dist, leaf, it + 1

    state = (
        jnp.full(nrays, root, jnp.int32),
        jnp.zeros(nrays, bool),
        jnp.zeros(nrays, origin.dtype),
        jnp.zeros(nrays, jnp.int32),
        jnp.int32(0),
    )
    _, hit, dist, leaf, _ = jax.lax.while_loop(cond, body, state)
    return HitRecord(hit=hit, distance=dist, leaf=leaf)
