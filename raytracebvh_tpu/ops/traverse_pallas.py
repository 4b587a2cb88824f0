"""Pallas TPU traversal megakernel.

Replaces the XLA while_loop traversal (ops/traverse.py) for the hot path.
Same algorithm — stackless skip-link walk with Moeller-Trumbore leaf tests
(reference semantics: RayTraceTraversal.hlsl:41-104,133-192) — but executed
entirely on-chip:

  * The whole BVH lives in VMEM as ONE channel-major table [16, 2n]:
      ch 0-5   bbmin.xyz, bbmax.xyz
      ch 6     links (entry|skip packed as two uint16 in one f32 pattern)
      ch 7-15  leaf triangle v0.xyz, e1.xyz, e2.xyz (leaf columns only —
               leaves are node ids 0..n-1; internal columns hold zeros)
    Edges are precomputed at build time — the reference re-derives them
    from re-transformed vertices on every leaf visit (quirk Q7).  One
    fused table means ONE gather per traversal step.
  * TPU's dynamic_gather shuffles within one 128-lane vreg, so a table
    gather decomposes into (width/128) in-tile shuffles combined by
    tile-id selects.  Per 128-ray output tile we compute the scalar
    min/max source tile actually referenced and predicate away the rest
    (pl.when) — coherent rays (primary rays, early steps) then touch only
    a handful of source tiles.  Idle/dead lanes follow a live
    representative so they never widen that range.
  * Rays run in tiles of ``block_rays``; each tile has its own while-loop,
    so a finished tile stops instead of idling until the slowest ray of
    the frame (the main cost of the XLA version, whose lock-step batch
    runs every iteration over every ray).

Padding-leaf validity needs no flag: padding leaves carry empty boxes
(bbmin > bbmax), which the slab test rejects, so they can never become
hits.

Correctness contract: identical hit/leaf results as ops/traverse.traverse
(verified in tests/test_traverse_pallas.py and on-device parity checks).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import BVH, HitRecord, Rays

LANES = 128
CHANNELS = 16


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _gather_cols(tbl, idx, width, scratch):
    """Gather columns ``idx`` [1, W] from channel-major ``tbl``
    [CHANNELS, width].

    Decomposed into in-vreg shuffles with per-output-tile source bounds:
    only source tiles in [min(tile_id), max(tile_id)] are touched.
    """
    c = tbl.shape[0]
    w = idx.shape[1]
    n_src = width // LANES
    tile_id = jax.lax.div(idx, LANES)
    lane_id = jax.lax.rem(idx, LANES)
    outs = []
    for ot in range(w // LANES):
        tb = jnp.broadcast_to(tile_id[:, ot * LANES:(ot + 1) * LANES], (c, LANES))
        lb = jnp.broadcast_to(lane_id[:, ot * LANES:(ot + 1) * LANES], (c, LANES))
        t_lo = jnp.min(tb)
        t_hi = jnp.max(tb)
        scratch[0:c, :] = jnp.zeros((c, LANES), tbl.dtype)
        for k in range(n_src):
            @pl.when(jnp.logical_and(t_lo <= k, k <= t_hi))
            def _(k=k, tb=tb, lb=lb):
                part = jnp.take_along_axis(
                    tbl[:, k * LANES:(k + 1) * LANES], lb, axis=1
                )
                scratch[0:c, :] = jnp.where(tb == k, part, scratch[0:c, :])
        outs.append(scratch[0:c, :])
    return jnp.concatenate(outs, axis=1) if len(outs) > 1 else outs[0]


def _unpack_links(bits_f32):
    """Decode (entry, skip) int32 from the packed f32 channel.

    Packed as entry | (skip << 16), each uint16 with 0xFFFF meaning -1."""
    bits = pltpu.bitcast(bits_f32, jnp.uint32)
    e = (bits & jnp.uint32(0xFFFF)).astype(jnp.int32)
    s = (bits >> 16).astype(jnp.int32)
    e = jnp.where(e == 0xFFFF, -1, e)
    s = jnp.where(s == 0xFFFF, -1, s)
    return e, s


def _traverse_kernel(
    node_ref, o_ref, d_ref, out_ref, *rest,
    n_leaves, node_width, epsilon, max_steps,
):
    # rest = (steps_ref, scratch) when a step-counter output is wired
    # (return_steps), else (scratch,)
    steps_ref = rest[0] if len(rest) == 2 else None
    scratch = rest[-1]
    node_tbl = node_ref[:]  # [CHANNELS, node_width]

    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    idx_ = 1.0 / dx
    idy_ = 1.0 / dy
    idz_ = 1.0 / dz

    w = ox.shape[1]
    root = jnp.full((1, w), n_leaves, jnp.int32)

    def cond(state):
        node, _, _, _, step, _ = state
        return jnp.logical_and(jnp.max(node) >= 0, step < max_steps)

    def body(state):
        node, hit, dist, leaf, step, stepv = state
        live = node >= 0
        # Idle lanes follow a live representative instead of parking at
        # node 0: _gather_cols prunes source tiles by the [min, max] of
        # the requested ids, and a parked 0 would drag every gather's
        # range down to tile 0.
        rep = jnp.min(jnp.where(live, node, jnp.int32(2 * n_leaves - 1)))
        nid = jnp.where(live, node, rep)
        nid = jnp.maximum(nid, 0)  # all-dead tile: rep clamp

        row = _gather_cols(node_tbl, nid, node_width, scratch)  # [16, w]
        bminx, bminy, bminz = row[0:1], row[1:2], row[2:3]
        bmaxx, bmaxy, bmaxz = row[3:4], row[4:5], row[5:6]
        entry, skip = _unpack_links(row[6:7])

        # slab test (reference: RayTraceTraversal.hlsl:92-104); empty boxes
        # (padding leaves) fail the bminx <= bmaxx check
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
        hitb = hit > 0
        bhit = (0.0 <= tmax) & (tmin <= tmax) & nonempty
        bhit = bhit & (jnp.logical_not(hitb) | (tmin <= dist)) & live

        is_leaf = nid < n_leaves

        # Moeller-Trumbore against the leaf triangle, channels 7-15 of the
        # same gathered row (reference: RayTraceTraversal.hlsl:41-86)
        v0x, v0y, v0z = row[7:8], row[8:9], row[9:10]
        e1x, e1y, e1z = row[10:11], row[11:12], row[12:13]
        e2x, e2y, e2z = row[13:14], row[14:15], row[15:16]

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
        tri_hit = (
            det_ok
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > epsilon)
        )

        upd = (
            live & is_leaf & bhit & tri_hit
            & (jnp.logical_not(hitb) | (t < dist))
        )
        dist = jnp.where(upd, t, dist)
        leaf = jnp.where(upd, nid, leaf)
        hit = jnp.where(upd, 1, hit)

        descend = bhit & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, entry, skip)
        node = jnp.where(live, nxt, node)
        # the vector counter adds hit+1-hit instead of a literal 1:
        # Mosaic constant-folded a plain `stepv + 1.0` accumulator to
        # its first iteration on device (read back 1 everywhere)
        one = (hit - hit) + 1
        return node, hit, dist, leaf, step + 1, stepv + one.astype(stepv.dtype)

    state = (
        root,
        jnp.zeros((1, w), jnp.int32),  # hit flag (int32: Mosaic lacks i1 carries)
        jnp.zeros((1, w), jnp.float32),
        jnp.zeros((1, w), jnp.int32),
        jnp.int32(0),  # scalar step bound (cond)
        jnp.zeros((1, w), jnp.float32),  # per-lane f32 step counter
    )
    node, hit, dist, leaf, step, stepv = jax.lax.while_loop(
        cond, body, state)
    out_ref[0:1, :] = dist
    out_ref[1:2, :] = pltpu.bitcast(leaf, jnp.float32)
    out_ref[2:3, :] = pltpu.bitcast(hit, jnp.float32)
    if steps_ref is not None:  # per-tile micro-step count (utilization
        # accounting, like the hbm refill kernel's stepc) — a dedicated
        # single-row f32 output (appended rows on the 3-row block land
        # in sublane padding on device; int vector carries misfold)
        steps_ref[0:1, :] = stepv


def _traverse_any_kernel(
    node_ref, o_ref, d_ref, tmax_ref, out_ref, scratch,
    *, n_leaves, node_width, epsilon, max_steps,
):
    """Any-hit (occlusion) walk: like ``_traverse_kernel`` but with no
    nearest-hit bookkeeping, a per-ray max distance, and per-lane early
    exit the moment any triangle is hit (shadow-ray semantics; the
    reference's loop RayTraceTraversal.hlsl:106-193 is the nearest-hit
    superset of this)."""
    node_tbl = node_ref[:]

    ox, oy, oz = o_ref[0:1, :], o_ref[1:2, :], o_ref[2:3, :]
    dx, dy, dz = d_ref[0:1, :], d_ref[1:2, :], d_ref[2:3, :]
    ray_tmax = tmax_ref[0:1, :]
    idx_ = 1.0 / dx
    idy_ = 1.0 / dy
    idz_ = 1.0 / dz

    w = ox.shape[1]
    root = jnp.full((1, w), n_leaves, jnp.int32)

    def cond(state):
        node, _, step = state
        return jnp.logical_and(jnp.max(node) >= 0, step < max_steps)

    def body(state):
        node, occ, step = state
        live = node >= 0
        rep = jnp.min(jnp.where(live, node, jnp.int32(2 * n_leaves - 1)))
        nid = jnp.where(live, node, rep)
        nid = jnp.maximum(nid, 0)

        row = _gather_cols(node_tbl, nid, node_width, scratch)
        bminx, bminy, bminz = row[0:1], row[1:2], row[2:3]
        bmaxx, bmaxy, bmaxz = row[3:4], row[4:5], row[5:6]
        entry, skip = _unpack_links(row[6:7])

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
        bhit = (
            (0.0 <= tmax) & (tmin <= tmax) & nonempty
            & (tmin <= ray_tmax) & live
        )

        is_leaf = nid < n_leaves

        v0x, v0y, v0z = row[7:8], row[8:9], row[9:10]
        e1x, e1y, e1z = row[10:11], row[11:12], row[12:13]
        e2x, e2y, e2z = row[13:14], row[14:15], row[15:16]
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
        tri_hit = (
            det_ok
            & (u >= 0.0)
            & (u <= 1.0)
            & (v >= 0.0)
            & (u + v <= 1.0)
            & (t > epsilon)
            & (t < ray_tmax)
        )

        found = live & is_leaf & bhit & tri_hit
        occ = jnp.where(found, 1, occ)

        descend = bhit & jnp.logical_not(is_leaf)
        nxt = jnp.where(descend, entry, skip)
        # early exit: occluded lanes leave the walk now
        node = jnp.where(live & jnp.logical_not(found), nxt, jnp.int32(-1))
        return node, occ, step + 1

    state = (root, jnp.zeros((1, w), jnp.int32), jnp.int32(0))
    _, occ, _ = jax.lax.while_loop(cond, body, state)
    out_ref[0:1, :] = pltpu.bitcast(occ, jnp.float32)


def traverse_any_pallas(
    bvh: BVH,
    rays: Rays,
    epsilon: float,
    max_t,
    max_steps: int = 0,
    block_rays: int = 1024,
    interpret: bool | None = None,
):
    """Any-hit traversal: [R] bool, True where some triangle lies at
    distance in (epsilon, max_t) along the ray.  Pallas counterpart of
    ops.traverse.traverse_any (parity-tested)."""
    n = bvh.n_leaves
    if max_steps <= 0:
        max_steps = 4 * n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    node_tbl = pack_tables(bvh)
    node_width = node_tbl.shape[1]

    nrays = rays.origin.shape[0]
    rpad = _round_up(nrays, block_rays)
    origin = jnp.zeros((3, rpad), jnp.float32).at[:, :nrays].set(
        rays.origin.astype(jnp.float32).T
    )
    direction = jnp.ones((3, rpad), jnp.float32).at[:, :nrays].set(
        rays.direction.astype(jnp.float32).T
    )
    # padding rays get tmax -1: they can never hit anything
    tmax = jnp.full((1, rpad), -1.0, jnp.float32).at[0, :nrays].set(
        jnp.asarray(max_t, jnp.float32)
    )

    kernel = functools.partial(
        _traverse_any_kernel,
        n_leaves=n,
        node_width=node_width,
        epsilon=epsilon,
        max_steps=max_steps,
    )
    grid = (rpad // block_rays,)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHANNELS, node_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((1, rpad), jnp.float32),
        scratch_shapes=[pltpu.VMEM((CHANNELS, LANES), jnp.float32)],
        interpret=interpret,
    )(node_tbl, origin, direction, tmax)

    return jax.lax.bitcast_convert_type(out[0, :nrays], jnp.int32) > 0


def _pack_u16_pair(lo, hi):
    """Two int32 arrays with values in [-1, 65535) -> one f32 bit pattern."""
    lo_u = jnp.where(lo < 0, 0xFFFF, lo).astype(jnp.uint32)
    hi_u = jnp.where(hi < 0, 0xFFFF, hi).astype(jnp.uint32)
    return jax.lax.bitcast_convert_type(lo_u | (hi_u << 16), jnp.float32)


def pack_tables(bvh: BVH):
    """Build the fused channel-major VMEM table [16, width] (f32)."""
    n = bvh.n_leaves
    assert 2 * n < 0xFFFF, "u16 link packing limits the BVH to 32767 leaves"
    node_width = _round_up(2 * n, LANES)

    f32 = jnp.float32
    bbmin = bvh.bbmin.astype(f32)
    bbmax = bvh.bbmax.astype(f32)
    links = _pack_u16_pair(bvh.entry_link, bvh.skip_link)

    v0 = bvh.tri_verts[:, 0].astype(f32)
    e1 = (bvh.tri_verts[:, 1] - bvh.tri_verts[:, 0]).astype(f32)
    e2 = (bvh.tri_verts[:, 2] - bvh.tri_verts[:, 0]).astype(f32)

    def leafpad(x):  # leaf columns carry tri data; internal columns zero
        return jnp.zeros(2 * n, f32).at[:n].set(x)

    node_tbl = jnp.zeros((CHANNELS, node_width), f32)
    node_tbl = node_tbl.at[:, : 2 * n].set(
        jnp.stack(
            [
                bbmin[:, 0], bbmin[:, 1], bbmin[:, 2],
                bbmax[:, 0], bbmax[:, 1], bbmax[:, 2],
                links,
                leafpad(v0[:, 0]), leafpad(v0[:, 1]), leafpad(v0[:, 2]),
                leafpad(e1[:, 0]), leafpad(e1[:, 1]), leafpad(e1[:, 2]),
                leafpad(e2[:, 0]), leafpad(e2[:, 1]), leafpad(e2[:, 2]),
            ]
        )
    )
    return node_tbl


def traverse_pallas(
    bvh: BVH,
    rays: Rays,
    epsilon: float,
    max_steps: int = 0,
    block_rays: int = 1024,
    interpret: bool | None = None,
    return_steps: bool = False,
) -> HitRecord:
    """Drop-in replacement for ops.traverse.traverse (f32 only).

    ``interpret`` defaults to True off-TPU so the kernel is testable on
    the CPU mesh.  ``return_steps=True`` additionally returns the
    [ntiles] per-block micro-step counts (utilization accounting in
    bench.py, mirroring traverse_hbm_pallas)."""
    n = bvh.n_leaves
    if max_steps <= 0:
        max_steps = 4 * n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    node_tbl = pack_tables(bvh)
    node_width = node_tbl.shape[1]

    nrays = rays.origin.shape[0]
    rpad = _round_up(nrays, block_rays)
    origin = jnp.zeros((3, rpad), jnp.float32).at[:, :nrays].set(
        rays.origin.astype(jnp.float32).T
    )
    # padding rays get direction (1,1,1) to avoid inf/nan inv-direction
    direction = jnp.ones((3, rpad), jnp.float32).at[:, :nrays].set(
        rays.direction.astype(jnp.float32).T
    )

    kernel = functools.partial(
        _traverse_kernel,
        n_leaves=n,
        node_width=node_width,
        epsilon=epsilon,
        max_steps=max_steps,
    )
    grid = (rpad // block_rays,)
    out_specs = pl.BlockSpec(
        (3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM
    )
    out_shape = jax.ShapeDtypeStruct((3, rpad), jnp.float32)
    if return_steps:
        out_specs = (out_specs, pl.BlockSpec(
            (1, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM))
        out_shape = (out_shape,
                     jax.ShapeDtypeStruct((1, rpad), jnp.float32))
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHANNELS, node_width), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((3, block_rays), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((CHANNELS, LANES), jnp.float32)],
        interpret=interpret,
    )(node_tbl, origin, direction)

    if return_steps:
        out, steps_row = out
    dist = out[0, :nrays]
    leaf = jax.lax.bitcast_convert_type(out[1, :nrays], jnp.int32)
    hit = jax.lax.bitcast_convert_type(out[2, :nrays], jnp.int32) > 0
    rec = HitRecord(hit=hit, distance=dist, leaf=leaf)
    if return_steps:
        steps = steps_row[0].reshape(
            rpad // block_rays, block_rays)[:, 0].astype(jnp.int32)
        return rec, steps
    return rec
