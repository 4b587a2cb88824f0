"""HBM-resident windowed rank-sweep traversal.

The large-scene traversal backend.  Two problems with the VMEM kernels
(ops/traverse_pallas.py, ops/traverse_sweep.py) at 100k+ triangles:

  * capacity: they pin the whole node table in VMEM (~150k-leaf ceiling);
    the reference's tree lives in a GPU UAV with no such cap
    (reference: RayTraceGlobal.hlsl:113).
  * speed: the per-lane gather kernels decompose every step's gather over
    the full divergence range of the tile (measured 0.02 Mrays/s at 102k
    tris), and the plain column sweep pays one step per *union* column.

Design here:

  * The BVH is ONE fused channel-major table [17, Wb] in **HBM**, laid
    out in DFS pre-order rank space (ops/bvh.preorder_ranks):
      ch 0-5   bbmin.xyz / bbmax.xyz
      ch 6     skip rank (int32 bits; -1 = walk done)
      ch 7     original node id (int32 bits; < n -> leaf)
      ch 8-16  leaf triangle v0/e1/e2 (leaf columns only; zeros else)
    In rank space descend is ``rank+1`` and every other move strictly
    increases rank, so a ray's column accesses are monotone.

  * Rays run in blocks laid out (S, 128) — full 8x128 vregs, not the
    (1, w) rows of the older kernels (which use 1 of 8 sublanes).

  * The tile sweeps the tree front-to-back through a VMEM **window** of
    ``win`` consecutive ranks, double-buffered: while the tile drains
    window w, the DMA engine prefetches w+win (sequential prediction;
    a skip past the prediction pays one blocking re-fetch).  Total HBM
    traffic per ray tile = the windows its rays' paths touch — nothing
    else — and VMEM holds only 2 windows (~270 KB), so scene size is
    bounded by HBM, not VMEM.

  * Within a window, each micro-step serves the 128-rank *subtile*
    holding the minimum live rank: one VMEM slice [17, 128], one
    sublane-broadcast + lane-shuffle per channel, slab test + Moeller-
    Trumbore, advance.  Lanes in later subtiles wait (their turn comes,
    monotonically); there is no per-lane gather across the tree, ever.

Algorithm semantics are the reference's traversal
(reference: RayTraceTraversal.hlsl:41-104,133-192): slab test, nearest-
hit Moeller-Trumbore, identical hit records — parity-tested against
ops/traverse.traverse (tests/test_traverse_hbm.py, tests/test_tpu_device.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import BVH, HitRecord, Rays

LANES = 128
CH = 17  # 6 box + skip + orig + 9 tri
CHP = 24  # sublane-padded channel count: DMA slices need dim0 % 8 == 0
BIGBOX = 1.0e30


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_table_rank17(bvh: BVH, win: int = 1024):
    """The fused rank-space node table, window/subtile-major
    ``[nw, win/128, CHP, 128]`` (see module doc for the channel layout).

    Built with the SoA fast path: one 1-D scatter inverts the rank
    permutation, then every channel is a 1-D gather.  The 4-D layout puts
    every dynamic index the kernel ever takes (window id for the DMA,
    subtile id for the micro-step slice) on an UNTILED leading dimension —
    Mosaic rejects dynamic offsets in the tiled (sublane/lane) dims of an
    HBM memref slice unless provably 128-aligned, which runtime values
    like ``w0 = min(rank) // win * win`` are not.
    """
    from .bvh import preorder_ranks

    n = bvh.n_leaves
    two_n = 2 * n
    wb = _round_up(two_n, win)
    f32 = jnp.float32

    ids = jnp.arange(two_n, dtype=jnp.int32)
    # the build precomputes ranks with one 2-key sort
    # (ops/bvh.preorder_ranks_from_ranges); entry-link pointer doubling
    # is the fallback for hand-built BVHs
    rank = (bvh.rank if bvh.rank is not None
            else preorder_ranks(bvh.entry_link, n))  # [2n]
    # inv[r] = node id at pre-order rank r
    inv = jnp.zeros(two_n, jnp.int32).at[rank].set(ids)

    skip = bvh.skip_link
    skip_rank = jnp.where(skip < 0, -1, rank[jnp.maximum(skip, 0)])
    # the unused topology slot (id 2n-1, pinned to rank 2n-1) gets an
    # empty box + done-skip so it is harmless even if ever visited
    unused = ids == (two_n - 1)

    v0 = bvh.tri_verts[:, 0].astype(f32)
    e1 = (bvh.tri_verts[:, 1] - bvh.tri_verts[:, 0]).astype(f32)
    e2 = (bvh.tri_verts[:, 2] - bvh.tri_verts[:, 0]).astype(f32)

    def leafpad(x):  # [n] leaf data -> [2n] (internal columns zero)
        return jnp.zeros(two_n, f32).at[:n].set(x)

    # id-space node rows [2n, 24] — all elementwise — then ONE row gather
    # by inv permutes them into rank space (17 separate per-channel
    # gathers measured 34 ms at 131k leaves; the row form ~8 ms: XLA TPU
    # gathers pay per-row, not per-byte)
    unused_c = unused[:, None]
    idrows = jnp.concatenate(
        [
            jnp.where(unused_c, BIGBOX, bvh.bbmin.astype(f32)),
            jnp.where(unused_c, -BIGBOX, bvh.bbmax.astype(f32)),
            jax.lax.bitcast_convert_type(
                jnp.where(unused, -1, skip_rank), f32)[:, None],
            jax.lax.bitcast_convert_type(ids, f32)[:, None],
            leafpad(v0[:, 0])[:, None], leafpad(v0[:, 1])[:, None],
            leafpad(v0[:, 2])[:, None],
            leafpad(e1[:, 0])[:, None], leafpad(e1[:, 1])[:, None],
            leafpad(e1[:, 2])[:, None],
            leafpad(e2[:, 0])[:, None], leafpad(e2[:, 1])[:, None],
            leafpad(e2[:, 2])[:, None],
            jnp.zeros((two_n, CHP - CH), f32),  # sublane padding channels
        ],
        axis=1,
    )  # [2n, CHP]
    ranked = idrows[inv]  # [2n, CHP] in rank order
    # padding ranks [2n, wb): empty boxes, skip=-1 (never visited)
    pad_row = jnp.array(
        [BIGBOX] * 3 + [-BIGBOX] * 3
        + [jax.lax.bitcast_convert_type(jnp.int32(-1), f32), 0.0]
        + [0.0] * 9
        + [0.0] * (CHP - CH), f32,
    )
    tbl = jnp.broadcast_to(pad_row[None, :], (wb, CHP))
    tbl = tbl.at[:two_n, :].set(ranked)
    # (wi*win + k*128 + l, c) -> (wi, k, c, l)
    k = win // LANES
    return tbl.reshape(wb // win, k, LANES, CHP).transpose(0, 1, 3, 2)


def _splat(sub, lane, s):
    """Every (sublane, lane) picks column ``lane[s,l]`` of the [17, 128]
    VMEM slice ``sub``: one sublane broadcast + one in-vreg lane shuffle
    per channel."""
    return [
        jnp.take_along_axis(
            jnp.broadcast_to(sub[c:c + 1, :], (s, LANES)), lane, axis=1
        )
        for c in range(CH)
    ]


def _slab_mt(row, ox, oy, oz, dx, dy, dz, idx_, idy_, idz_, epsilon):
    """Slab test on channels 0-5 + Moeller-Trumbore on channels 8-16
    (reference: RayTraceTraversal.hlsl:41-104).  Internal/padding columns
    carry zero triangles -> det 0 -> tri_ok False."""
    bminx, bminy, bminz, bmaxx, bmaxy, bmaxz = row[0:6]
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
    box_ok = (0.0 <= tmax) & (tmin <= tmax) & (bminx <= bmaxx)

    v0x, v0y, v0z, e1x, e1y, e1z, e2x, e2y, e2z = row[8:17]
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
    tri_ok = (
        det_ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
        & (t > epsilon)
    )
    return tmin, box_ok, t, tri_ok


def _make_kernel(any_hit, *, n_leaves, wb, win, s, epsilon, max_steps):
    """Shared windowed-sweep kernel body; ``any_hit`` switches between
    nearest-hit and first-hit (occlusion) semantics."""
    two_n = 2 * n_leaves
    done = wb  # rank sentinel for finished lanes

    def kernel(*refs):
        if any_hit:
            tbl_hbm, o_ref, d_ref, tmax_ref, out_ref, wbuf, sem = refs
            ray_tmax = tmax_ref[0, 0]
        else:
            tbl_hbm, o_ref, d_ref, out_ref, wbuf, sem = refs

        ox, oy, oz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]
        dx, dy, dz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
        idx_ = 1.0 / dx
        idy_ = 1.0 / dy
        idz_ = 1.0 / dz

        def dma(slot, w0):
            # w0 is always a multiple of win; the copy indexes the table
            # by window id — an untiled leading dim, any dynamic value ok
            return pltpu.make_async_copy(
                tbl_hbm.at[w0 // win], wbuf.at[slot], sem.at[slot]
            )

        # warm-up: every lane starts at rank 0, so window 0 first
        dma(0, 0).start()
        dma(0, 0).wait()

        def micro(state):
            """One subtile step: serve lanes in the 128-rank subtile
            holding the minimum in-window rank."""
            node, hit, dist, leaf, w0, slot, step = state
            in_win = (node >= w0) & (node < w0 + win)
            offw = jnp.where(in_win, node - w0, win)  # win = +inf marker
            k0 = jnp.min(offw) // LANES  # scalar: subtile of min rank
            off = offw - k0 * LANES
            active = in_win & (off >= 0) & (off < LANES)
            lane = jnp.clip(off, 0, LANES - 1)

            sub = wbuf[slot, k0]  # [24, 128] — untiled leading indices
            row = _splat(sub, lane, s)
            skipr = pltpu.bitcast(row[6], jnp.int32)
            skipr = jnp.where(skipr < 0, done, skipr)
            orig = pltpu.bitcast(row[7], jnp.int32)
            is_leaf = orig < n_leaves

            tmin, box_ok, t, tri_ok = _slab_mt(
                row, ox, oy, oz, dx, dy, dz, idx_, idy_, idz_, epsilon
            )

            if any_hit:
                occ = hit
                bhit = box_ok & (tmin <= ray_tmax) & active
                found = bhit & is_leaf & tri_ok & (t < ray_tmax)
                occ = jnp.where(found, 1, occ)
                nxt = jnp.where(bhit & jnp.logical_not(is_leaf),
                                node + 1, skipr)
                nxt = jnp.where(found, done, nxt)  # early exit
                node = jnp.where(active, nxt, node)
                return node, occ, dist, leaf, w0, slot, step + 1
            else:
                hitb = hit > 0
                bhit = (
                    box_ok
                    & (jnp.logical_not(hitb) | (tmin <= dist)) & active
                )
                upd = (
                    bhit & is_leaf & tri_ok
                    & (jnp.logical_not(hitb) | (t < dist))
                )
                dist = jnp.where(upd, t, dist)
                leaf = jnp.where(upd, orig, leaf)
                hit = jnp.where(upd, 1, hit)
                nxt = jnp.where(bhit & jnp.logical_not(is_leaf),
                                node + 1, skipr)
                node = jnp.where(active, nxt, node)
                return node, hit, dist, leaf, w0, slot, step + 1

        def micro_cond(state):
            node, _, _, _, w0, _, step = state
            stay = (node >= w0) & (node < w0 + win)
            return jnp.logical_and(jnp.any(stay), step < max_steps)

        def outer(state):
            node, hit, dist, leaf, w0, slot, step = state
            pred = w0 + win
            started = pred < wb

            @pl.when(started)
            def _():
                dma(1 - slot, pred).start()

            state = jax.lax.while_loop(
                micro_cond, micro,
                (node, hit, dist, leaf, w0, slot, step),
            )
            node, hit, dist, leaf, _, _, step = state

            # after the drain every live rank is >= w0 + win (monotone)
            m = jnp.min(node)
            next_w0 = jnp.minimum(m // win * win, wb)

            @pl.when(started)
            def _():  # consume the prediction (right or wrong)
                dma(1 - slot, pred).wait()

            @pl.when(jnp.logical_and(next_w0 < wb, next_w0 != pred))
            def _():  # mispredicted skip-ahead: blocking re-fetch
                dma(1 - slot, next_w0).start()
                dma(1 - slot, next_w0).wait()

            slot = jnp.where(next_w0 < wb, 1 - slot, slot)
            return node, hit, dist, leaf, next_w0, slot, step

        def outer_cond(state):
            _, _, _, _, w0, _, step = state
            return jnp.logical_and(w0 < wb, step < max_steps)

        zero = jnp.zeros((s, LANES), jnp.int32)
        state = (
            zero,  # rank 0 = root
            zero,  # hit / occ
            jnp.zeros((s, LANES), jnp.float32),
            zero,  # leaf id
            jnp.int32(0),  # w0
            jnp.int32(0),  # slot
            jnp.int32(0),  # step
        )
        node, hit, dist, leaf, _, _, step = jax.lax.while_loop(
            outer_cond, outer, state
        )
        if any_hit:
            out_ref[0, 0] = pltpu.bitcast(hit, jnp.float32)
        else:
            out_ref[0, 0] = dist
            out_ref[0, 1] = pltpu.bitcast(leaf, jnp.float32)
            out_ref[0, 2] = pltpu.bitcast(hit, jnp.float32)
            # micro-step count of this tile's sweep (same scalar in every
            # lane) — the roofline/utilization accounting reads it
            out_ref[0, 3] = pltpu.bitcast(
                jnp.full((s, LANES), step, jnp.int32), jnp.float32
            )

    return kernel


def _prep_rays_blocked(rays: Rays, block_rays: int):
    """[R, 3] rays -> [ntiles, 3, S, 128] blocks (padding rays originate
    far outside every box so they miss the root immediately)."""
    s = block_rays // LANES
    nrays = rays.origin.shape[0]
    rpad = _round_up(nrays, block_rays)
    ntiles = rpad // block_rays
    origin = jnp.full((3, rpad), 1.0e30, jnp.float32).at[:, :nrays].set(
        rays.origin.astype(jnp.float32).T
    )
    direction = jnp.ones((3, rpad), jnp.float32).at[:, :nrays].set(
        rays.direction.astype(jnp.float32).T
    )
    origin = origin.reshape(3, ntiles, s, LANES).transpose(1, 0, 2, 3)
    direction = direction.reshape(3, ntiles, s, LANES).transpose(1, 0, 2, 3)
    return origin, direction, nrays, ntiles, s


def traverse_hbm_pallas(
    bvh: BVH,
    rays: Rays,
    epsilon: float,
    max_steps: int = 0,
    block_rays: int = 1024,
    win: int = 1024,
    interpret: bool | None = None,
    return_steps: bool = False,
):
    """Nearest-hit traversal, HBM-resident tree (see module doc).  Same
    contract as ops.traverse.traverse; no scene-size VMEM ceiling.

    ``return_steps=True`` additionally returns the [ntiles] per-tile
    micro-step counts (for utilization accounting in bench.py)."""
    n = bvh.n_leaves
    if max_steps <= 0:
        max_steps = 4 * n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if bvh.hbm_table is not None:
        tbl = bvh.hbm_table
        win = tbl.shape[1] * LANES  # the table's own window size wins
    else:
        tbl = pack_table_rank17(bvh, win)
    wb = tbl.shape[0] * win
    origin, direction, nrays, ntiles, s = _prep_rays_blocked(rays, block_rays)

    kernel = _make_kernel(
        False, n_leaves=n, wb=wb, win=win, s=s,
        epsilon=epsilon, max_steps=max_steps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # node table stays in HBM
            pl.BlockSpec((1, 3, s, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, s, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 4, s, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, 4, s, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win // LANES, CHP, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(tbl, origin, direction)

    steps = jax.lax.bitcast_convert_type(out[:, 3, 0, 0], jnp.int32)
    out = out[:, :3].transpose(1, 0, 2, 3).reshape(3, ntiles * s * LANES)
    dist = out[0, :nrays]
    leaf = jax.lax.bitcast_convert_type(out[1, :nrays], jnp.int32)
    hit = jax.lax.bitcast_convert_type(out[2, :nrays], jnp.int32) > 0
    rec = HitRecord(hit=hit, distance=dist, leaf=leaf)
    if return_steps:
        return rec, steps
    return rec


def traverse_any_hbm_pallas(
    bvh: BVH,
    rays: Rays,
    epsilon: float,
    max_t,
    max_steps: int = 0,
    block_rays: int = 1024,
    win: int = 1024,
    interpret: bool | None = None,
):
    """Any-hit (occlusion) windowed sweep: [R] bool."""
    n = bvh.n_leaves
    if max_steps <= 0:
        max_steps = 4 * n
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if bvh.hbm_table is not None:
        tbl = bvh.hbm_table
        win = tbl.shape[1] * LANES
    else:
        tbl = pack_table_rank17(bvh, win)
    wb = tbl.shape[0] * win
    origin, direction, nrays, ntiles, s = _prep_rays_blocked(rays, block_rays)
    rpad = ntiles * s * LANES
    tmax = jnp.full((rpad,), -1.0, jnp.float32).at[:nrays].set(
        jnp.asarray(max_t, jnp.float32)
    ).reshape(ntiles, 1, s, LANES)

    kernel = _make_kernel(
        True, n_leaves=n, wb=wb, win=win, s=s,
        epsilon=epsilon, max_steps=max_steps,
    )
    out = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, s, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, s, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, s, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, s, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, 1, s, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win // LANES, CHP, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        interpret=interpret,
    )(tbl, origin, direction, tmax)

    occ = out.reshape(rpad)[:nrays]
    return jax.lax.bitcast_convert_type(occ, jnp.int32) > 0
