"""HBM-resident windowed rank-sweep traversal (persistent refill kernel).

The large-scene traversal backend.  Two problems with the VMEM kernels
(ops/traverse_pallas.py) at 100k+ triangles:

  * capacity: they pin the whole node table in VMEM (~150k-leaf ceiling);
    the reference's tree lives in a GPU UAV with no such cap
    (reference: RayTraceGlobal.hlsl:113).
  * speed: the per-lane gather kernels decompose every step's gather over
    the full divergence range of the tile (measured 0.02 Mrays/s at 102k
    tris).

Design here:

  * The BVH is ONE fused channel-major table [17, Wb] in **HBM**, laid
    out in DFS pre-order rank space (ops/bvh.preorder_ranks):
      ch 0-5   bbmin.xyz / bbmax.xyz
      ch 6     skip rank (int32 bits; -1 = walk done)
      ch 7     original node id (int32 bits; < n -> leaf)
      ch 8-16  leaf triangle v0/e1/e2 (leaf columns only; zeros else)
    In rank space descend is ``rank+1`` and every other move strictly
    increases rank, so a ray's column accesses are monotone.

  * Rays run in ``block_rays``-ray blocks (default 2048) laid out
    (S, 128) — full 8x128 vregs.
    Each block sweeps the tree front-to-back through a VMEM **window**
    of ``win`` consecutive ranks, double-buffered: while the block
    drains window w, the DMA engine prefetches w+win (a skip past the
    prediction pays one blocking re-fetch).  Within a window, each
    micro-step serves the 128-rank *subtile* holding the minimum live
    rank: one VMEM slice [17, 128], one sublane-broadcast + lane-shuffle
    per channel, slab test + Moeller-Trumbore, advance.

  * **Persistent refill** (the round-4 rework): the micro-step is
    LATENCY-bound, not throughput-bound — doubling its 17-channel
    shuffle costs +39 cycles and doubling the slab+MT math costs ~0,
    against a measured 645-cycle step (scripts/tpu_sweep_diag.py).  The
    serial chain min-rank -> scalar -> dynamic-slice -> gather leaves
    the VPU idle.  So ONE grid instance runs ``interleave`` (default 8)
    independent ray blocks as *slots*: their chains overlap in the VLIW
    schedule, and a slot that finishes its block DMAs the results out,
    DMAs the next block's rays in, and restarts — no fixed-group
    lockstep, zero wasted serves.  Measured at 102 400 tris / 1080p:
    167 ms (r3 single-block kernel) -> 73 ms, exact hit parity.

Algorithm semantics are the reference's traversal
(reference: RayTraceTraversal.hlsl:41-104,133-192): slab test, nearest-
hit Moeller-Trumbore, identical hit records — parity-tested against
ops/traverse.traverse (tests/test_traverse_hbm.py, tests/test_tpu_device.py).
"""

from __future__ import annotations

import warnings

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.types import BVH, HitRecord, Rays

LANES = 128
CH = 17  # 6 box + skip + orig + 9 tri
CHP = 24  # sublane-padded channel count: DMA slices need dim0 % 8 == 0
RCH = 10  # ray channels: o.xyz, d.xyz, 1/d.xyz, tmax (any-hit only)
BIGBOX = 1.0e30
DEFAULT_WIN = 1024
DEFAULT_INTERLEAVE = 12  # swept 4-16 on device: 12-14 best (31 Mrays/s at 102k tris)
# serve rounds per subtile load: swept 1-4 on device at 102k tris —
# 66.9/64.1/64.0/65.0 ms (p2 default; the latency-bound step makes the
# second round ~free and descend chains often stay in the subtile)
DEFAULT_PUMP = 2
# full-window modes measured SLOWER at 102k tris (round 5): per-subtile
# sweep 176 ms, cross-subtile window gather 185 ms vs 64 ms default —
# the lane smear exceeds the window (in-min-subtile occupancy 14.9%),
# so both pay 4-8x vector work for <2-3x fewer iterations.  Kept
# selectable for occupancy experiments.
DEFAULT_WSWEEP = False


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def pack_table_rank17(bvh: BVH, win: int = DEFAULT_WIN):
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


def _make_refill_kernel(any_hit, T, *, n_leaves, ntiles, wb, win, s,
                        epsilon, per_block, max_iters, pump=1,
                        track_occ=False, wsweep=False):
    """Persistent T-slot refill sweep (module doc).  ``any_hit``
    switches between nearest-hit and first-hit (occlusion) semantics.
    ``per_block`` is a hard per-block micro-step cap: a capped block
    writes its best-so-far records (graceful truncation, the r3 kernel's
    per-tile bound); ``max_iters`` is the global iteration backstop.

    ``pump``: rounds served per subtile load — the micro-step is
    LATENCY-bound (645 cycles; doubling the 17-ch shuffle costs +39,
    scripts/tpu_sweep_diag.py), and a descend (rank+1) or short skip
    usually stays inside the already-loaded 128-rank subtile, so
    re-serving the same slice advances those lanes at ~zero marginal
    latency.  ``track_occ`` adds a per-lane active-serve counter
    (occupancy accounting; output grows a 5th channel)."""
    done = wb
    ksub = win // LANES
    och = 5 if track_occ else 4

    def kernel(tbl_hbm, rays_hbm, out_hbm, wbuf, rbuf, obuf, *rest):
        # occupancy accumulates in a dedicated VMEM scratch (a while-
        # carried splat-initialized vector hits a Mosaic replicated-
        # layout relayout error; and obuf[t] itself may be DMA-in-flight)
        if track_occ:
            ocbuf, wsem, rsem, osem = rest
        else:
            wsem, rsem, osem = rest
        def wdma(t, slot, w0):
            return pltpu.make_async_copy(
                tbl_hbm.at[w0 // win], wbuf.at[t, slot], wsem.at[t, slot]
            )

        def rdma(t, blk):
            return pltpu.make_async_copy(
                rays_hbm.at[blk], rbuf.at[t], rsem.at[t]
            )

        def odma(t, blk):
            return pltpu.make_async_copy(
                obuf.at[t], out_hbm.at[blk], osem.at[t]
            )

        # preload: slot t <- block t
        for t in range(min(T, ntiles)):
            rdma(t, t).start()
            wdma(t, 0, 0).start()
        for t in range(min(T, ntiles)):
            rdma(t, t).wait()
            wdma(t, 0, 0).wait()
            if win < wb:
                wdma(t, 1, win).start()

        def serve(t, sub, k, node, hit, dist, leaf, w0):
            """``pump`` micro-step rounds for slot ``t`` against ONE
            loaded [17, 128] subtile ``k``: each round serves the lanes
            whose rank currently sits in that subtile, advances them,
            and the next round catches lanes that advanced within it."""
            ox, oy, oz = rbuf[t, 0], rbuf[t, 1], rbuf[t, 2]
            dx, dy, dz = rbuf[t, 3], rbuf[t, 4], rbuf[t, 5]
            idx_, idy_, idz_ = rbuf[t, 6], rbuf[t, 7], rbuf[t, 8]
            for _ in range(pump):
                offw = jnp.where((node >= w0) & (node < w0 + win),
                                 node - w0, win)
                off = offw - k * LANES
                active = (off >= 0) & (off < LANES) & (offw < win)
                lane = jnp.clip(off, 0, LANES - 1)
                row = _splat(sub, lane, s)
                skipr = pltpu.bitcast(row[6], jnp.int32)
                skipr = jnp.where(skipr < 0, done, skipr)
                orig = pltpu.bitcast(row[7], jnp.int32)
                is_leaf = orig < n_leaves
                tmin, box_ok, tt, tri_ok = _slab_mt(
                    row, ox, oy, oz, dx, dy, dz, idx_, idy_, idz_, epsilon
                )
                if track_occ:
                    ocbuf[t] = ocbuf[t] + jnp.where(active, 1.0, 0.0)
                if any_hit:
                    ray_tmax = rbuf[t, 9]
                    bhit = box_ok & (tmin <= ray_tmax) & active
                    found = bhit & is_leaf & tri_ok & (tt < ray_tmax)
                    hit = jnp.where(found, 1, hit)
                    nxt = jnp.where(bhit & jnp.logical_not(is_leaf),
                                    node + 1, skipr)
                    nxt = jnp.where(found, done, nxt)  # early exit
                    node = jnp.where(active, nxt, node)
                    continue
                hitb = hit > 0
                bhit = (box_ok & (jnp.logical_not(hitb) | (tmin <= dist))
                        & active)
                upd = (bhit & is_leaf & tri_ok
                       & (jnp.logical_not(hitb) | (tt < dist)))
                dist = jnp.where(upd, tt, dist)
                leaf = jnp.where(upd, orig, leaf)
                hit = jnp.where(upd, 1, hit)
                nxt = jnp.where(bhit & jnp.logical_not(is_leaf),
                                node + 1, skipr)
                node = jnp.where(active, nxt, node)
            return node, hit, dist, leaf

        def body(state):
            (nodes, hits, dists, leafs, w0s, slots, blks, stepc, pos, nb,
             it) = state
            nodes, hits, dists, leafs = (list(nodes), list(hits),
                                         list(dists), list(leafs))
            w0s, slots, blks, stepc, pos = (list(w0s), list(slots),
                                            list(blks), list(stepc),
                                            list(pos))

            # phase 1: per-slot global min rank (T independent reduces;
            # ranks are monotone, so min >= w0+win <=> window drained)
            ms = [jnp.min(nodes[t]) for t in range(T)]
            refills = []

            # phase 2: window logistics + refill (rare scalar branches)
            for t in range(T):
                live = blks[t] >= 0
                drained = live & (ms[t] >= w0s[t] + win) & (w0s[t] < wb)
                nxt_w0 = jnp.minimum(ms[t] // win * win, wb)
                pred = w0s[t] + win

                @pl.when(drained)
                def _(t=t, nxt_w0=nxt_w0, pred=pred):
                    @pl.when(pred < wb)
                    def _():  # consume the standing prefetch
                        wdma(t, 1 - slots[t], pred).wait()

                    @pl.when((nxt_w0 < wb) & (nxt_w0 != pred))
                    def _():  # mispredicted skip-ahead: blocking re-fetch
                        wdma(t, 1 - slots[t], nxt_w0).start()
                        wdma(t, 1 - slots[t], nxt_w0).wait()

                w0_a = jnp.where(drained, nxt_w0, w0s[t])
                slot_a = jnp.where(drained & (nxt_w0 < wb),
                                   1 - slots[t], slots[t])

                @pl.when(drained & (nxt_w0 < wb) & (nxt_w0 + win < wb))
                def _(t=t, slot_a=slot_a, nxt_w0=nxt_w0):
                    wdma(t, 1 - slot_a, nxt_w0 + win).start()

                # block finished (walk complete OR per-block step cap —
                # graceful truncation with best-so-far records): write
                # out, refill or retire
                capped = live & (stepc[t] >= per_block)
                fin = live & ((w0_a >= wb) | capped)
                refill = fin & (nb < ntiles)

                @pl.when(fin)
                def _(t=t, dist=dists[t], leaf=leafs[t], hit=hits[t],
                      st=stepc[t], blk=blks[t], refill=refill, nb=nb,
                      po=pos[t], w0_a=w0_a, slot_a=slot_a):
                    # capped mid-window: a standing prefetch into buffer
                    # 1-slot_a is still in flight (invariant: one exists
                    # iff w0 + win < wb) — consume it so the refill's
                    # wdma into buffer 0 can't collide on the semaphore
                    @pl.when(w0_a + win < wb)
                    def _():
                        wdma(t, 1 - slot_a, w0_a + win).wait()

                    # obuf[t] may still be in flight from this slot's
                    # previous block — wait that copy before overwriting
                    # (the semaphore counts bytes; any same-shape
                    # descriptor works for the wait)
                    @pl.when(po > 0)
                    def _():
                        odma(t, 0).wait()

                    if any_hit:
                        obuf[t, 0] = pltpu.bitcast(hit, jnp.float32)
                        obuf[t, 1] = jnp.zeros((s, LANES), jnp.float32)
                        obuf[t, 2] = jnp.zeros((s, LANES), jnp.float32)
                    else:
                        obuf[t, 0] = dist
                        obuf[t, 1] = pltpu.bitcast(leaf, jnp.float32)
                        obuf[t, 2] = pltpu.bitcast(hit, jnp.float32)
                    obuf[t, 3] = pltpu.bitcast(
                        jnp.full((s, LANES), st, jnp.int32), jnp.float32)
                    if track_occ:
                        obuf[t, 4] = ocbuf[t]
                        ocbuf[t] = jnp.zeros((s, LANES), jnp.float32)
                    odma(t, blk).start()

                    @pl.when(refill)
                    def _():
                        rdma(t, nb).start()
                        wdma(t, 0, 0).start()
                        rdma(t, nb).wait()
                        wdma(t, 0, 0).wait()

                        @pl.when(win < wb)
                        def _():
                            wdma(t, 1, win).start()

                zero = jnp.zeros((s, LANES), jnp.int32)
                nodes[t] = jnp.where(refill, zero, nodes[t])
                hits[t] = jnp.where(refill, zero, hits[t])
                dists[t] = jnp.where(
                    refill, jnp.zeros((s, LANES), jnp.float32), dists[t])
                leafs[t] = jnp.where(refill, zero, leafs[t])
                stepc[t] = jnp.where(refill, 0, stepc[t])
                w0s[t] = jnp.where(refill, 0, jnp.where(fin, wb, w0_a))
                slots[t] = jnp.where(refill, 0, slot_a)
                blks[t] = jnp.where(refill, nb,
                                    jnp.where(fin, -1, blks[t]))
                pos[t] = jnp.where(fin, 1, pos[t])
                nb = nb + jnp.where(refill, 1, 0)
                refills.append(refill)

            if wsweep:
                # phase 3 (window-gather mode): ONE micro-step serving
                # EVERY in-window lane.  The min-subtile serve measured
                # 14.9% lane occupancy at 102k tris (lanes smear over
                # the window's 8 subtiles and skip links jump subtiles),
                # so 85% of each serve's vector work was masked off.
                # Here the per-lane row is gathered across ALL resident
                # subtiles (ksub x 17 shuffles + selects — the
                # _gather_cols decomposition, window-local), then one
                # slab/MT advances the whole block: ~4x the vector work
                # per iteration for ~6.7x fewer iterations.
                for t in range(T):
                    node = nodes[t]
                    offw = jnp.where(
                        (node >= w0s[t]) & (node < w0s[t] + win),
                        node - w0s[t], win)
                    lane = jax.lax.rem(jnp.minimum(offw, win - 1), LANES)
                    kid = jax.lax.div(jnp.minimum(offw, win - 1), LANES)
                    row = None
                    for k in range(ksub):
                        part = _splat(wbuf[t, slots[t], k], lane, s)
                        if row is None:
                            row = part
                        else:
                            row = [jnp.where(kid == k, part[c], row[c])
                                   for c in range(CH)]
                    ox, oy, oz = rbuf[t, 0], rbuf[t, 1], rbuf[t, 2]
                    dx, dy, dz = rbuf[t, 3], rbuf[t, 4], rbuf[t, 5]
                    idx_, idy_, idz_ = rbuf[t, 6], rbuf[t, 7], rbuf[t, 8]
                    active = offw < win
                    skipr = pltpu.bitcast(row[6], jnp.int32)
                    skipr = jnp.where(skipr < 0, done, skipr)
                    orig = pltpu.bitcast(row[7], jnp.int32)
                    is_leaf = orig < n_leaves
                    tmin, box_ok, tt, tri_ok = _slab_mt(
                        row, ox, oy, oz, dx, dy, dz, idx_, idy_, idz_,
                        epsilon)
                    if track_occ:
                        ocbuf[t] = ocbuf[t] + jnp.where(active, 1.0, 0.0)
                    if any_hit:
                        ray_tmax = rbuf[t, 9]
                        bhit = box_ok & (tmin <= ray_tmax) & active
                        found = bhit & is_leaf & tri_ok & (tt < ray_tmax)
                        hits[t] = jnp.where(found, 1, hits[t])
                        nxt = jnp.where(bhit & jnp.logical_not(is_leaf),
                                        node + 1, skipr)
                        nxt = jnp.where(found, done, nxt)
                        nodes[t] = jnp.where(active, nxt, node)
                    else:
                        hitb = hits[t] > 0
                        bhit = (box_ok
                                & (jnp.logical_not(hitb)
                                   | (tmin <= dists[t])) & active)
                        upd = (bhit & is_leaf & tri_ok
                               & (jnp.logical_not(hitb)
                                  | (tt < dists[t])))
                        dists[t] = jnp.where(upd, tt, dists[t])
                        leafs[t] = jnp.where(upd, orig, leafs[t])
                        hits[t] = jnp.where(upd, 1, hits[t])
                        nxt = jnp.where(bhit & jnp.logical_not(is_leaf),
                                        node + 1, skipr)
                        nodes[t] = jnp.where(active, nxt, node)
                    stepc[t] = stepc[t] + jnp.where(blks[t] >= 0, 1, 0)
            else:
                # phase 3a: subtile loads — all T issued before any
                # serve, so no serve waits on another slot's
                # scalar->address chain
                ks = []
                subs = []
                for t in range(T):
                    m = jnp.where(refills[t], 0, ms[t])  # refilled: 0
                    ks.append(jnp.clip((m - w0s[t]) // LANES, 0,
                                       ksub - 1))
                    subs.append(wbuf[t, slots[t], ks[t]])

                # phase 3b: serves — T independent pure-vector chains in
                # one straight-line block; the VLIW scheduler overlaps
                # them
                for t in range(T):
                    nodes[t], hits[t], dists[t], leafs[t] = serve(
                        t, subs[t], ks[t], nodes[t], hits[t], dists[t],
                        leafs[t], w0s[t])
                    stepc[t] = stepc[t] + jnp.where(blks[t] >= 0, pump, 0)

            return (tuple(nodes), tuple(hits), tuple(dists), tuple(leafs),
                    tuple(w0s), tuple(slots), tuple(blks), tuple(stepc),
                    tuple(pos), nb, it + 1)

        def cond(state):
            blks = state[6]
            it = state[10]
            live = blks[0] >= 0
            for t in range(1, T):
                live = live | (blks[t] >= 0)
            return live & (it < max_iters)

        if track_occ:
            for t in range(T):
                ocbuf[t] = jnp.zeros((s, LANES), jnp.float32)
        zero = jnp.zeros((s, LANES), jnp.int32)
        zf = jnp.zeros((s, LANES), jnp.float32)
        state = (
            tuple(zero for _ in range(T)),
            tuple(zero for _ in range(T)),
            tuple(zf for _ in range(T)),
            tuple(zero for _ in range(T)),
            tuple(jnp.int32(0 if t < ntiles else wb) for t in range(T)),
            tuple(jnp.int32(0) for _ in range(T)),
            tuple(jnp.int32(t if t < ntiles else -1) for t in range(T)),
            tuple(jnp.int32(0) for _ in range(T)),
            tuple(jnp.int32(0) for _ in range(T)),  # pending out-DMA
            jnp.int32(min(T, ntiles)),  # next block to hand out
            jnp.int32(0),  # global iteration counter
        )
        state = jax.lax.while_loop(cond, body, state)
        (f_nodes, f_hits, f_dists, f_leafs, _, _, f_blks, f_stepc,
         f_pos, f_nb, _) = state

        # drain.  Normal exit: every slot retired (blk = -1) with one
        # out-DMA in flight.  Backstop exit (it hit max_iters): a slot
        # may still hold an unfinished block — write its best-so-far
        # results (graceful, like the r3 kernel's per-tile step bound)
        # so the output region is never uninitialized HBM, and so the
        # final wait below has a matching DMA to consume.
        for t in range(T):
            interrupted = f_blks[t] >= 0

            @pl.when(interrupted)
            def _(t=t, blk=f_blks[t], po=f_pos[t], dist=f_dists[t],
                  leaf=f_leafs[t], hit=f_hits[t], st=f_stepc[t]):
                @pl.when(po > 0)
                def _():
                    odma(t, 0).wait()

                if any_hit:
                    obuf[t, 0] = pltpu.bitcast(hit, jnp.float32)
                    obuf[t, 1] = jnp.zeros((s, LANES), jnp.float32)
                    obuf[t, 2] = jnp.zeros((s, LANES), jnp.float32)
                else:
                    obuf[t, 0] = dist
                    obuf[t, 1] = pltpu.bitcast(leaf, jnp.float32)
                    obuf[t, 2] = pltpu.bitcast(hit, jnp.float32)
                obuf[t, 3] = pltpu.bitcast(
                    jnp.full((s, LANES), st, jnp.int32), jnp.float32)
                if track_occ:
                    obuf[t, 4] = ocbuf[t]
                odma(t, blk).start()

            @pl.when(interrupted | (f_pos[t] > 0))
            def _(t=t):
                odma(t, 0).wait()

        # Backstop-only (max_iters exit): blocks never handed to a slot
        # ([f_nb, ntiles)) would otherwise leave their out_hbm rows as
        # uninitialized HBM — write explicit miss records (all slot
        # out-DMAs are drained above, so obuf[0] is free).
        @pl.when(f_nb < ntiles)
        def _():
            for c in range(och):
                obuf[0, c] = jnp.zeros((s, LANES), jnp.float32)

            def wbody(b, carry):
                odma(0, b).start()
                odma(0, b).wait()
                return carry

            jax.lax.fori_loop(f_nb, jnp.int32(ntiles), wbody, jnp.int32(0))

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


def _resolve_table(bvh: BVH, win):
    """The node table + window size: the bvh's precomputed table when
    present (its window size wins — warn on an explicit conflict)."""
    if bvh.hbm_table is not None:
        tbl = bvh.hbm_table
        twin = tbl.shape[1] * LANES
        if win is not None and win != twin:
            warnings.warn(
                f"traverse_hbm: bvh.hbm_table was packed with win={twin}; "
                f"ignoring win={win} (repack with pack_table_rank17 to "
                "sweep window sizes)", stacklevel=3)
        return tbl, twin
    win = DEFAULT_WIN if win is None else win
    return pack_table_rank17(bvh, win), win


def _run_refill(any_hit, bvh, rays9, ntiles, s, tbl, win, epsilon,
                max_steps, interleave, interpret, pump=1,
                track_occ=False, wsweep=False):
    n = bvh.n_leaves
    wb = tbl.shape[0] * win
    # per_block: hard per-block micro-step cap (cfg.max_traversal_steps
    # semantics — capped blocks truncate gracefully with best-so-far
    # records); the global backstop then provably covers every wave of
    # refills: ceil(ntiles/T) waves x per_block iterations each.
    per_block = int(max_steps) if max_steps > 0 else 4 * n
    max_iters = min(per_block * max(ntiles, 1) + 64, 2 ** 30)
    # clamp slots to the block count: an idle slot (T > ntiles) would
    # serve never-DMA'd scratch every iteration — wasted VMEM + vector
    # work on small dispatches
    T = max(1, min(interleave, ntiles))
    och = 5 if track_occ else 4
    kernel = _make_refill_kernel(
        any_hit, T, n_leaves=n, ntiles=ntiles, wb=wb, win=win, s=s,
        epsilon=epsilon, per_block=per_block, max_iters=max_iters,
        pump=pump, track_occ=track_occ, wsweep=wsweep,
    )
    return pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # node table stays in HBM
            pl.BlockSpec(memory_space=pl.ANY),  # ray blocks stay in HBM
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ntiles, och, s, LANES),
                                       jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, 2, win // LANES, CHP, LANES), jnp.float32),
            pltpu.VMEM((T, RCH, s, LANES), jnp.float32),
            pltpu.VMEM((T, och, s, LANES), jnp.float32),
        ] + ([pltpu.VMEM((T, s, LANES), jnp.float32)] if track_occ
             else []) + [
            pltpu.SemaphoreType.DMA((T, 2)),
            pltpu.SemaphoreType.DMA((T,)),
            pltpu.SemaphoreType.DMA((T,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tbl, rays9)


def traverse_hbm_pallas(
    bvh: BVH,
    rays: Rays,
    epsilon: float,
    max_steps: int = 0,
    block_rays: int = 2048,
    win: int | None = None,
    interpret: bool | None = None,
    return_steps: bool = False,
    interleave: int = DEFAULT_INTERLEAVE,
    pump: int = DEFAULT_PUMP,
    return_occupancy: bool = False,
    wsweep: bool = DEFAULT_WSWEEP,
):
    """Nearest-hit traversal, HBM-resident tree (see module doc).  Same
    contract as ops.traverse.traverse; no scene-size VMEM ceiling.

    ``return_steps=True`` additionally returns the [ntiles] per-block
    micro-step counts; ``return_occupancy=True`` (implies steps) also
    returns the [ntiles] per-block active-lane-serve totals — lane
    occupancy of block b = occ[b] / (steps[b] * block_rays)."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tbl, win = _resolve_table(bvh, win)
    origin, direction, nrays, ntiles, s = _prep_rays_blocked(rays, block_rays)
    inv = 1.0 / direction
    pad = jnp.zeros((ntiles, RCH - 9, s, LANES), jnp.float32)
    rays9 = jnp.concatenate([origin, direction, inv, pad], axis=1)

    out = _run_refill(False, bvh, rays9, ntiles, s, tbl, win, epsilon,
                      max_steps, interleave, interpret, pump=pump,
                      track_occ=return_occupancy, wsweep=wsweep)
    steps = jax.lax.bitcast_convert_type(out[:, 3, 0, 0], jnp.int32)
    if return_occupancy:  # channel 4 holds f32 active-serve counts
        occ = out[:, 4].reshape(ntiles, -1).sum(axis=1).astype(jnp.int32)
    out = out[:, :3].transpose(1, 0, 2, 3).reshape(3, ntiles * s * LANES)
    dist = out[0, :nrays]
    leaf = jax.lax.bitcast_convert_type(out[1, :nrays], jnp.int32)
    hit = jax.lax.bitcast_convert_type(out[2, :nrays], jnp.int32) > 0
    rec = HitRecord(hit=hit, distance=dist, leaf=leaf)
    if return_occupancy:
        return rec, steps, occ
    if return_steps:
        return rec, steps
    return rec


def traverse_any_hbm_pallas(
    bvh: BVH,
    rays: Rays,
    epsilon: float,
    max_t,
    max_steps: int = 0,
    block_rays: int = 2048,
    win: int | None = None,
    interpret: bool | None = None,
    interleave: int = DEFAULT_INTERLEAVE,
    pump: int = DEFAULT_PUMP,
    wsweep: bool = DEFAULT_WSWEEP,
):
    """Any-hit (occlusion) refill sweep: [R] bool."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tbl, win = _resolve_table(bvh, win)
    origin, direction, nrays, ntiles, s = _prep_rays_blocked(rays, block_rays)
    inv = 1.0 / direction
    rpad = ntiles * s * LANES
    tmax = jnp.full((rpad,), -1.0, jnp.float32).at[:nrays].set(
        jnp.asarray(max_t, jnp.float32)
    ).reshape(ntiles, 1, s, LANES)
    rays9 = jnp.concatenate([origin, direction, inv, tmax], axis=1)

    out = _run_refill(True, bvh, rays9, ntiles, s, tbl, win, epsilon,
                      max_steps, interleave, interpret, pump=pump,
                      wsweep=wsweep)
    occ = out[:, 0].reshape(rpad)[:nrays]
    return jax.lax.bitcast_convert_type(occ, jnp.int32) > 0
