#!/usr/bin/env python
"""Prototype: T-way tile-interleaved HBM windowed sweep.

tpu_sweep_diag.py showed the micro-step is LATENCY-bound (645 cyc/step;
doubling the 17-ch shuffle costs +39 cyc, doubling slab+MT costs ~0):
the serial chain min->scalar->dynamic-slice->gather->update leaves the
VPU idle.  This kernel runs T independent ray tiles in one grid
instance with a SINGLE flat loop; their chains are independent, so the
VLIW scheduler overlaps them — T-fold throughput at roughly constant
iteration latency.

Run: python scripts/tpu_sweep_ilv.py [subdiv]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from raytracebvh_tpu import Camera, RenderConfig
from raytracebvh_tpu.camera import camera_matrices, permute_rays, tile_order
from raytracebvh_tpu.core.types import scene_to_device
from raytracebvh_tpu.models.procedural import sphere_grid
from raytracebvh_tpu.ops.traverse_hbm import (
    CH, CHP, LANES, _prep_rays_blocked, _slab_mt, _splat, pack_table_rank17,
)
from raytracebvh_tpu.pipeline import build_bvh, make_rays

SUBDIV = int(sys.argv[1]) if len(sys.argv) > 1 and sys.argv[1].isdigit() else 40
W, H = 1920, 1080


def make_ilv_kernel(T, *, n_leaves, wb, win, s, epsilon, max_steps):
    done = wb
    ksub = win // LANES

    def kernel(tbl_hbm, o_ref, d_ref, out_ref, wbuf, sem):
        # per-tile ray registers
        O = [[o_ref[0, t, c] for c in range(3)] for t in range(T)]
        D = [[d_ref[0, t, c] for c in range(3)] for t in range(T)]
        ID = [[1.0 / D[t][c] for c in range(3)] for t in range(T)]

        def dma(t, slot, w0):
            return pltpu.make_async_copy(
                tbl_hbm.at[w0 // win], wbuf.at[t, slot], sem.at[t, slot]
            )

        # load window 0 for every tile; prefetch window 1 into slot 1
        for t in range(T):
            dma(t, 0, 0).start()
        for t in range(T):
            dma(t, 0, 0).wait()
            if win < wb:
                dma(t, 1, win).start()

        def serve(t, sub, offw, k, node, hit, dist, leaf):
            off = offw - k * LANES
            active = (off >= 0) & (off < LANES) & (offw < win)
            lane = jnp.clip(off, 0, LANES - 1)
            row = _splat(sub, lane, s)
            skipr = pltpu.bitcast(row[6], jnp.int32)
            skipr = jnp.where(skipr < 0, done, skipr)
            orig = pltpu.bitcast(row[7], jnp.int32)
            is_leaf = orig < n_leaves
            (ox, oy, oz), (dx, dy, dz) = O[t], D[t]
            idx_, idy_, idz_ = ID[t]
            tmin, box_ok, tt, tri_ok = _slab_mt(
                row, ox, oy, oz, dx, dy, dz, idx_, idy_, idz_, epsilon
            )
            hitb = hit > 0
            bhit = box_ok & (jnp.logical_not(hitb) | (tmin <= dist)) & active
            upd = (bhit & is_leaf & tri_ok
                   & (jnp.logical_not(hitb) | (tt < dist)))
            dist = jnp.where(upd, tt, dist)
            leaf = jnp.where(upd, orig, leaf)
            hit = jnp.where(upd, 1, hit)
            nxt = jnp.where(bhit & jnp.logical_not(is_leaf), node + 1, skipr)
            node = jnp.where(active, nxt, node)
            return node, hit, dist, leaf

        def body(state):
            nodes, hits, dists, leafs, w0s, slots, step = state
            nodes, hits, dists, leafs = list(nodes), list(hits), \
                list(dists), list(leafs)
            w0s, slots = list(w0s), list(slots)

            # phase 1: per-tile global min (independent reduces)
            ms = [jnp.min(nodes[t]) for t in range(T)]

            # phase 2: window logistics (rare scalar branches)
            for t in range(T):
                drained = (ms[t] >= w0s[t] + win) & (w0s[t] < wb)
                nxt_w0 = jnp.minimum(ms[t] // win * win, wb)
                pred = w0s[t] + win

                @pl.when(drained)
                def _(t=t, nxt_w0=nxt_w0, pred=pred):
                    @pl.when(pred < wb)
                    def _():  # consume the standing prefetch
                        dma(t, 1 - slots[t], pred).wait()

                    @pl.when((nxt_w0 < wb) & (nxt_w0 != pred))
                    def _():  # mispredict: blocking refetch
                        dma(t, 1 - slots[t], nxt_w0).start()
                        dma(t, 1 - slots[t], nxt_w0).wait()

                new_w0 = jnp.where(drained, nxt_w0, w0s[t])
                new_slot = jnp.where(
                    drained & (nxt_w0 < wb), 1 - slots[t], slots[t])
                # prefetch the next window after the one just entered
                @pl.when(drained & (nxt_w0 < wb) & (nxt_w0 + win < wb))
                def _(t=t, new_slot=new_slot, nxt_w0=nxt_w0):
                    dma(t, 1 - new_slot, nxt_w0 + win).start()

                w0s[t] = new_w0
                slots[t] = new_slot

            # phase 3: serves (one straight-line block, T independent
            # chains — this is where the latency hiding happens)
            subs = []
            for t in range(T):
                k0 = jnp.clip((ms[t] - w0s[t]) // LANES, 0, ksub - 1)
                subs.append(wbuf[t, slots[t], k0])
            for t in range(T):
                offw = jnp.where(
                    (nodes[t] >= w0s[t]) & (nodes[t] < w0s[t] + win),
                    nodes[t] - w0s[t], win)
                nodes[t], hits[t], dists[t], leafs[t] = serve(
                    t, subs[t], offw,
                    jnp.clip((ms[t] - w0s[t]) // LANES, 0, ksub - 1),
                    nodes[t], hits[t], dists[t], leafs[t])

            return (tuple(nodes), tuple(hits), tuple(dists),
                    tuple(leafs), tuple(w0s), tuple(slots), step + 1)

        def cond(state):
            _, _, _, _, w0s, _, step = state
            live = w0s[0] < wb
            for t in range(1, T):
                live = live | (w0s[t] < wb)
            return live & (step < max_steps)

        zero = jnp.zeros((s, LANES), jnp.int32)
        zf = jnp.zeros((s, LANES), jnp.float32)
        state = (
            tuple(zero for _ in range(T)),
            tuple(zero for _ in range(T)),
            tuple(zf for _ in range(T)),
            tuple(zero for _ in range(T)),
            tuple(jnp.int32(0) for _ in range(T)),
            tuple(jnp.int32(0) for _ in range(T)),
            jnp.int32(0),
        )
        state = jax.lax.while_loop(cond, body, state)
        nodes, hits, dists, leafs, _, _, step = state
        for t in range(T):
            out_ref[0, t, 0] = dists[t]
            out_ref[0, t, 1] = pltpu.bitcast(leafs[t], jnp.float32)
            out_ref[0, t, 2] = pltpu.bitcast(hits[t], jnp.float32)
            out_ref[0, t, 3] = pltpu.bitcast(
                jnp.full((s, LANES), step, jnp.int32), jnp.float32)

    return kernel


def run_ilv(T, tbl, origin, direction, ntiles, s, n, wb, win, epsilon,
            max_steps):
    ntp = (ntiles + T - 1) // T * T
    if ntp != ntiles:  # pad with instant-miss tiles
        po = jnp.full((ntp - ntiles, 3, s, LANES), 1.0e30, jnp.float32)
        pd = jnp.ones((ntp - ntiles, 3, s, LANES), jnp.float32)
        origin = jnp.concatenate([origin, po], axis=0)
        direction = jnp.concatenate([direction, pd], axis=0)
    ng = ntp // T
    o4 = origin.reshape(ng, T, 3, s, LANES)
    d4 = direction.reshape(ng, T, 3, s, LANES)
    kernel = make_ilv_kernel(
        T, n_leaves=n, wb=wb, win=win, s=s, epsilon=epsilon,
        max_steps=max_steps)
    f = jax.jit(lambda t, o, d: pl.pallas_call(
        kernel,
        grid=(ng,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, T, 3, s, LANES), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, T, 3, s, LANES), lambda i: (i, 0, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, T, 4, s, LANES),
                               lambda i: (i, 0, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ng, T, 4, s, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, 2, win // LANES, CHP, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((T, 2)),
        ],
    )(t, o, d))
    out = jax.block_until_ready(f(tbl, o4, d4))
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(f(tbl, o4, d4))
    dt = (time.perf_counter() - t0) / 3
    steps = np.asarray(
        jax.lax.bitcast_convert_type(out[:, :, 3, 0, 0], jnp.int32))
    hits = np.asarray(
        jax.lax.bitcast_convert_type(out[:, :, 2], jnp.int32) > 0).sum()
    tot = int(steps[:, 0].sum())  # same counter in every tile of a group
    print(f"ilv T={T}: {dt*1e3:8.2f} ms ({W*H/dt/1e6:6.2f} Mrays/s)  "
          f"iters {tot:8d} ({dt/max(tot,1)*0.94e9:6.0f} cyc/iter)  "
          f"hits {hits}", flush=True)
    return out, dt


def main():
    scene = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=SUBDIV))
    n = int(scene.num_faces)
    print(f"tris={n}", flush=True)
    cam = Camera.default()
    cfg = RenderConfig(width=W, height=H, bounces=0)
    wvp, wv = camera_matrices(cam, W, H)
    bvh = jax.block_until_ready(
        jax.jit(lambda s: build_bvh(s, wvp, wv, cfg))(scene))
    perm, _ = tile_order(W, H, 16)
    rays = permute_rays(make_rays(cam, cfg), jnp.asarray(perm))

    win = 1024
    tbl = jax.block_until_ready(jax.jit(
        lambda b: pack_table_rank17(b, win))(bvh))
    wb = tbl.shape[0] * win
    origin, direction, nrays, ntiles, s = _prep_rays_blocked(rays, 1024)
    max_steps = 4 * n

    # reference hits from the shipping kernel for parity
    from raytracebvh_tpu.ops.traverse_hbm import traverse_hbm_pallas
    rec = jax.jit(lambda b, r: traverse_hbm_pallas(b, r, cfg.epsilon))(
        bvh, rays)
    ref_hit = np.asarray(rec.hit)
    ref_leaf = np.asarray(rec.leaf)
    ref_dist = np.asarray(rec.distance)
    print(f"ref hits {ref_hit.sum()}", flush=True)

    for T in (2, 4, 8):
        out, dt = run_ilv(T, tbl, origin, direction, ntiles, s, n, wb, win,
                          cfg.epsilon, max_steps)
        ng = ntiles // T
        o = np.asarray(out)  # [ng, T, 4, s, LANES]
        dist = o[:, :, 0].reshape(-1)[:nrays]
        leaf = o[:, :, 1].reshape(-1)[:nrays].view(np.int32)
        hit = o[:, :, 2].reshape(-1)[:nrays].view(np.int32) > 0
        ok_h = (hit == ref_hit).all()
        ok_l = (leaf[ref_hit] == ref_leaf[ref_hit]).all()
        ok_d = np.allclose(dist[ref_hit], ref_dist[ref_hit],
                           rtol=1e-6, atol=1e-6)
        print(f"  parity: hit {ok_h} leaf {ok_l} dist {ok_d}", flush=True)


if __name__ == "__main__":
    main()
