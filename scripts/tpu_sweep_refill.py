#!/usr/bin/env python
"""Prototype: persistent T-slot refill sweep (HBM traversal v2).

tpu_sweep_ilv.py showed T interleaved tiles hide the per-step latency
chain (645 -> ~140 cyc/serve marginal) but fixed-group lockstep wastes
>50% of serves (fast tiles idle until the group's slowest drains).
This kernel makes the tiles SLOTS of a single persistent grid instance:
a slot that finishes its ray block DMAs the results out, DMAs the next
block's rays in, and restarts — so all T chains stay busy until the
frame runs out of blocks.

Run: python scripts/tpu_sweep_refill.py [subdiv] [T]
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
T_ARG = int(sys.argv[2]) if len(sys.argv) > 2 else 8
W, H = 1920, 1080
RCH = 9  # ray channels: o.xyz, d.xyz, 1/d.xyz


def make_refill_kernel(T, *, n_leaves, ntiles, wb, win, s, epsilon,
                       max_steps):
    done = wb
    ksub = win // LANES

    def kernel(tbl_hbm, rays_hbm, out_hbm, wbuf, rbuf, obuf,
               wsem, rsem, osem):
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
            offw = jnp.where((node >= w0) & (node < w0 + win),
                             node - w0, win)
            ox = rbuf[t, 0]
            oy = rbuf[t, 1]
            oz = rbuf[t, 2]
            dx = rbuf[t, 3]
            dy = rbuf[t, 4]
            dz = rbuf[t, 5]
            idx_ = rbuf[t, 6]
            idy_ = rbuf[t, 7]
            idz_ = rbuf[t, 8]
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
            (nodes, hits, dists, leafs, w0s, slots, blks, stepc, pos, nb,
             it) = state
            nodes, hits, dists, leafs = (list(nodes), list(hits),
                                         list(dists), list(leafs))
            w0s, slots, blks, stepc, pos = (list(w0s), list(slots),
                                            list(blks), list(stepc),
                                            list(pos))

            ms = [jnp.min(nodes[t]) for t in range(T)]
            refills = []

            # ---- window logistics + refill (rare scalar branches)
            for t in range(T):
                live = blks[t] >= 0
                drained = live & (ms[t] >= w0s[t] + win) & (w0s[t] < wb)
                nxt_w0 = jnp.minimum(ms[t] // win * win, wb)
                pred = w0s[t] + win

                @pl.when(drained)
                def _(t=t, nxt_w0=nxt_w0, pred=pred):
                    @pl.when(pred < wb)
                    def _():
                        wdma(t, 1 - slots[t], pred).wait()

                    @pl.when((nxt_w0 < wb) & (nxt_w0 != pred))
                    def _():
                        wdma(t, 1 - slots[t], nxt_w0).start()
                        wdma(t, 1 - slots[t], nxt_w0).wait()

                w0_a = jnp.where(drained, nxt_w0, w0s[t])
                slot_a = jnp.where(drained & (nxt_w0 < wb),
                                   1 - slots[t], slots[t])

                @pl.when(drained & (nxt_w0 < wb) & (nxt_w0 + win < wb))
                def _(t=t, slot_a=slot_a, nxt_w0=nxt_w0):
                    wdma(t, 1 - slot_a, nxt_w0 + win).start()

                # ---- block finished: write out, refill or retire
                fin = live & (w0_a >= wb)
                refill = fin & (nb < ntiles)

                @pl.when(fin)
                def _(t=t, dist=dists[t], leaf=leafs[t], hit=hits[t],
                      st=stepc[t], blk=blks[t], refill=refill, nb=nb,
                      po=pos[t]):
                    # obuf[t] may still be in flight from this slot's
                    # previous block — wait that copy before overwriting
                    # (the semaphore counts bytes; any same-shape
                    # descriptor works for the wait)
                    @pl.when(po > 0)
                    def _():
                        odma(t, 0).wait()

                    obuf[t, 0] = dist
                    obuf[t, 1] = pltpu.bitcast(leaf, jnp.float32)
                    obuf[t, 2] = pltpu.bitcast(hit, jnp.float32)
                    obuf[t, 3] = pltpu.bitcast(
                        jnp.full((s, LANES), st, jnp.int32), jnp.float32)
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

            # ---- subtile loads: all T issued before any serve (no
            # serve waits on another slot's scalar->address chain)
            ks = []
            subs = []
            for t in range(T):
                m = jnp.where(refills[t], 0, ms[t])  # refilled: rank 0
                ks.append(jnp.clip((m - w0s[t]) // LANES, 0, ksub - 1))
                subs.append(wbuf[t, slots[t], ks[t]])

            # ---- serves: T independent pure-vector chains
            for t in range(T):
                nodes[t], hits[t], dists[t], leafs[t] = serve(
                    t, subs[t], ks[t], nodes[t], hits[t], dists[t],
                    leafs[t], w0s[t])
                stepc[t] = stepc[t] + jnp.where(blks[t] >= 0, 1, 0)

            return (tuple(nodes), tuple(hits), tuple(dists), tuple(leafs),
                    tuple(w0s), tuple(slots), tuple(blks), tuple(stepc),
                    tuple(pos), nb, it + 1)

        def cond(state):
            blks = state[6]
            it = state[10]
            live = blks[0] >= 0
            for t in range(1, T):
                live = live | (blks[t] >= 0)
            return live & (it < max_steps)

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
            jnp.int32(min(T, ntiles)),  # next block
            jnp.int32(0),  # global iteration counter
        )
        state = jax.lax.while_loop(cond, body, state)

        # drain pending out-DMAs (every slot that retired has one)
        for t in range(min(T, ntiles)):
            odma(t, 0).wait()

    return kernel


def run_refill(T, tbl, origin, direction, ntiles, s, n, wb, win, epsilon):
    # fuse o/d/invd into one [ntiles, RCH, s, L] ray table
    inv = 1.0 / direction
    rays9 = jnp.concatenate([origin, direction, inv], axis=1)
    max_steps = 64 * n + 512 * ntiles
    kernel = make_refill_kernel(
        T, n_leaves=n, ntiles=ntiles, wb=wb, win=win, s=s,
        epsilon=epsilon, max_steps=max_steps)
    f = jax.jit(lambda t, r: pl.pallas_call(
        kernel,
        grid=(1,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ntiles, 4, s, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((T, 2, win // LANES, CHP, LANES), jnp.float32),
            pltpu.VMEM((T, RCH, s, LANES), jnp.float32),
            pltpu.VMEM((T, 4, s, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((T, 2)),
            pltpu.SemaphoreType.DMA((T,)),
            pltpu.SemaphoreType.DMA((T,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(t, r))
    out = jax.block_until_ready(f(tbl, rays9))
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(f(tbl, rays9))
    dt = (time.perf_counter() - t0) / 3
    steps = np.asarray(
        jax.lax.bitcast_convert_type(out[:, 3, 0, 0], jnp.int32))
    hits = np.asarray(
        jax.lax.bitcast_convert_type(out[:, 2], jnp.int32) > 0).sum()
    tot = int(steps.sum())
    print(f"refill T={T}: {dt*1e3:8.2f} ms ({W*H/dt/1e6:6.2f} Mrays/s)  "
          f"serves {tot:8d} ({dt/max(tot,1)*0.94e9:6.0f} cyc/serve)  "
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

    from raytracebvh_tpu.ops.traverse_hbm import traverse_hbm_pallas
    rec = jax.jit(lambda b, r: traverse_hbm_pallas(b, r, cfg.epsilon))(
        bvh, rays)
    ref_hit = np.asarray(rec.hit)
    ref_leaf = np.asarray(rec.leaf)
    ref_dist = np.asarray(rec.distance)
    print(f"ref hits {ref_hit.sum()}", flush=True)

    for T in (T_ARG,):
        out, dt = run_refill(T, tbl, origin, direction, ntiles, s, n, wb,
                             win, cfg.epsilon)
        o = np.asarray(out)
        dist = o[:, 0].reshape(-1)[:nrays]
        leaf = o[:, 1].reshape(-1)[:nrays].view(np.int32)
        hit = o[:, 2].reshape(-1)[:nrays].view(np.int32) > 0
        ok_h = (hit == ref_hit).all()
        ok_l = (leaf[ref_hit] == ref_leaf[ref_hit]).all()
        ok_d = np.allclose(dist[ref_hit], ref_dist[ref_hit],
                           rtol=1e-6, atol=1e-6)
        print(f"  parity: hit {ok_h} leaf {ok_l} dist {ok_d}", flush=True)


if __name__ == "__main__":
    main()
