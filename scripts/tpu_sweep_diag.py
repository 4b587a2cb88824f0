#!/usr/bin/env python
"""Attribute the HBM windowed-sweep's per-micro-step cost on device.

bench.py r3: 102k tris -> 260669 steps in 167 ms = ~600 cycles/step vs
the ~110-op VPU model (18% of light).  This script times instrumented
kernel variants (same table, same rays) and normalizes by each variant's
own measured step count:

  base      — the shipping kernel (+ mispredict / window counters)
  nok0      — subtile id pinned to the min-lane's value computed but
              UNUSED for addressing (removes the scalar->address
              dependency, keeps the ops)
  noshuffle — per-lane gather replaced by a plain sublane broadcast
              (removes 17 take_along_axis; results invalid)
  nomath    — slab+MT replaced by trivial arithmetic (results invalid)

Invalid variants still advance lanes monotonically (nxt = node+1 /
skip), so their step counts stay comparable.

Run: python scripts/tpu_sweep_diag.py [subdiv]
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


def make_diag_kernel(variant, *, n_leaves, wb, win, s, epsilon, max_steps):
    done = wb

    def kernel(tbl_hbm, o_ref, d_ref, out_ref, wbuf, sem):
        ox, oy, oz = o_ref[0, 0], o_ref[0, 1], o_ref[0, 2]
        dx, dy, dz = d_ref[0, 0], d_ref[0, 1], d_ref[0, 2]
        idx_ = 1.0 / dx
        idy_ = 1.0 / dy
        idz_ = 1.0 / dz

        def dma(slot, w0):
            return pltpu.make_async_copy(
                tbl_hbm.at[w0 // win], wbuf.at[slot], sem.at[slot]
            )

        dma(0, 0).start()
        dma(0, 0).wait()

        def micro(state):
            node, hit, dist, leaf, w0, slot, step, nmiss, nwin = state
            in_win = (node >= w0) & (node < w0 + win)
            offw = jnp.where(in_win, node - w0, win)
            k0 = jnp.min(offw) // LANES
            if variant == "nok0":
                # keep the reduction (feeds nothing), pin the address
                k0 = k0 * 0
            off = offw - k0 * LANES
            active = in_win & (off >= 0) & (off < LANES)
            lane = jnp.clip(off, 0, LANES - 1)

            sub = wbuf[slot, k0]
            if variant == "noshuffle":
                row = [jnp.broadcast_to(sub[c:c + 1, :], (s, LANES))
                       for c in range(CH)]
            else:
                row = _splat(sub, lane, s)
            skipr = pltpu.bitcast(row[6], jnp.int32)
            skipr = jnp.where(skipr < 0, done, skipr)
            orig = pltpu.bitcast(row[7], jnp.int32)
            is_leaf = orig < n_leaves

            if variant == "nomath":
                tmin = row[0] + row[1]
                box_ok = tmin < 1.0e30
                t = row[8] + row[9]
                tri_ok = t > 0.0
            else:
                tmin, box_ok, t, tri_ok = _slab_mt(
                    row, ox, oy, oz, dx, dy, dz, idx_, idy_, idz_, epsilon
                )

            hitb = hit > 0
            bhit = box_ok & (jnp.logical_not(hitb) | (tmin <= dist)) & active
            upd = (bhit & is_leaf & tri_ok
                   & (jnp.logical_not(hitb) | (t < dist)))
            dist = jnp.where(upd, t, dist)
            leaf = jnp.where(upd, orig, leaf)
            hit = jnp.where(upd, 1, hit)
            nxt = jnp.where(bhit & jnp.logical_not(is_leaf), node + 1, skipr)
            node = jnp.where(active, nxt, node)
            return node, hit, dist, leaf, w0, slot, step + 1, nmiss, nwin

        def micro_cond(state):
            node, _, _, _, w0, _, step, _, _ = state
            stay = (node >= w0) & (node < w0 + win)
            return jnp.logical_and(jnp.any(stay), step < max_steps)

        def outer(state):
            node, hit, dist, leaf, w0, slot, step, nmiss, nwin = state
            pred = w0 + win
            started = pred < wb

            @pl.when(started)
            def _():
                dma(1 - slot, pred).start()

            state = jax.lax.while_loop(
                micro_cond, micro,
                (node, hit, dist, leaf, w0, slot, step, nmiss, nwin),
            )
            node, hit, dist, leaf, _, _, step, nmiss, nwin = state

            m = jnp.min(node)
            next_w0 = jnp.minimum(m // win * win, wb)

            @pl.when(started)
            def _():
                dma(1 - slot, pred).wait()

            miss = jnp.logical_and(next_w0 < wb, next_w0 != pred)

            @pl.when(miss)
            def _():
                dma(1 - slot, next_w0).start()
                dma(1 - slot, next_w0).wait()

            nmiss = nmiss + jnp.where(miss, 1, 0)
            nwin = nwin + jnp.where(next_w0 < wb, 1, 0)
            slot = jnp.where(next_w0 < wb, 1 - slot, slot)
            return node, hit, dist, leaf, next_w0, slot, step, nmiss, nwin

        def outer_cond(state):
            _, _, _, _, w0, _, step, _, _ = state
            return jnp.logical_and(w0 < wb, step < max_steps)

        zero = jnp.zeros((s, LANES), jnp.int32)
        state = (zero, zero, jnp.zeros((s, LANES), jnp.float32), zero,
                 jnp.int32(0), jnp.int32(0), jnp.int32(0), jnp.int32(0),
                 jnp.int32(1))
        node, hit, dist, leaf, _, _, step, nmiss, nwin = jax.lax.while_loop(
            outer_cond, outer, state
        )
        out_ref[0, 0] = dist
        out_ref[0, 1] = pltpu.bitcast(leaf, jnp.float32)
        out_ref[0, 2] = pltpu.bitcast(hit, jnp.float32)
        out_ref[0, 3] = pltpu.bitcast(
            jnp.full((s, LANES), step, jnp.int32), jnp.float32)
        out_ref[0, 4] = pltpu.bitcast(
            jnp.full((s, LANES), nmiss, jnp.int32), jnp.float32)
        out_ref[0, 5] = pltpu.bitcast(
            jnp.full((s, LANES), nwin, jnp.int32), jnp.float32)

    return kernel


def run_variant(variant, tbl, origin, direction, ntiles, s, n, wb, win,
                epsilon, max_steps):
    kernel = make_diag_kernel(
        variant, n_leaves=n, wb=wb, win=win, s=s, epsilon=epsilon,
        max_steps=max_steps)
    f = jax.jit(lambda t, o, d: pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 3, s, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 3, s, LANES), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 6, s, LANES), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((ntiles, 6, s, LANES), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, win // LANES, CHP, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )(t, o, d))
    out = jax.block_until_ready(f(tbl, origin, direction))
    t0 = time.perf_counter()
    for _ in range(3):
        out = jax.block_until_ready(f(tbl, origin, direction))
    dt = (time.perf_counter() - t0) / 3
    steps = np.asarray(
        jax.lax.bitcast_convert_type(out[:, 3, 0, 0], jnp.int32))
    miss = np.asarray(
        jax.lax.bitcast_convert_type(out[:, 4, 0, 0], jnp.int32))
    nwin = np.asarray(
        jax.lax.bitcast_convert_type(out[:, 5, 0, 0], jnp.int32))
    hits = np.asarray(
        jax.lax.bitcast_convert_type(out[:, 2], jnp.int32) > 0).sum()
    tot = int(steps.sum())
    print(f"{variant:10s} {dt*1e3:8.2f} ms  steps {tot:8d} "
          f"({dt/max(tot,1)*1e9:6.1f} ns/step = "
          f"{dt/max(tot,1)*0.94e9:6.0f} cyc)  windows/tile "
          f"{nwin.mean():6.1f}  mispredicts/tile {miss.mean():5.1f}  "
          f"hits {hits}", flush=True)
    return dt, tot


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

    for v in ("base", "nok0", "noshuffle", "nomath"):
        run_variant(v, tbl, origin, direction, ntiles, s, n, wb, win,
                    cfg.epsilon, max_steps)


if __name__ == "__main__":
    main()
