#!/usr/bin/env python
"""Attribute the HBM windowed-sweep's per-micro-step cost on device.

bench.py r3: 102k tris -> 260669 steps in 167 ms = ~617 cycles/step vs
the ~110-op VPU model (18% of light).  Control flow must be identical
across variants or step counts diverge (a pinned-k0 variant livelocks),
so costs are measured by DOUBLING a component and consuming the copy
through a cheap compare (marginal cost = T(dbl) - T(base)):

  base        — shipping kernel + window/mispredict counters
  dbl_shuffle — second 17-channel _splat per step
  dbl_math    — second _slab_mt per step
  serve2      — REAL candidate: serve the two lowest occupied subtiles
                per iteration (two shuffles+tests per scalar chain)

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

        def serve(sub, offw, k, node, hit, dist, leaf, gate):
            """Serve lanes whose rank sits in 128-rank subtile ``k`` of
            the window; ``gate`` masks the whole serve (serve2 dedup)."""
            off = offw - k * LANES
            active = (off >= 0) & (off < LANES) & (offw < win) & gate
            lane = jnp.clip(off, 0, LANES - 1)
            row = _splat(sub, lane, s)
            skipr = pltpu.bitcast(row[6], jnp.int32)
            skipr = jnp.where(skipr < 0, done, skipr)
            orig = pltpu.bitcast(row[7], jnp.int32)
            is_leaf = orig < n_leaves
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
            return node, hit, dist, leaf, row

        def micro(state):
            node, hit, dist, leaf, w0, slot, step, nmiss, nwin = state
            in_win = (node >= w0) & (node < w0 + win)
            offw = jnp.where(in_win, node - w0, win)
            k0 = jnp.min(offw) // LANES
            sub = wbuf[slot, k0]
            true_ = jnp.full((s, LANES), True)
            node, hit, dist, leaf, row = serve(
                sub, offw, k0, node, hit, dist, leaf, true_)

            if variant == "dbl_shuffle":
                lane2 = jnp.clip(offw - k0 * LANES + 1, 0, LANES - 1)
                row2 = _splat(sub, lane2, s)
                # consume (BIGBOX never exceeded by real boxes)
                nmiss = nmiss + jnp.where(
                    jnp.any(row2[0] > 2.0e30), 1, 0)
            elif variant == "dbl_math":
                tm2, bo2, t2, to2 = _slab_mt(
                    row, oy, oz, ox, dy, dz, dx, idy_, idz_, idx_,
                    epsilon)
                nmiss = nmiss + jnp.where(jnp.any(t2 > 2.0e30), 1, 0)
            elif variant == "serve2":
                # second-lowest occupied subtile (recompute offw from the
                # post-serve ranks: lanes just served may re-enter)
                in2 = (node >= w0) & (node < w0 + win)
                offw2 = jnp.where(in2, node - w0, win)
                k1 = jnp.min(jnp.where(
                    offw2 // LANES == k0, win, offw2)) // LANES
                gate = jnp.full((s, LANES), k1 > k0) & (k1 < win // LANES)
                sub1 = wbuf[slot, jnp.minimum(k1, win // LANES - 1)]
                node, hit, dist, leaf, _ = serve(
                    sub1, offw2, k1, node, hit, dist, leaf, gate)

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
                epsilon, max_steps, base_dt=None):
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
    extra = ""
    if base_dt is not None:
        extra = f"  marginal {(dt-base_dt)/max(tot,1)*0.94e9:+6.0f} cyc/step"
    print(f"{variant:12s} {dt*1e3:8.2f} ms  steps {tot:8d} "
          f"({dt/max(tot,1)*0.94e9:6.0f} cyc/step)  win/tile "
          f"{nwin.mean():5.1f}  miss/tile {miss.mean():4.1f}  "
          f"hits {hits}{extra}", flush=True)
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

    base_dt, _ = run_variant("base", tbl, origin, direction, ntiles, s, n,
                             wb, win, cfg.epsilon, max_steps)
    for v in ("dbl_shuffle", "dbl_math", "serve2"):
        run_variant(v, tbl, origin, direction, ntiles, s, n, wb, win,
                    cfg.epsilon, max_steps, base_dt)


if __name__ == "__main__":
    main()
