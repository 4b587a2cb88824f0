#!/usr/bin/env python
"""Headline benchmark: rays/sec/chip (fwd+bwd) at 1080p on Image_Test.obj.

Prints ONE JSON line on stdout: {"metric", "value", "unit", "vs_baseline"}.
Sub-metrics (builds/sec, forward-only, shadow config, roofline accounting)
go to stderr and to BENCH_DETAIL.json.

The reference publishes no numbers (BASELINE.md: only a runtime FPS print,
Graphics.cpp:65-92), so the bar is self-established per BASELINE.json: a
full frame that rebuilds the LBVH from scratch, traces primary rays + one
reflection bounce, and runs the backward pass producing vertex/material
gradients.  BASELINE_RAYS_PER_SEC = 20e6 is the round-1 target (~10
fwd+bwd 1080p frames/sec); round-1 measured 14.8e6 (BENCH_r01.json).

Roofline: the compiled step's XLA cost analysis gives flops and HBM bytes;
speed-of-light is max(bytes/HBM_BW, flops/peak).  The hot loops are VPU
(vector) work, not MXU matmuls, so the compute bound uses the VPU peak.
"""

import json
import os
import sys
import time

import numpy as np

BASELINE_RAYS_PER_SEC = 20.0e6  # round-1 target; round 1 measured 14.8e6
ROUND1_RAYS_PER_SEC = 14.8e6  # BENCH_r01.json, for round-over-round delta

# TPU v5e (1 chip) peaks for the roofline print
HBM_BW = 8.1e11  # bytes/sec
VPU_F32 = 3.9e12  # flop/sec, vector unit (8x128 lanes)
MXU_BF16 = 1.97e14


def _cost(compiled):
    try:
        ca = compiled.cost_analysis()
        if isinstance(ca, (list, tuple)):
            ca = ca[0]
        return float(ca.get("flops", 0.0)), float(
            ca.get("bytes accessed", 0.0)
        )
    except Exception:
        return 0.0, 0.0


def main():
    import jax
    import jax.numpy as jnp

    from raytracebvh_tpu import Camera, RenderConfig
    from raytracebvh_tpu.camera import camera_matrices
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.models.inverse import init_params, loss_fn
    from raytracebvh_tpu.pipeline import build_bvh, render_frame
    from raytracebvh_tpu.utils.assets import find_asset

    detail = {"chip": str(jax.devices()[0]), "backend": jax.default_backend()}

    path = find_asset("Image_Test.obj")
    if path is not None:
        from raytracebvh_tpu.io.obj import load_obj

        scene_h = load_obj(path)
    else:
        from raytracebvh_tpu.models.procedural import sphere_grid

        scene_h = sphere_grid(nx=4, ny=3, subdiv=8)  # ~3k tris
    scene = scene_to_device(scene_h)

    width, height, bounces = 1920, 1080, 1
    # ray_chunk + cull_empty_chunks: the shade path is chunk-culled
    # (bit-identical image; all-miss chunks are pure background) —
    # tests/test_ray_chunk.py pins image+grad equality vs unchunked
    cfg = RenderConfig(width=width, height=height, bounces=bounces,
                       ray_chunk=25600)
    cam = Camera.default()
    rays_per_frame = width * height * (1 + bounces)

    def timed(fn, *args, warmup=1, iters=3):
        for _ in range(warmup):
            jax.block_until_ready(fn(*args))
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(fn(*args))
        return (time.perf_counter() - t0) / iters

    params = init_params(scene)
    target = jnp.zeros((height, width, 4), jnp.float32)

    # ---- DENSE frame (round-5 verdict item 1): the subject fills the
    # 1080p frame (ortho_scale=256 -> 72% of rays hit vs 0.15% in the
    # sparse headline; reference out.bmp shows a frame-filling subject).
    # Every pixel pays traversal AND shade here, so the sparse frame's
    # chunk-cull lever is ~worthless and the regime-specific winners
    # apply: the HBM rank-sweep traversal (the VMEM lock-step kernel
    # collapses to 10.6 Mrays/s on dense divergent lanes), 16px-tile ray
    # order, and the windowed u32-UNORM8 texture gather.  Measured FIRST,
    # in a pristine process: with the headline executables live the same
    # fwd read 320-417 ms vs ~160 stable standalone.
    dense = {}
    try:
        cfg_d = cfg.replace(
            ortho_scale=256.0, ray_chunk=0, traversal_backend="hbm",
            ray_tile=16, texture_dtype="uint8",
        )
        fwd_d = jax.jit(lambda s, c: render_frame(s, c, cfg_d))
        img_d = fwd_d(scene, cam)
        t_fd = timed(fwd_d, scene, cam, warmup=1, iters=3)
        # hit rate census (from the background alpha channel: miss
        # pixels carry the exact background color)
        bg = np.asarray(cfg_d.background)
        miss = (np.abs(np.asarray(img_d) - bg) < 1e-6).all(-1).sum()
        dense["hit_rate"] = 1.0 - float(miss) / (width * height)
        dense["fwd_ms"] = t_fd * 1e3
        dense["fwd_mrays_per_sec"] = rays_per_frame / t_fd / 1e6
        print(f"# dense frame ({100*dense['hit_rate']:.0f}% hit): fwd "
              f"{t_fd*1e3:.1f} ms -> {rays_per_frame/t_fd/1e6:.2f} Mrays/s",
              file=sys.stderr)

        cfg_dsh = cfg_d.replace(bounces=0, enable_shadows=True)
        fwd_dsh = jax.jit(lambda s, c: render_frame(s, c, cfg_dsh))
        t_dsh = timed(fwd_dsh, scene, cam, warmup=1, iters=3)
        dense["shadows_ms"] = t_dsh * 1e3
        dense["shadows_mrays_per_sec"] = width * height * 2 / t_dsh / 1e6
        print(f"# dense shadows: {t_dsh*1e3:.1f} ms -> "
              f"{width*height*2/t_dsh/1e6:.2f} Mrays/s", file=sys.stderr)

        grad_d = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(p, scene, cam, target, cfg_d)))
        t_gd = timed(grad_d, params, warmup=1, iters=3)
        _, g_d = grad_d(params)
        dense["fwd_bwd_ms"] = t_gd * 1e3
        dense["fwd_bwd_mrays_per_sec"] = rays_per_frame / t_gd / 1e6
        dense["fwd_bwd_grads_finite"] = bool(
            np.isfinite(np.asarray(g_d.vert_offsets)).all())
        print(f"# dense fwd+bwd: {t_gd*1e3:.1f} ms -> "
              f"{rays_per_frame/t_gd/1e6:.2f} Mrays/s (grads finite: "
              f"{dense['fwd_bwd_grads_finite']})", file=sys.stderr)
        del fwd_d, fwd_dsh, grad_d, img_d, g_d
        jax.clear_caches()
    except Exception as e:  # pragma: no cover
        dense["error"] = f"{type(e).__name__}: {e}"
        print(f"# dense bench failed: {dense['error']}", file=sys.stderr)
    detail["dense"] = dense

    # ---- BVH builds/sec (full morton+sort+karras+fit+links rebuild).
    # K rebuilds (distinct camera transforms) run inside ONE jitted scan,
    # like the reference enqueues its build in the frame's command list
    # without host syncs between stages (Graphics.cpp:707-782): the
    # per-build device time is the scan's marginal cost, free of the
    # per-dispatch host/runtime overhead a standalone call pays.
    scene_nt = scene.replace(
        textures=jnp.zeros((1, 1, 1, 4), jnp.float32),
        tex_hw=jnp.ones((1, 2), jnp.int32),
    )
    wvp, wv = camera_matrices(cam, width, height)

    def build_digest(s, yaw):
        # tiny camera-dependent perturbation so no two builds fold
        c = jnp.cos(yaw)
        w2 = wvp.at[0, 0].mul(c)
        bvh = build_bvh(s, w2, wv, cfg)
        return bvh.bbmin[s.num_faces].sum() + bvh.skip_link.sum()

    def builds_k(k):
        @jax.jit
        def f(s):
            def step(acc, yaw):
                return acc + build_digest(s, yaw), None
            acc, _ = jax.lax.scan(
                step, jnp.float32(0.0), jnp.linspace(0.0, 0.1, k)
            )
            return acc
        return f

    f1, f9 = builds_k(1), builds_k(9)
    t1 = timed(f1, scene_nt, warmup=1, iters=5)
    t9 = timed(f9, scene_nt, warmup=1, iters=5)
    t_build = max((t9 - t1) / 8.0, 1e-9)  # marginal in-stream build time
    detail["bvh_build_ms"] = t_build * 1e3
    detail["bvh_builds_per_sec"] = 1.0 / t_build
    detail["bvh_build_standalone_ms"] = t1 * 1e3
    print(f"# bvh_build: {t_build*1e3:.3f} ms in-stream "
          f"({t1*1e3:.1f} ms standalone incl dispatch) -> "
          f"{1.0/t_build:.1f} builds/sec ({scene_h.num_faces} tris)",
          file=sys.stderr)

    # ---- sort backend A/B (round-5 verdict item 3c): the same
    # marginal in-stream build, lax.sort vs the in-VMEM bitonic kernel.
    # The winner is wired as the shipped default (config.py
    # sort_backend); the loser stays selectable + tested.
    try:
        def builds_sort(k, backend):
            cfg_s = cfg.replace(sort_backend=backend)

            @jax.jit
            def f(s):
                def step(acc, yaw):
                    c = jnp.cos(yaw)
                    w2 = wvp.at[0, 0].mul(c)
                    bvh = build_bvh(s, w2, wv, cfg_s)
                    return acc + bvh.bbmin[s.num_faces].sum() + bvh.skip_link.sum(), None
                acc, _ = jax.lax.scan(
                    step, jnp.float32(0.0), jnp.linspace(0.0, 0.1, k))
                return acc
            return f

        # k=33: the marginal divides per-call jitter by 32 — at k=9 the
        # A/B flip-flopped between runs (0.26-0.51 ms, difference within
        # per-call noise/8).  lax.scan's trip count is compile-cheap.
        sort_ab = {}
        for backend in ("lax", "bitonic"):
            tb1 = timed(builds_sort(1, backend), scene_nt, warmup=1, iters=5)
            tb33 = timed(builds_sort(33, backend), scene_nt, warmup=1,
                         iters=5)
            sort_ab[backend] = max((tb33 - tb1) / 32.0, 1e-9) * 1e3
        detail["sort_ab_build_ms"] = sort_ab
        winner = min(sort_ab, key=sort_ab.get)
        detail["sort_ab_winner"] = winner
        print(f"# sort A/B (in-stream build): lax {sort_ab['lax']:.3f} ms "
              f"vs bitonic {sort_ab['bitonic']:.3f} ms -> {winner}",
              file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# sort A/B failed: {e}", file=sys.stderr)

    # ---- forward-only frame
    fwd = jax.jit(lambda s, c: render_frame(s, c, cfg))
    t_fwd = timed(fwd, scene, cam, warmup=1, iters=3)
    detail["fwd_ms"] = t_fwd * 1e3
    detail["fwd_mrays_per_sec"] = rays_per_frame / t_fwd / 1e6
    print(f"# forward frame: {t_fwd*1e3:.1f} ms -> "
          f"{rays_per_frame/t_fwd/1e6:.2f} Mrays/s", file=sys.stderr)

    # ---- headline stage accounting (round-5 verdict item 6): decompose
    # the sparse fwd frame with a measured micro-step counter on the
    # <=32k-leaf Pallas kernel + the culled-chunk census, replacing the
    # vacuous frame-level HBM bound.
    try:
        from raytracebvh_tpu.ops.traverse_pallas import traverse_pallas
        from raytracebvh_tpu.pipeline import make_rays

        # traversal time via the same scan-marginal method as the build
        # (in-stream, free of per-dispatch/sync artifacts)
        def bt_k(k):
            @jax.jit
            def f(s):
                def step(acc, yaw):
                    c2 = jnp.cos(yaw)
                    w2 = wvp.at[0, 0].mul(c2)
                    bvh = build_bvh(s, w2, wv, cfg)
                    rays = make_rays(cam, cfg)
                    rec, steps = traverse_pallas(
                        bvh, rays, cfg.epsilon, return_steps=True)
                    return acc + rec.distance.sum() + steps.sum(), None
                acc, _ = jax.lax.scan(
                    step, jnp.float32(0.0), jnp.linspace(0.0, 0.1, k))
                return acc
            return f

        tb1 = timed(bt_k(1), scene, warmup=1, iters=3)
        tb5 = timed(bt_k(5), scene, warmup=1, iters=3)
        trav_ms = max((tb5 - tb1) / 4.0 - t_build, 1e-9) * 1e3

        def trav_census(s):
            bvh = build_bvh(s, wvp, wv, cfg)
            rays = make_rays(cam, cfg)
            rec, steps = traverse_pallas(
                bvh, rays, cfg.epsilon, return_steps=True)
            return steps, jnp.sum(rec.hit.reshape(-1, cfg.ray_chunk), 1)

        steps_h, chunk_hits = jax.jit(trav_census)(scene)
        total_steps_h = int(np.asarray(steps_h).sum())
        shaded = int((np.asarray(chunk_hits) > 0).sum())
        nchunks = int(np.asarray(chunk_hits).shape[0])
        # same VPU micro-step light model as the hbm kernel: >=110
        # (8,128)-vreg ops per step (16-ch splat + slab/MT + bookkeeping)
        t_light_h = total_steps_h * 110 / 0.94e9
        detail["headline_stages"] = {
            "build_ms": t_build * 1e3,
            "primary_traversal_ms": trav_ms,
            "primary_microsteps": total_steps_h,
            "primary_pct_of_step_light": 100.0 * t_light_h * 1e3 / trav_ms,
            "chunks_shaded": shaded,
            "chunks_total": nchunks,
            "shade_etc_ms_est": t_fwd * 1e3 - t_build * 1e3 - trav_ms,
            "note": ("build + primary traversal measured in-stream "
                     "(scan-marginal); shade_etc = fwd - build - "
                     "traversal, which also carries the per-call host "
                     "sync overhead of this tunneled chip"),
        }
        print(f"# headline decomposition: build {t_build*1e3:.2f} ms + "
              f"primary traversal {trav_ms:.1f} ms ({total_steps_h} steps, "
              f"{100.0*t_light_h*1e3/trav_ms:.0f}% of step-light) + "
              f"shade/sync ~{t_fwd*1e3 - t_build*1e3 - trav_ms:.1f} ms; "
              f"{shaded}/{nchunks} chunks shaded", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# headline stage accounting failed: {e}", file=sys.stderr)

    # ---- shadow config (BASELINE config 3): 1080p shading + shadow rays
    cfg_sh = cfg.replace(bounces=0, enable_shadows=True)
    fwd_sh = jax.jit(lambda s, c: render_frame(s, c, cfg_sh))
    t_sh = timed(fwd_sh, scene, cam, warmup=1, iters=3)
    sh_rays = width * height * 2  # primary + shadow
    detail["shadows_ms"] = t_sh * 1e3
    detail["shadows_mrays_per_sec"] = sh_rays / t_sh / 1e6
    print(f"# shadows frame: {t_sh*1e3:.1f} ms -> "
          f"{sh_rays/t_sh/1e6:.2f} Mrays/s (primary+shadow)", file=sys.stderr)

    # ---- fwd+bwd (the headline): gradient of the image loss w.r.t.
    # vertex offsets + material colors (params/target defined up top).
    # The TRAINING config differs from the forward config: chunk-culling
    # wins forward (52.9 vs 82.6 ms) but loses fwd+bwd (139.9 vs 95.4 —
    # the backward pays the 81-chunk scan without the cull's savings),
    # where the unchunked HBM rank-sweep + 16px tiles + UNORM8 quads
    # win (round-5 sweep; u8 is bit-exact for the 8-bit BMP source, so
    # loss/grads are unchanged).
    cfg_bwd = cfg.replace(ray_chunk=0, ray_tile=16,
                          traversal_backend="hbm", texture_dtype="uint8")
    grad_fn = jax.jit(jax.value_and_grad(
        lambda p: loss_fn(p, scene, cam, target, cfg_bwd)
    ))
    t_step = timed(grad_fn, params, warmup=1, iters=3)
    try:  # XLA cost-model numbers for the roofline section (the
        # executable is dropped before the large-scene block)
        xla_flops, xla_bytes = _cost(grad_fn.lower(params).compile())
    except Exception:
        xla_flops, xla_bytes = 0.0, 0.0
    rays_per_sec = rays_per_frame / t_step
    detail["fwd_bwd_ms"] = t_step * 1e3
    detail["fwd_bwd_mrays_per_sec"] = rays_per_sec / 1e6
    print(f"# fwd+bwd frame: {t_step*1e3:.1f} ms -> "
          f"{rays_per_sec/1e6:.2f} Mrays/s "
          f"(round 1: {ROUND1_RAYS_PER_SEC/1e6:.1f})", file=sys.stderr)

    # ---- in-stream marginal frame times (supplementary): the blocked
    # per-call numbers above carry a ~25-40 ms host-sync constant on the
    # tunneled chip (BENCH_NOTES round 5); a K-frame lax.scan's marginal
    # cancels it and reads pure device time per frame.  The primary
    # metric stays the blocked method for round-over-round continuity.
    try:
        def frames_k(k, c):
            @jax.jit
            def f(s):
                def step(acc, yaw):
                    cc = cam.replace(eye=cam.eye.at[0].add(yaw))
                    return acc + render_frame(s, cc, c).sum(), None
                acc, _ = jax.lax.scan(
                    step, jnp.float32(0.0), jnp.linspace(0.0, 0.01, k))
                return acc
            return f

        def grads_k(k):
            @jax.jit
            def f(p):
                def step(acc, eps):
                    p2 = jax.tree_util.tree_map(lambda x: x + eps, p)
                    l, g = jax.value_and_grad(
                        lambda q: loss_fn(q, scene, cam, target, cfg_bwd)
                    )(p2)
                    return acc + l + g.vert_offsets.sum(), None
                acc, _ = jax.lax.scan(
                    step, jnp.float32(0.0), jnp.linspace(0.0, 1e-7, k))
                return acc
            return f

        tf1 = timed(frames_k(1, cfg), scene, warmup=1, iters=3)
        tf5 = timed(frames_k(5, cfg), scene, warmup=1, iters=3)
        m_fwd = max((tf5 - tf1) / 4.0, 1e-9)
        tg1 = timed(grads_k(1), params, warmup=1, iters=3)
        tg3 = timed(grads_k(3), params, warmup=1, iters=3)
        m_bwd = max((tg3 - tg1) / 2.0, 1e-9)
        detail["fwd_marginal_ms"] = m_fwd * 1e3
        detail["fwd_bwd_marginal_ms"] = m_bwd * 1e3
        print(f"# in-stream marginal: fwd {m_fwd*1e3:.1f} ms "
              f"({rays_per_frame/m_fwd/1e6:.1f} Mrays/s device-only), "
              f"fwd+bwd {m_bwd*1e3:.1f} ms "
              f"({rays_per_frame/m_bwd/1e6:.1f} Mrays/s)", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# marginal frame timing failed: {e}", file=sys.stderr)

    # ---- interactive loop (round-5 verdict item 7): a 20-frame camera
    # orbit at 800x800/3 bounces (the reference's actual usage:
    # per-frame loop, Graphics.cpp:667-831).  Naive = host blocks each
    # frame (pays the tunnel sync every frame); pipelined = enqueue all,
    # drain the in-order queue once (cli/render.py default).
    try:
        from raytracebvh_tpu.camera import orbit

        cfg_i = RenderConfig(width=800, height=800, bounces=3,
                             ray_chunk=25600)
        f_i = jax.jit(lambda s, c: render_frame(s, c, cfg_i))
        cams = [cam]
        for _ in range(20):
            cams.append(orbit(cams[-1], 0.1, 0.0))
        np.asarray(f_i(scene, cams[0])[0, 0])  # compile + warm
        # naive: block per frame; MEDIAN per-frame time x frames (the
        # per-frame host sync occasionally stalls ~1s on the tunnel —
        # one bench run read 0.79 FPS naive vs 12.1 the run before)
        fts = []
        for c in cams[1:]:
            t0 = time.perf_counter()
            jax.block_until_ready(f_i(scene, c))
            fts.append(time.perf_counter() - t0)
        t_naive = float(np.median(fts)) * 20.0
        t0 = time.perf_counter()
        img_i = None
        for c in cams[1:]:
            img_i = f_i(scene, c)
        np.asarray(img_i[0, 0])  # in-order drain
        t_pipe = time.perf_counter() - t0
        detail["interactive"] = {
            "frames": 20,
            "naive_fps": 20.0 / t_naive,
            "naive_frame_ms_p10_p50_p90": [
                float(np.percentile(fts, p)) * 1e3 for p in (10, 50, 90)],
            "pipelined_fps": 20.0 / t_pipe,
            "speedup": t_naive / t_pipe,
            "note": ("naive uses per-frame block_until_ready — verified "
                     "to synchronize for frame-scale (multi-MB-output) "
                     "programs on this platform, unlike scalar-output "
                     "probes (see scripts/bench_util.py); pipelined "
                     "drains the in-order queue once via a host fetch"),
        }
        print(f"# interactive 800x800x3-bounce orbit: naive "
              f"{20.0/t_naive:.2f} FPS, pipelined {20.0/t_pipe:.2f} FPS "
              f"({t_naive/t_pipe:.2f}x)", file=sys.stderr)
        del f_i, img_i
    except Exception as e:  # pragma: no cover
        print(f"# interactive bench failed: {e}", file=sys.stderr)

    # ---- LARGE scene (BASELINE config 5 class): 102 400 tris, 1080p.
    # First-class so round-over-round progress is driver-visible.
    from raytracebvh_tpu.camera import permute_rays, tile_order
    from raytracebvh_tpu.models.procedural import sphere_grid
    from raytracebvh_tpu.ops.traverse_hbm import traverse_hbm_pallas
    from raytracebvh_tpu.pipeline import make_rays

    large = {}
    try:
        # drop the headline/interactive executables: their closed-over
        # constants pin HBM (large fwd+bwd measured 251 -> 341 ms under
        # that pressure); the persistent compile cache keeps re-JITs cheap
        del fwd, fwd_sh, grad_fn
        jax.clear_caches()
        scene_l = scene_to_device(sphere_grid(nx=4, ny=4, subdiv=40))
        large["tris"] = int(scene_l.num_faces)

        def build_digest_l(s, yaw):
            c = jnp.cos(yaw)
            w2 = wvp.at[0, 0].mul(c)
            b = build_bvh(s, w2, wv, cfg)
            return b.bbmin[s.num_faces].sum() + b.skip_link.sum()

        def builds_l(k):
            @jax.jit
            def f(s):
                def step(acc, yaw):
                    return acc + build_digest_l(s, yaw), None
                acc, _ = jax.lax.scan(
                    step, jnp.float32(0.0), jnp.linspace(0.0, 0.1, k)
                )
                return acc
            return f

        tl1 = timed(builds_l(1), scene_l, warmup=1, iters=3)
        tl5 = timed(builds_l(5), scene_l, warmup=1, iters=3)
        t_build_l = max((tl5 - tl1) / 4.0, 1e-9)
        large["build_ms"] = t_build_l * 1e3
        large["builds_per_sec"] = 1.0 / t_build_l

        # traversal: HBM windowed sweep, tile-ordered primary rays
        bvh_l = jax.jit(lambda s: build_bvh(s, wvp, wv, cfg))(scene_l)
        perm, _ = tile_order(width, height, 16)
        rays_l = permute_rays(make_rays(cam, cfg), jnp.asarray(perm))
        f_tr = jax.jit(lambda b, r: traverse_hbm_pallas(
            b, r, cfg.epsilon, return_steps=True))
        t_tr = timed(f_tr, bvh_l, rays_l, warmup=1, iters=3)
        rec_l, steps_l = f_tr(bvh_l, rays_l)
        n_hits = int(np.asarray(rec_l.hit).sum())
        total_steps = int(np.asarray(steps_l).sum())
        large["traverse_ms"] = t_tr * 1e3
        large["traverse_mrays_per_sec"] = width * height / t_tr / 1e6
        large["traverse_hits"] = n_hits
        large["traverse_microsteps"] = total_steps
        # serve-level lane occupancy census (round-5 verdict item 4) —
        # a separate instrumented call so the timed kernel stays clean
        try:
            _, st_o, occ_o = jax.jit(lambda b, r: traverse_hbm_pallas(
                b, r, cfg.epsilon, return_occupancy=True))(bvh_l, rays_l)
            st_o = np.asarray(st_o).astype(np.float64)
            occ_o = np.asarray(occ_o).astype(np.float64)
            per_block = occ_o / np.maximum(st_o * 2048.0, 1.0)
            large["serve_lane_occupancy"] = float(
                occ_o.sum() / max(st_o.sum() * 2048.0, 1.0))
            large["serve_lane_occupancy_p10_p50_p90"] = [
                float(np.percentile(per_block, p)) for p in (10, 50, 90)]
        except Exception as e:  # pragma: no cover
            large["serve_lane_occupancy_error"] = str(e)
        # utilization: each micro-step is ~110 (8,128)-vreg VPU ops
        # (17-ch splat 34 + slab/MT ~55 + bookkeeping ~20) at ~1/cycle,
        # 940 MHz -> the compute lower bound for the measured step count
        t_light_tr = total_steps * 110 / 0.94e9
        large["traverse_pct_of_light"] = 100.0 * t_light_tr / t_tr
        print(
            f"# large scene ({large['tris']} tris): build "
            f"{large['build_ms']:.1f} ms in-stream "
            f"({large['builds_per_sec']:.1f}/s), traversal "
            f"{large['traverse_mrays_per_sec']:.2f} Mrays/s "
            f"({total_steps} steps, {large['traverse_pct_of_light']:.0f}% "
            f"of VPU step-light, lane occupancy "
            f"{100*large.get('serve_lane_occupancy', 0):.0f}%)",
            file=sys.stderr)

        # full fwd frame at 1080p on the large scene (auto backends:
        # hbm traversal + XLA shade gather via the size guard)
        # the default unchunked config: 26% of rays hit, so chunk
        # culling buys nothing and per-chunk kernel calls underfill the
        # refill slots (fwd 197 ms unchunked vs 219 chunked; fwd+bwd
        # 251 vs 307-365 across chunk sizes — tpu_large_chunksweep.py)
        cfg_l = cfg.replace(bounces=0, ray_tile=16, ray_chunk=0)
        fwd_l = jax.jit(lambda s, c: render_frame(s, c, cfg_l))
        t_fl = timed(fwd_l, scene_l, cam, warmup=1, iters=3)
        large["fwd_ms"] = t_fl * 1e3
        large["fwd_mrays_per_sec"] = width * height / t_fl / 1e6
        print(f"# large scene fwd frame: {t_fl*1e3:.1f} ms -> "
              f"{large['fwd_mrays_per_sec']:.2f} Mrays/s", file=sys.stderr)

        # fwd+bwd at 102k tris (BASELINE config 5: "100k+ tris ...
        # grads psum'd"): vertex/material grads through the hbm
        # traversal (stop-grad ids) + XLA shade gather.  Gradient parity
        # vs the jnp backend: tests/test_traverse_hbm.py
        # test_hbm_backend_grads_match.
        params_l = init_params(scene_l)
        target_l = jnp.zeros((height, width, 4), jnp.float32)
        grad_l = jax.jit(jax.value_and_grad(
            lambda p: loss_fn(p, scene_l, cam, target_l, cfg_l)))
        t_gl = timed(grad_l, params_l, warmup=1, iters=3)
        _, g_l = grad_l(params_l)
        g_finite = bool(np.isfinite(np.asarray(g_l.vert_offsets)).all())
        large["fwd_bwd_ms"] = t_gl * 1e3
        large["fwd_bwd_mrays_per_sec"] = width * height / t_gl / 1e6
        large["fwd_bwd_grads_finite"] = g_finite
        print(f"# large scene fwd+bwd: {t_gl*1e3:.1f} ms -> "
              f"{large['fwd_bwd_mrays_per_sec']:.2f} Mrays/s "
              f"(grads finite: {g_finite})", file=sys.stderr)
    except Exception as e:  # pragma: no cover - report, don't kill bench
        large["error"] = f"{type(e).__name__}: {e}"
        print(f"# large scene bench failed: {large['error']}",
              file=sys.stderr)
    detail["large_scene"] = large

    # ---- multi-host efficiency prediction (single-chip environment:
    # analytic DCN/ICI model, parallel/scaling.py)
    try:
        from raytracebvh_tpu.parallel.scaling import (
            predict_multihost_efficiency,
        )

        detail["multihost_prediction"] = predict_multihost_efficiency(
            scene_h, params, t_step, hosts=4, local_devices=4, geo=2
        )
        print(
            "# multihost model (4 hosts x 4 chips): eff "
            f"{detail['multihost_prediction']['efficiency_serial_bound']:.3f}"
            " serial / "
            f"{detail['multihost_prediction']['efficiency_overlapped_bound']:.3f}"
            " overlapped", file=sys.stderr)

        # config-5 row (round-5 verdict item 5): the 102k-tri scene,
        # where the geometry all-gather is no longer negligible, with
        # the stated-bandwidth assumption stress-tested at 0.5x/2x
        if "fwd_bwd_ms" in large:
            from raytracebvh_tpu.parallel.scaling import DCN_BW, ICI_BW

            p5 = predict_multihost_efficiency(
                scene_l, params_l, large["fwd_bwd_ms"] / 1e3,
                hosts=4, local_devices=4, geo=2,
            )
            p5["bw_sensitivity"] = {
                f"{f}x": predict_multihost_efficiency(
                    scene_l, params_l, large["fwd_bwd_ms"] / 1e3,
                    hosts=4, local_devices=4, geo=2,
                    ici_bw=ICI_BW * f, dcn_bw=DCN_BW * f,
                )["efficiency_serial_bound"]
                for f in (0.5, 1.0, 2.0)
            }
            detail["multihost_prediction_config5"] = p5
            print(
                "# multihost config-5 (102k tris): all-gather "
                f"{p5['ici_bytes_per_device']/1e6:.2f} MB/device/step, "
                f"eff {p5['efficiency_serial_bound']:.3f} serial "
                f"(BW 0.5x/2x: "
                f"{p5['bw_sensitivity']['0.5x']:.3f}/"
                f"{p5['bw_sensitivity']['2.0x']:.3f})", file=sys.stderr)
    except Exception as e:  # pragma: no cover
        print(f"# multihost prediction failed: {e}", file=sys.stderr)

    # ---- roofline: a PROVEN lower bound on the headline step (r3
    # verdict item 6: the XLA cost model's byte estimate both
    # overcounts Pallas operands — once per grid step — and, since the
    # chunk-cull rework, undercounts the branchy shade work, so its
    # "light" could land on either side of the measurement.  Instead,
    # enumerate traffic the step provably cannot avoid; the resulting
    # bound satisfies pct_of_light <= 100 BY CONSTRUCTION.)
    def _nb(*arrays):
        return float(sum(int(np.prod(x.shape)) * x.dtype.itemsize
                         for x in arrays))

    n_pad = ((scene.num_faces + 255) // 256) * 256
    mandatory = {
        # scene geometry + materials + textures read at least once
        "scene_read": _nb(scene.verts, scene.normals, scene.uv,
                          scene.indices, scene.mat_index, scene.textures)
        + _nb(*jax.tree_util.tree_leaves(scene.materials)),
        # the per-frame build materializes node + leaf-attr tables
        # (written once, read at least once by traversal/shade)
        "node_tables_rw": 2.0 * (2 * n_pad * (6 + 2) * 4
                                 + n_pad * 40 * 4),
        # gradient outputs
        "grads_out": _nb(*jax.tree_util.tree_leaves(params)),
        # per-ray hit records cross the traversal/shade boundary once
        "hit_records": float(rays_per_frame * 3 * 4),
    }
    min_bytes = sum(mandatory.values())
    t_light = min_bytes / HBM_BW
    detail["roofline"] = {
        "model": "provable-lower-bound",
        "mandatory_bytes": mandatory,
        "min_bytes": min_bytes,
        "t_light_ms": t_light * 1e3,
        "pct_of_light": 100.0 * t_light / t_step,  # <= 100 by construction
        "note": ("t_light = bytes the fwd+bwd step provably must move "
                 "through HBM / 810 GB/s.  The step is NOT HBM-bound — "
                 "the gap is in-VMEM lock-step traversal + shade vector "
                 "work; the large_scene.traverse_pct_of_light field "
                 "bounds that portion against a measured micro-step "
                 "count instead."),
    }
    # XLA's estimate, clearly labeled as an estimate (not a bound)
    if xla_bytes or xla_flops:
        detail["roofline"]["xla_cost_model"] = {
            "flops": xla_flops, "bytes_accessed_estimate": xla_bytes}
    print(
        f"# roofline (provable lower bound): {min_bytes/1e9:.3f} GB "
        f"mandatory HBM -> {t_light*1e3:.2f} ms light; measured "
        f"{t_step*1e3:.1f} ms = {100.0*t_light/t_step:.1f}% of light "
        f"(the gap is in-VMEM traversal/shade vector work, bounded "
        f"separately by the large-scene micro-step counter at "
        f"{large.get('traverse_pct_of_light', 0):.0f}%).",
        file=sys.stderr,
    )

    with open(os.path.join(os.path.dirname(__file__) or ".",
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=2)

    print(json.dumps({
        "metric": "rays_per_sec_fwd_bwd_1080p_image_test",
        "value": round(rays_per_sec, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_sec / BASELINE_RAYS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
