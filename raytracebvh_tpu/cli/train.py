"""CLI: inverse-rendering training loop with checkpoint/resume.

Optimizes vertex offsets + material colors so the render matches a
target image (the differentiable capability BASELINE.md mandates on top
of the reference's forward-only renderer).

Usage:
    python -m raytracebvh_tpu.cli.train [--obj Test.obj]
        [--target target.bmp | --self-target] [--steps 200] [--lr 1e-2]
        [--width 128 --height 128] [--ckpt ckpt.npz] [--ckpt-every 50]
        [--out recon.bmp]

--self-target renders the unmodified scene as the target, then perturbs
the start params — a self-contained convergence demo needing no files.
"""

from __future__ import annotations

import argparse
import sys
import time


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--obj", default="Test.obj")
    p.add_argument("--target", default=None, help="target image (BMP/PNG)")
    p.add_argument("--self-target", action="store_true")
    p.add_argument("--steps", type=int, default=200)
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--width", type=int, default=128)
    p.add_argument("--height", type=int, default=128)
    p.add_argument("--bounces", type=int, default=1)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--ckpt", default=None, help="checkpoint path (.npz)")
    p.add_argument("--ckpt-every", type=int, default=50)
    p.add_argument("--out", default=None, help="write final render here")
    p.add_argument("--log-every", type=int, default=10)
    args = p.parse_args(argv)

    import os

    import jax
    import jax.numpy as jnp
    import numpy as np

    from raytracebvh_tpu import Camera, RenderConfig, render_frame_jit
    from raytracebvh_tpu.core.types import scene_to_device
    from raytracebvh_tpu.io.obj import load_obj
    from raytracebvh_tpu.models.inverse import (
        init_params,
        make_optimizer,
        train_step,
    )
    from raytracebvh_tpu.utils.assets import find_asset
    from raytracebvh_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    path = args.obj if os.path.isfile(args.obj) else find_asset(args.obj)
    if path is None:
        print(f"error: cannot find {args.obj}", file=sys.stderr)
        return 1
    scene = scene_to_device(load_obj(path))
    cfg = RenderConfig(width=args.width, height=args.height,
                       bounces=args.bounces)
    cam = Camera.default()

    if args.self_target or args.target is None:
        target = render_frame_jit(scene, cam, cfg)
    else:
        from raytracebvh_tpu.io.image import load_texture

        img = load_texture(args.target)  # [H, W, 4] in [0,1]
        if img.shape[:2] != (args.height, args.width):
            print(
                f"error: target is {img.shape[1]}x{img.shape[0]}, "
                f"expected {args.width}x{args.height}",
                file=sys.stderr,
            )
            return 1
        target = jnp.asarray(img)

    params = init_params(scene)
    if args.self_target:
        # perturb the start so there is something to recover
        rng = np.random.default_rng(args.seed)
        params = params._replace(
            vert_offsets=jnp.asarray(
                rng.normal(0, 0.5, params.vert_offsets.shape), jnp.float32
            ),
            diffuse=params.diffuse * 0.5,
        )
    opt_state = make_optimizer(args.lr).init(params)

    step0 = 0
    if args.ckpt:
        restored = restore_checkpoint(
            args.ckpt, (params, opt_state, step0)
        )
        if restored is not None:
            params, opt_state, step0 = restored
            print(f"resumed from {args.ckpt} at step {step0}")

    t0 = time.perf_counter()
    loss = None
    for step in range(step0, args.steps):
        params, opt_state, loss = train_step(
            params, opt_state, scene, cam, target, cfg, args.lr
        )
        if (step + 1) % args.log_every == 0:
            print(f"step {step + 1}/{args.steps}  loss {float(loss):.6e}")
        if args.ckpt and (step + 1) % args.ckpt_every == 0:
            save_checkpoint(args.ckpt, (params, opt_state, step + 1))
    if loss is not None:
        dt = time.perf_counter() - t0
        n = args.steps - step0
        print(f"trained {n} steps in {dt:.2f}s "
              f"({n / max(dt, 1e-9):.2f} steps/s), final loss {float(loss):.6e}")
    if args.ckpt:
        save_checkpoint(args.ckpt, (params, opt_state, args.steps))

    if args.out:
        from raytracebvh_tpu.io.bmp import write_bmp
        from raytracebvh_tpu.models.inverse import apply_params

        img = render_frame_jit(apply_params(params, scene), cam, cfg)
        write_bmp(args.out, np.asarray(img))
        print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
