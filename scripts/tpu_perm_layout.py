#!/usr/bin/env python
"""Micro-bench: tile permutation and image assembly strategies.

The large-frame localization (tpu_large_frame.py) shows ~40 ms for the
gather-based ray permutation, and +89 ms for materializing the
[H, W, 4] image vs returning its sum.  The tile permutation is
STRUCTURED (row-major <-> 16x16-tile-major), so it should be a
reshape+transpose, not a 2M-row gather; the image's minor-dim-4 is the
known XLA TPU tiling pathology.

Run: python scripts/tpu_perm_layout.py
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from raytracebvh_tpu.camera import tile_order

W, H, T = 1920, 1080, 16
R = W * H


def timed(name, fn, *a, iters=3, k=9):
    """In-stream marginal: k applications of fn inside one jitted scan
    (dispatch overhead ~25-35 ms would otherwise swamp ms-scale ops)."""
    def scan_f(kk):
        @jax.jit
        def f(*args):
            def step(acc, dt):
                return acc + fn(*(x + dt for x in args)), None
            acc, _ = jax.lax.scan(
                step, jnp.float32(0.0), jnp.linspace(0.0, 1e-6, kk))
            return acc
        return f
    f1, fk = scan_f(1), scan_f(k)
    jax.block_until_ready(f1(*a))
    jax.block_until_ready(fk(*a))
    ts = []
    for f in (f1, fk):
        t0 = time.perf_counter()
        for _ in range(iters):
            jax.block_until_ready(f(*a))
        ts.append((time.perf_counter() - t0) / iters)
    m = max((ts[1] - ts[0]) / (k - 1), 0.0)
    print(f"{name:<44} {m*1e3:8.3f} ms in-stream", flush=True)
    return m


perm, inv = tile_order(W, H, T)
perm_j = jnp.asarray(perm)
inv_j = jnp.asarray(inv)
TH, TW = 8, 16  # structured tile: 8 rows x 16 cols = 128 px, divides 1080x1920

x = jnp.arange(R, dtype=jnp.float32)
key = jax.random.PRNGKey(0)
c4 = [jax.random.uniform(jax.random.fold_in(key, i), (R,)) for i in range(4)]


def perm_gather(x):
    return (x[perm_j] * 2.0).sum()


def perm_reshape(x):
    # row-major [H*W] -> 8x16-tile-major:
    # (H/8, 8, W/16, 16) -> (H/8, W/16, 8, 16)
    y = x.reshape(H // TH, TH, W // TW, TW).transpose(0, 2, 1, 3).reshape(-1)
    return (y * 2.0).sum()


def inv_gather(x):
    return (x[inv_j] * 2.0).sum()


def inv_reshape(x):
    # 8x16-tile-major -> row-major
    y = x.reshape(H // TH, W // TW, TH, TW).transpose(0, 2, 1, 3).reshape(-1)
    return (y * 2.0).sum()


# round-trip parity of the structured forms
xa = np.arange(R, dtype=np.float32)
pr = np.asarray(jax.jit(
    lambda x: x.reshape(H // TH, TH, W // TW, TW)
    .transpose(0, 2, 1, 3).reshape(-1))(x))
ir = np.asarray(jax.jit(
    lambda x: x.reshape(H // TH, W // TW, TH, TW)
    .transpose(0, 2, 1, 3).reshape(-1))(jnp.asarray(pr)))
assert (ir == xa).all(), "structured tile round-trip failed"
print("structured 8x16 tile round-trip ok", flush=True)

timed("perm gather [2M]", perm_gather, x)
timed("perm reshape [2M]", perm_reshape, x)
timed("inv gather [2M]", inv_gather, x)
timed("inv reshape [2M]", inv_reshape, x)


def img_stack(c0, c1, c2, c3):
    im = jnp.stack([c0, c1, c2, c3], axis=-1).reshape(H, W, 4)
    return im[::7].sum()


def img_chw(c0, c1, c2, c3):
    im = jnp.stack([c0, c1, c2, c3], axis=0).reshape(4, H, W)
    return im[:, ::7].sum()


def img_w4(c0, c1, c2, c3):
    y = jnp.stack([c0, c1, c2, c3], axis=0).reshape(4, H, W)
    im = y.transpose(1, 2, 0).reshape(H, W * 4)
    return im[::7].sum()


timed("image [H,W,4] (current)", img_stack, *c4)
timed("image [4,H,W] channel-major", img_chw, *c4)
timed("image [H,W*4] interleaved", img_w4, *c4)
