"""Honest device timing on the axon-tunneled chip.

Round-5 finding: ``jax.block_until_ready`` does NOT synchronize on the
experimental 'axon' platform — a 330 MB reduction "completes" in 0.13 ms
by that clock, while fetching its scalar result takes ~23.6 ms (tunnel
roundtrip + real execution).  Every block_until_ready-based measurement
therefore reads enqueue time plus whatever backpressure happened to
apply; small ops look free and big ops carry a ~23 ms RTT constant.

``timed_drain`` fixes both effects:

  * completion is forced by FETCHING (np.asarray) one output of the last
    iteration — same-device programs execute in order, so the fetch
    drains the whole queue;
  * the tunnel RTT is cancelled by measuring two run lengths and taking
    the marginal time per iteration.
"""

import time

import numpy as np

import jax


def _run(fn, args, n):
    t0 = time.perf_counter()
    out = None
    for _ in range(n):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf)  # drain: in-order execution makes this a full sync
    return time.perf_counter() - t0


def timed_drain(fn, *args, iters=10, warmup=2):
    """Marginal per-iteration device time of ``fn(*args)`` (seconds)."""
    _run(fn, args, max(1, warmup))  # compile + cache warm
    t1 = _run(fn, args, iters)
    t2 = _run(fn, args, 2 * iters)
    return max((t2 - t1) / iters, 1e-9)
