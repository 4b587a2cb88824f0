"""Windowed HBM row gather for COHERENT indices: out[:, r] = tbl[:, idx[r]].

XLA's TPU gather prices per ROW (~37 ms per 2M rows at 1080p, measured
flat in row width 4..16 and in index distribution — scripts/
tpu_dense_shade.py), which makes the texture quad lookup and the
large-scene leaf-attribute lookup the dominant cost of a dense frame.
But both index streams are *spatially coherent*: neighboring rays sample
neighboring texels (screen-space continuity) and hit morton-neighboring
leaves.  This kernel exploits that:

  * The table lives in HBM as ``[nw, Cp, 128]``: 128 consecutive rows per
    *window*, channel-major inside (the window id rides the untiled
    leading dim, so dynamic DMA offsets are legal — same layout trick as
    ops/traverse_hbm.pack_table_rank17).
  * Per 2048-ray block: while lanes are pending, DMA the ``B``-window
    batch starting at the minimum pending window (one ~64 KB descriptor),
    then serve each window with one sublane-broadcast + in-vreg lane
    shuffle per channel, masked to the lanes that live there.  A
    coherent block finishes in 1-2 iterations; gaps between index
    clusters are skipped because the next batch restarts at the new
    minimum.  A standing prefetch of the *next* batch overlaps the DMA
    with the serves (mispredictions pay one blocking refetch).

Worst case (uniform random indices over a huge table) degrades to
spread/B iterations per block — callers with incoherent indices should
use the XLA gather instead; this kernel's contract is coherence.

Differentiable w.r.t. the *unpacked* [rows, C] table via custom_vjp
(XLA scatter-add; DCE'd when the table grad is unused, e.g. texture
quads under vertex/material training).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gather_pallas import _round_up

LANES = 128
DEFAULT_BATCH = 8  # windows per DMA descriptor


def pack_rows_windowed(tbl, batch: int = DEFAULT_BATCH):
    """[rows, C] -> [nw, Cp, 128] window-major table (module doc).

    Pads rows to a multiple of 128*batch (so every batched DMA is in
    bounds) and channels to a multiple of 8 (sublane tiling)."""
    rows, c = tbl.shape
    cp = _round_up(c, 8)
    rpad = _round_up(rows, LANES * batch)
    t = jnp.zeros((rpad, cp), tbl.dtype).at[:rows, :c].set(tbl)
    return t.reshape(rpad // LANES, LANES, cp).transpose(0, 2, 1)


def _gather_kernel(tbl_hbm, idx_ref, out_ref, wbuf, sem, *, nw, B, cp, s):
    """One ray block: batched window DMAs + masked lane shuffles."""
    idx = idx_ref[0]  # [s, 128]
    w = jax.lax.div(idx, LANES)
    lane = jax.lax.rem(idx, LANES)

    def dma(buf, w0):
        return pltpu.make_async_copy(
            tbl_hbm.at[pl.ds(w0, B)], wbuf.at[buf], sem.at[buf]
        )

    # zero-init: lanes are written exactly once, but the masked select
    # form reads the previous value
    for c in range(cp):
        out_ref[c, 0] = jnp.zeros((s, LANES), out_ref.dtype)

    pend0 = jnp.ones((s, LANES), jnp.int32)
    minp0 = jnp.min(w)
    w0_first = jnp.clip(minp0, 0, nw - B)
    dma(0, w0_first).start()

    # iteration backstop: in-range indices need at most ceil(nw/B)
    # batches (starts only move forward past served windows); an
    # out-of-range index (w >= nw — a caller bug) would otherwise spin
    # the while_loop forever since no batch can cover it.  On backstop
    # exit the offending lanes keep their zero-initialized output.
    max_iters = nw // B + 8

    def cond(state):
        pend = state[0]
        return (jnp.max(pend) > 0) & (state[4] < max_iters)

    def body(state):
        pend, w0, minp, buf, it = state
        dma(buf, w0).wait()
        whi = jnp.max(jnp.where(pend > 0, w, -1))
        # Standing prefetch: predict the next batch is the next B
        # windows.  ``more`` means some pending lane lives at w >= w0+B;
        # such lanes CANNOT be served this iteration, so whenever a
        # prefetch is started the loop is guaranteed to run again and
        # consume it — no DMA is ever left in flight at exit.
        pred = jnp.minimum(w0 + B, nw - B)
        more = whi >= w0 + B

        @pl.when(more)
        def _():
            dma(1 - buf, pred).start()

        # serve only the k-range that can hold pending lanes: [minp,
        # whi] in window units (the shuffle block per window is the
        # expensive part — B*cp unguarded shuffles measured ~8 us per
        # iteration, 10x the useful work on coherent streams)
        klo = minp - w0
        khi = jnp.minimum(whi - w0, B - 1)
        served = jnp.zeros((s, LANES), jnp.int32)
        for k in range(B):
            match = (pend > 0) & (w == w0 + k)
            served = jnp.where(match, 1, served)

            @pl.when((klo <= k) & (k <= khi))
            def _(k=k, match=match):
                sub = wbuf[buf, k]  # [cp, 128]
                lane_k = jnp.where(match, lane, 0)
                for c in range(cp):
                    val = jnp.take_along_axis(
                        jnp.broadcast_to(sub[c:c + 1, :], (s, LANES)),
                        lane_k, axis=1,
                    )
                    out_ref[c, 0] = jnp.where(match, val, out_ref[c, 0])

        pend = pend & (1 - served)
        left = jnp.max(pend) > 0

        # next batch start: the new minimum pending window
        nxt_minp = jnp.min(jnp.where(pend > 0, w, nw))
        nxt = jnp.clip(nxt_minp, 0, nw - B)

        @pl.when(jnp.logical_not(more) & left)
        def _():  # predicted "done" but lanes remain: late prefetch
            dma(1 - buf, nxt).start()

        @pl.when(more & (nxt != pred))
        def _():  # misprediction: consume the wrong prefetch, refetch
            dma(1 - buf, pred).wait()
            dma(1 - buf, nxt).start()

        return pend, nxt, nxt_minp, 1 - buf, it + 1

    state = jax.lax.while_loop(
        cond, body, (pend0, w0_first, minp0, jnp.int32(0), jnp.int32(0))
    )

    # Backstop exit only (pend remains): the final iteration always
    # started one prefetch into the returned buffer at the returned
    # start (left => more-prefetch, late-prefetch, or mispredict
    # refetch) — consume it so its semaphore can't pair with a later
    # grid step's wait.  Normal exit leaves no DMA in flight (module
    # invariant above).
    @pl.when(jnp.max(state[0]) > 0)
    def _():
        dma(state[3], state[1]).wait()


def _gather_hbm_fwd_impl(tbl_packed, idx, c_out, block, interpret):
    nw, cp, _ = tbl_packed.shape
    B = min(DEFAULT_BATCH, nw)
    nrays = idx.shape[0]
    rpad = _round_up(nrays, block)
    s = block // LANES
    # pad with the last real index: padding lanes then ride an
    # already-needed window instead of dragging in window 0
    idxp = jnp.full((rpad,), 0, jnp.int32).at[:nrays].set(idx)
    if rpad != nrays:
        idxp = idxp.at[nrays:].set(idx[nrays - 1])
    idx2 = idxp.reshape(rpad // block, s, LANES)

    ntiles = rpad // block
    kernel = functools.partial(
        _gather_kernel, nw=nw, B=B, cp=cp, s=s
    )
    out = pl.pallas_call(
        kernel,
        grid=(ntiles,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),  # table stays in HBM
            pl.BlockSpec((1, s, LANES), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cp, 1, s, LANES), lambda i: (0, i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cp, ntiles, s, LANES),
                                       tbl_packed.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, B, cp, LANES), tbl_packed.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
        interpret=interpret,
    )(tbl_packed, idx2)
    return out.reshape(cp, rpad)[:c_out, :nrays]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def gather_rows_packed(packed, idx, c_out: int, block: int = 2048,
                       interpret: bool | None = None):
    """out[c, r] = packed[idx[r] // 128, c, idx[r] % 128] for COHERENT
    idx; the PRE-PACKED (pack_rows_windowed) table stays in HBM.

    Split from :func:`gather_rows_hbm` so callers can pack ONCE per
    frame (the pipeline packs the texture quad table alongside
    pack_texture_quads) instead of once per pass/chunk.

    Args:
      packed: [nw, Cp, 128] from pack_rows_windowed.
      idx: [R] int32 row indices, assumed spatially coherent.
      c_out: real channel count (<= Cp; the pack zero-pads).
      block: rays per grid step.
    Returns [c_out, R] channel-major (the SoA shading layout).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gather_hbm_fwd_impl(packed, idx, c_out, block, interpret)


def _gather_rows_packed_fwd(packed, idx, c_out, block, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _gather_hbm_fwd_impl(packed, idx, c_out, block, interpret)
    return out, (idx, packed.shape)


def _gather_rows_packed_bwd(c_out, block, interpret, res, g):
    idx, pshape = res
    # XLA scatter-add into the packed-layout cotangent (grads then flow
    # back through pack_rows_windowed's reshape/transpose automatically);
    # unused cotangents (e.g. texture quads under vertex-only training)
    # are DCE'd
    nw, cp, _ = pshape
    gp = g
    if cp != c_out:
        gp = jnp.concatenate(
            [g, jnp.zeros((cp - c_out, g.shape[1]), g.dtype)], axis=0
        )
    dp = jnp.zeros(pshape, g.dtype).at[
        idx // LANES, :, idx % LANES
    ].add(gp.T)
    return dp, None


gather_rows_packed.defvjp(_gather_rows_packed_fwd, _gather_rows_packed_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows_hbm(tbl, idx, block: int = 2048,
                    interpret: bool | None = None):
    """out[c, r] = tbl[idx[r], c] for COHERENT idx; table in HBM.

    Packs then gathers (XLA CSEs the pack across same-table calls
    inside one jit; use gather_rows_packed + pack_rows_windowed
    directly to pack once per frame explicitly).  Differentiable w.r.t.
    ``tbl`` with a size-aware backward: tables that fit VMEM scatter
    gradients as one-hot matmuls on the MXU (gather_pallas's kernel —
    18 ms faster than XLA's scatter on the 1080p training step,
    round 5); larger tables fall back to the XLA scatter-add."""
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gather_hbm_fwd_impl(
        pack_rows_windowed(tbl), idx, tbl.shape[1], block, interpret)


def _gather_rows_hbm_fwd(tbl, idx, block, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    out = _gather_hbm_fwd_impl(
        pack_rows_windowed(tbl), idx, tbl.shape[1], block, interpret)
    return out, (idx, tbl.shape)


def _gather_rows_hbm_bwd(block, interpret, res, g):
    idx, (rows, c) = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    if rows <= 32768:
        # in-VMEM one-hot-matmul scatter (channel-major [c, width])
        from .gather_pallas import _scatter_add_impl

        width = _round_up(rows, LANES)
        dcm = _scatter_add_impl(g, idx, width, block, interpret)
        return dcm[:, :rows].T, None
    dtbl = jnp.zeros((rows, c), g.dtype).at[idx].add(g.T)
    return dtbl, None


gather_rows_hbm.defvjp(_gather_rows_hbm_fwd, _gather_rows_hbm_bwd)
