"""Pallas TPU table-row gather: out[:, r] = tbl[:, idx[r]].

XLA's TPU gather of [R, C]-shaped rows costs ~4 ms per 2M rays at ANY C
(gathers pay per-op, not per-byte) — at two gathers per shading pass
(leaf attributes + texture quad) that's most of the shade time.  This
kernel does the same lookup as in-VMEM dynamic shuffles, the exact
mechanism the traversal megakernel uses per step (see
ops/traverse_pallas._gather_cols): decompose into (width/128) in-tile
128-lane shuffles and predicate away source tiles outside the
[min, max] tile range each 128-ray output tile actually references.

The table is channel-major [C, width] and must fit VMEM alongside a ray
block (~width*C*4 bytes; a 3072-leaf, 40-channel attribute table is
0.5 MB).  The result is channel-major [C, R] — the natural layout for
the SoA shading math.

Differentiable via custom_vjp: the backward pass accumulates dtbl as a
per-block one-hot matmul on the MXU (scatter-as-matmul: for each source
tile in range, dtbl[:, tile] += g_block @ onehot(lanes)), with the grid
running sequentially over ray blocks into one accumulator output.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


CBLK = 8  # channels per shuffle block: Mosaic rejects [1,128] -> [40,128]
# broadcasts (non-power-of-two sublane tiling), so shuffle in native
# 8-sublane blocks


def _gather_kernel(tbl_ref, idx_ref, out_ref, scratch, *, width):
    tbl = tbl_ref[:]  # [C, width], C a multiple of CBLK (padded by caller)
    c = tbl.shape[0]
    # idx arrives pre-broadcast to CBLK sublanes: Mosaic cannot sublane-
    # broadcast a replicated-layout INPUT vector ([1,128] -> [8,128]
    # "Invalid input layout"), so the caller materializes the 8 rows
    idx = idx_ref[:]  # [CBLK, block]
    block = idx.shape[1]
    tile_id = jax.lax.div(idx, LANES)
    lane_id = jax.lax.rem(idx, LANES)
    n_src = width // LANES
    for ot in range(block // LANES):
        tb = tile_id[:, ot * LANES:(ot + 1) * LANES]  # [CBLK, LANES]
        lb = lane_id[:, ot * LANES:(ot + 1) * LANES]
        t_lo = jnp.min(tb)
        t_hi = jnp.max(tb)
        scratch[:] = jnp.zeros((c, LANES), tbl.dtype)
        for k in range(n_src):
            @pl.when(jnp.logical_and(t_lo <= k, k <= t_hi))
            def _(k=k, tb=tb, lb=lb):
                for cb in range(0, c, CBLK):
                    part = jnp.take_along_axis(
                        tbl[cb:cb + CBLK, k * LANES:(k + 1) * LANES],
                        lb, axis=1,
                    )
                    scratch[cb:cb + CBLK, :] = jnp.where(
                        tb == k, part, scratch[cb:cb + CBLK, :]
                    )
        out_ref[:, ot * LANES:(ot + 1) * LANES] = scratch[:]


def _scatter_add_kernel(g_ref, idxcol_ref, out_ref, *, width):
    """out[:, idx[r]] += g[:, r], accumulated across the ray-block grid.

    Scatter-as-matmul: ONE one-hot selector Q [block, 128] per source
    tile in the block's tile range, accumulated as g_block @ Q on the
    MXU.  Large contractions (C x block x 128) keep the MXU utilized —
    per-128-ray-slice dots measured 2x slower than even XLA's scatter.
    The index arrives as a COLUMN [block, 1] so the one-hot builds from
    a natural lane-dim broadcast (no transposes, no replicated-layout
    sublane broadcasts, both of which Mosaic rejects).
    """
    g = g_ref[:]  # [C, block]
    idxc = idxcol_ref[:]  # [block, 1]
    block = g.shape[1]
    n_src = width // LANES

    @pl.when(pl.program_id(0) == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    tile_col = jax.lax.div(idxc, LANES)  # [block, 1]
    lane_col = jax.lax.rem(idxc, LANES)
    col_iota = jax.lax.broadcasted_iota(jnp.int32, (block, LANES), 1)
    t_lo = jnp.min(tile_col)
    t_hi = jnp.max(tile_col)
    lane_b = jnp.broadcast_to(lane_col, (block, LANES))
    tile_b = jnp.broadcast_to(tile_col, (block, LANES))
    for k in range(n_src):
        @pl.when(jnp.logical_and(t_lo <= k, k <= t_hi))
        def _(k=k):
            q = jnp.where(
                (lane_b == col_iota) & (tile_b == k), 1.0, 0.0
            ).astype(g.dtype)
            # out[ch, s] += sum_r g[ch, r] * q[r, s]
            out_ref[:, k * LANES:(k + 1) * LANES] += jax.lax.dot_general(
                g, q,
                dimension_numbers=(((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )


def _gather_fwd_impl(tbl, idx, block, interpret):
    c, width = tbl.shape
    cpad = _round_up(c, CBLK)
    if cpad != c:
        tbl = jnp.concatenate(
            [tbl, jnp.zeros((cpad - c, width), tbl.dtype)], axis=0
        )
    nrays = idx.shape[0]
    rpad = _round_up(nrays, block)
    # pad with index 0 (harmless: output sliced back to nrays); rows
    # pre-broadcast to CBLK sublanes (see _gather_kernel layout note)
    idx1 = jnp.zeros((1, rpad), jnp.int32).at[0, :nrays].set(idx)
    idx2 = jnp.broadcast_to(idx1, (CBLK, rpad))
    kernel = functools.partial(_gather_kernel, width=width)
    out = pl.pallas_call(
        kernel,
        grid=(rpad // block,),
        in_specs=[
            pl.BlockSpec((cpad, width), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((CBLK, block), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((cpad, block), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((cpad, rpad), tbl.dtype),
        scratch_shapes=[pltpu.VMEM((cpad, LANES), tbl.dtype)],
        interpret=interpret,
    )(tbl, idx2)
    return out[:c, :nrays]


def _scatter_add_impl(g, idx, width, block, interpret):
    c = g.shape[0]
    nrays = idx.shape[0]
    rpad = _round_up(nrays, block)
    # padding rays carry zero gradient, scatter target irrelevant;
    # indices shipped as a column (see _scatter_add_kernel layout note)
    idxcol = jnp.full((rpad, 1), width - 1, jnp.int32).at[:nrays, 0].set(idx)
    g2 = jnp.zeros((c, rpad), g.dtype).at[:, :nrays].set(g)
    kernel = functools.partial(_scatter_add_kernel, width=width)
    out = pl.pallas_call(
        kernel,
        grid=(rpad // block,),
        in_specs=[
            pl.BlockSpec((c, block), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((block, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((c, width), lambda i: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((c, width), g.dtype),
        interpret=interpret,
    )(g2, idxcol)
    return out


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def gather_rows(tbl, idx, block: int = 2048, interpret: bool | None = None):
    """out[c, r] = tbl[c, idx[r]]; differentiable w.r.t. ``tbl``.

    Args:
      tbl: [C, width] channel-major table, width a multiple of 128.
      idx: [R] int32 indices into the width axis.
      block: rays per grid step.
      interpret: force interpreter mode (defaults to off-TPU only).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gather_fwd_impl(tbl, idx, block, interpret)


def _gather_rows_fwd(tbl, idx, block, interpret):
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    return _gather_fwd_impl(tbl, idx, block, interpret), (idx, tbl.shape[1])


def _gather_rows_bwd(block, interpret, res, g):
    idx, width = res
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    dtbl = _scatter_add_impl(g, idx, width, block, interpret)
    return dtbl, None


gather_rows.defvjp(_gather_rows_fwd, _gather_rows_bwd)
