"""In-VMEM Pallas bitonic sort of morton codes (+ payload index).

The reference sorts leaves with a 32-pass 1-bit LSD radix sort — 64
dispatches round-tripping HBM every pass (reference: RadixSortP1.hlsl,
RadixSortP2.hlsl, Graphics.cpp:735-754).  The TPU-native observation is
that the WHOLE problem fits in VMEM (codes + payload at 131 072 leaves =
1 MB), so the entire sort can run as ONE kernel with zero HBM round
trips: a bitonic network over (rows, 128) vregs.

  * stride >= 128: compare-exchange across row groups — pure reshapes +
    elementwise min/max on full vregs.
  * stride < 128: compare-exchange across lanes — a STATIC in-vreg lane
    shuffle (partner = lane XOR stride); Mosaic lowers static shuffles to
    single vreg permutes.
  * All direction masks are compile-time numpy constants.

Stability: bitonic networks are not stable, so the compare key is the
lexicographic pair (code, original index) — total order, no ties — which
makes the result exactly the permutation a stable sort produces (the
Karras builder's tie-break depends on it, reference:
BVHConstructP1.hlsl:61-72).

Parity contract: identical (sorted_codes, order) to ops/sort.sort_by_code
(tests/test_sort_pallas.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _ceil_pow2(n: int) -> int:
    p = 1
    while p < n:
        p *= 2
    return p


def _phase(codes, idx, j, k, rows):
    """One compare-exchange phase at stride s=2^j within sort-block 2^k.

    codes/idx: [rows, 128] int32 (codes bit-flipped to order as uint32).
    Directions and partners are static numpy; everything else is
    elementwise.
    """
    s = 1 << j
    g = 1 << k
    n = rows * LANES

    if s >= LANES:
        sr = s // LANES  # stride in rows
        nb = rows // (2 * sr)
        c4 = codes.reshape(nb, 2, sr, LANES)
        i4 = idx.reshape(nb, 2, sr, LANES)
        clo, chi = c4[:, 0], c4[:, 1]
        ilo, ihi = i4[:, 0], i4[:, 1]
        # ascending iff (global_index & g) == 0; g >= 2s here, so the
        # direction is constant per outer block b: (b * 2s) & g
        b = jax.lax.broadcasted_iota(jnp.int32, (nb, sr, LANES), 0)
        asc = ((b * (2 * s)) & g) == 0
        # lexicographic (code, idx) compare — emulates a stable sort
        gt = (clo > chi) | ((clo == chi) & (ilo > ihi))
        # swap = asc ? gt : !gt  ==  !(gt ^ asc) — pure logic: a select_n
        # over i1 vectors trips an unsupported i8->i1 truncation in Mosaic
        swap = jnp.logical_not(jnp.logical_xor(gt, asc))
        nclo = jnp.where(swap, chi, clo)
        nchi = jnp.where(swap, clo, chi)
        nilo = jnp.where(swap, ihi, ilo)
        nihi = jnp.where(swap, ilo, ihi)
        codes = jnp.stack([nclo, nchi], axis=1).reshape(rows, LANES)
        idx = jnp.stack([nilo, nihi], axis=1).reshape(rows, LANES)
        return codes, idx

    # in-lane stride: partner = lane XOR s (static shuffle)
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    partner = lane ^ s
    pc = jnp.take_along_axis(codes, partner, axis=1)
    pi = jnp.take_along_axis(idx, partner, axis=1)
    is_lo = (lane & s) == 0
    if g >= LANES:
        # bit log2(g) of the global index i = row*128 + lane lives in the
        # row part once g >= 128
        row = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
        asc = ((row * LANES) & g) == 0
    else:
        asc = (lane & g) == 0

    gt = (codes > pc) | ((codes == pc) & (idx > pi))
    lt = (codes < pc) | ((codes == pc) & (idx < pi))
    # lower element keeps the smaller value iff ascending (XNOR); logical
    # form instead of a select — Mosaic can't select between i1 vectors
    cond = asc == is_lo
    keep_partner = (cond & gt) | (jnp.logical_not(cond) & lt)
    codes = jnp.where(keep_partner, pc, codes)
    idx = jnp.where(keep_partner, pi, idx)
    return codes, idx


def _network(codes, idx, rows):
    """The full bitonic network on [rows, 128] arrays (pure jnp — the
    kernel body and the off-TPU fallback share this exactly)."""
    n = rows * LANES
    log_n = n.bit_length() - 1
    for k in range(1, log_n + 1):
        for j in range(k - 1, -1, -1):
            codes, idx = _phase(codes, idx, j, k, rows)
    return codes, idx


def _sort_kernel(codes_ref, idx_ref, out_c_ref, out_i_ref, *, rows):
    codes, idx = _network(codes_ref[:], idx_ref[:], rows)
    out_c_ref[:] = codes
    out_i_ref[:] = idx


def bitonic_sort_by_code(codes):
    """Drop-in replacement for ops.sort.sort_by_code: stable-ascending
    (sorted_codes uint32, order int32), one fused in-VMEM kernel."""
    n = codes.shape[0]
    npad = max(_ceil_pow2(n), LANES * 8)
    rows = npad // LANES

    # uint32 order == int32 order after XOR with the sign bit
    signed = (codes.astype(jnp.uint32) ^ jnp.uint32(0x80000000)).astype(
        jnp.int32
    )
    INT_MAX = jnp.int32(0x7FFFFFFF)
    signed = jnp.full(npad, INT_MAX, jnp.int32).at[:n].set(signed)
    idx = jnp.arange(npad, dtype=jnp.int32)

    if jax.default_backend() == "tpu":
        out_c, out_i = pl.pallas_call(
            functools.partial(_sort_kernel, rows=rows),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
                jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            ),
        )(signed.reshape(rows, LANES), idx.reshape(rows, LANES))
    else:
        # same network as plain XLA ops (pallas interpret mode is far too
        # slow for a 100+-phase kernel; the math is shared either way)
        out_c, out_i = _network(
            signed.reshape(rows, LANES), idx.reshape(rows, LANES), rows
        )

    sorted_codes = (
        out_c.reshape(npad)[:n].astype(jnp.uint32) ^ jnp.uint32(0x80000000)
    )
    order = out_i.reshape(npad)[:n]
    return sorted_codes, order
