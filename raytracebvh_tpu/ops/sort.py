"""Sort leaves by morton code.

The reference implements a 32-pass 1-bit LSD radix sort as two compute
shaders per pass (block-local Blelloch scan + cross-group serial scan and
scatter; reference: RadixSortP1.hlsl, RadixSortP2.hlsl, dispatched 32x from
Graphics.cpp:735-754).  On TPU the idiomatic primitive is a single fused
stable sort: XLA's ``lax.sort`` is already a highly tuned on-chip bitonic
network, so the 32 round trips through HBM collapse into one op.  A Pallas
radix-sort backend (the reference's algorithm, kept on-chip) lives in
``sort_pallas.py`` for large leaf counts.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def sort_by_code(codes, num_valid=None):
    """Stable-sort ``codes`` ascending; returns (sorted_codes, order).

    ``order[k]`` is the pre-sort leaf index that landed at slot ``k`` —
    the payload the reference carries by scattering whole 48-byte Nodes
    (reference: RadixSortP2.hlsl:55-60).  Stability gives ascending
    pre-sort indices within equal codes, which the Karras builder's
    index tie-break relies on (reference: BVHConstructP1.hlsl:61-72).
    """
    n = codes.shape[0]
    idx = jnp.arange(n, dtype=jnp.int32)
    sorted_codes, order = jax.lax.sort(
        (codes, idx), dimension=0, is_stable=True, num_keys=1
    )
    return sorted_codes, order
