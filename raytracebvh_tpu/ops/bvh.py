"""LBVH construction: Karras-2012 hierarchy emit + AABB fit + skip links.

The reference builds the hierarchy with one thread per internal node
(reference: BVHConstructP1.hlsl:99-188, citing the Karras HPG 2012 paper)
and fits AABBs bottom-up with global atomics gating a per-node climb
(reference: BVHConstructP2.hlsl:11-36, self-described "HIGHLY DIVERGENT").

TPU-native re-design:
  * The Karras searches are vectorized over *all* internal nodes at once;
    the exponential/binary searches become fixed-trip-count ``fori_loop``s
    over gather + select — no divergence, no scalar threads.
  * The AABB fit replaces atomics (which TPUs don't do cheaply) with
    level-synchronous rounds: every internal node whose two children are
    ready unions their boxes; one tree level settles per round, so the
    loop runs depth(T) times and terminates when the root settles.
  * A third pass computes *skip links* for stackless traversal (see
    core/types.py BVH docstring), replacing the reference's per-thread
    32-entry stack (reference: RayTraceTraversal.hlsl:9,114-117).

Node ids: leaf k in [0,n), internal i stored at id n+i, root = n
(reference numbering: BVHConstructP1.hlsl:152-163,178-187).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

BIG = 1.0e30  # empty-box sentinel: bbmin=+BIG, bbmax=-BIG (union identity)


def _clz32(x):
    return jax.lax.clz(x.astype(jnp.uint32)).astype(jnp.int32)


def make_delta(codes):
    """Returns delta(i, j) -> common-prefix length, vectorized.

    Matches the reference exactly (BVHConstructP1.hlsl:61-84): clz of the
    code XOR; when codes are equal, 32 + clz of the index XOR breaks the
    tie; out-of-range j gives -1.
    """
    n = codes.shape[0]

    def delta(i, j):
        valid = (j >= 0) & (j < n)
        cj = codes[jnp.clip(j, 0, n - 1)]
        x = codes[i] ^ cj
        base = _clz32(x)
        tie = 32 + _clz32((i ^ j).astype(jnp.uint32))
        d = jnp.where(x == 0, tie, base)
        return jnp.where(valid, d, -1)

    return delta


def karras_children(codes):
    """Children of every internal node, vectorized Karras emit.

    Args:
      codes: [n] uint32 *sorted* morton codes (duplicates allowed; the
        index tie-break makes keys effectively distinct).

    Returns:
      (child_l, child_r): [n-1] int32 node ids (leaf ids < n, internal
      ids >= n), matching reference BVHConstructP1.hlsl:152-163.
    """
    n = codes.shape[0]
    assert n >= 2, "karras_children needs at least 2 leaves"
    delta = make_delta(codes)
    i = jnp.arange(n - 1, dtype=jnp.int32)

    # direction: -1 iff delta(i,i+1) < delta(i,i-1)
    # (reference: BVHConstructP1.hlsl:104-105)
    d = jnp.where(delta(i, i + 1) < delta(i, i - 1), -1, 1).astype(jnp.int32)
    dmin = delta(i, i - d)

    # exponential upper bound: boundLen doubles while the prefix grows
    # (reference: BVHConstructP1.hlsl:108-116)
    n_double = max(2, int(math.ceil(math.log2(n))) + 2)

    def grow(_, state):
        lmax, stopped = state
        pred = (delta(i, i + lmax * d) > dmin) & ~stopped
        return jnp.where(pred, lmax << 1, lmax), stopped | ~pred

    lmax, _ = jax.lax.fori_loop(
        0,
        n_double,
        grow,
        (jnp.full(n - 1, 2, jnp.int32), jnp.zeros(n - 1, bool)),
    )

    n_halve = n_double + 2

    def halving_search(t0, threshold):
        """do { t=(t+1)>>1; if delta(i, i+(s+t)d) > threshold: s+=t; }
        while (1 < t);  (reference: BVHConstructP1.hlsl:123-131,141-148)"""

        def body(_, state):
            t, s, done = state
            t_new = jnp.where(done, t, (t + 1) >> 1)
            pred = (delta(i, i + (s + t_new) * d) > threshold) & ~done
            s = jnp.where(pred, s + t_new, s)
            done = done | (t_new <= 1)
            return t_new, s, done

        _, s, _ = jax.lax.fori_loop(
            0,
            n_halve,
            body,
            (t0, jnp.zeros(n - 1, jnp.int32), jnp.zeros(n - 1, bool)),
        )
        return s

    # other end of the range
    l = halving_search(lmax, dmin)
    j = i + l * d
    dnode = delta(i, j)

    # split position (reference: BVHConstructP1.hlsl:136-150)
    s = halving_search(l, dnode)
    gamma = i + s * d + jnp.minimum(d, 0)

    lo = jnp.minimum(i, j)
    hi = jnp.maximum(i, j)
    child_l = jnp.where(lo == gamma, gamma, gamma + n).astype(jnp.int32)
    child_r = jnp.where(hi == gamma + 1, gamma + 1, gamma + 1 + n).astype(jnp.int32)
    return child_l, child_r


def build_topology(codes):
    """Full tree topology arrays sized [2n] (slot 2n-1 unused).

    Returns (child_l, child_r, parent); parent[root] = -1
    (reference: BVHConstructP1.hlsl:174-187 sets children, parents, and the
    root parent to UINT_MAX).
    """
    n = codes.shape[0]
    cl, cr = karras_children(codes)
    ids = jnp.arange(n - 1, dtype=jnp.int32) + n
    child_l = jnp.full(2 * n, -1, jnp.int32).at[ids].set(cl)
    child_r = jnp.full(2 * n, -1, jnp.int32).at[ids].set(cr)
    parent = jnp.full(2 * n, -1, jnp.int32)
    parent = parent.at[cl].set(ids)
    parent = parent.at[cr].set(ids)
    parent = parent.at[n].set(-1)  # root
    return child_l, child_r, parent


def fit_aabbs(child_l, child_r, leaf_bbmin, leaf_bbmax):
    """Bottom-up AABB fit, level-synchronous (no atomics).

    Replaces the reference's InterlockedAdd-gated climb
    (BVHConstructP2.hlsl:11-36).  Each round, every internal node whose two
    children are settled takes the union of their boxes
    (minUnion/maxUnion semantics, RayTraceGlobal.hlsl:132-142); the loop
    ends when the root settles, i.e. after depth(T) rounds.

    Returns (bbmin, bbmax): [2n, 3].
    """
    n = leaf_bbmin.shape[0]
    two_n = 2 * n
    is_internal = (jnp.arange(two_n) >= n) & (jnp.arange(two_n) < two_n - 1)

    # 1-D component arrays in the loop (SoA; see ops/traverse.py layout
    # note — [2n, 3] gathers pad 42x under TPU tiling)
    dt = leaf_bbmin.dtype
    mins = tuple(
        jnp.full(two_n, BIG, dt).at[:n].set(leaf_bbmin[:, k]) for k in range(3)
    )
    maxs = tuple(
        jnp.full(two_n, -BIG, dt).at[:n].set(leaf_bbmax[:, k]) for k in range(3)
    )
    ready = jnp.arange(two_n) < n

    cl = jnp.maximum(child_l, 0)
    cr = jnp.maximum(child_r, 0)

    def cond(state):
        _, _, ready, it = state
        return (~ready[n]) & (it < two_n)

    def body(state):
        mins, maxs, ready, it = state
        settled = is_internal & ready[cl] & ready[cr]
        upd = settled & ~ready
        mins = tuple(
            jnp.where(upd, jnp.minimum(m[cl], m[cr]), m) for m in mins
        )
        maxs = tuple(
            jnp.where(upd, jnp.maximum(m[cl], m[cr]), m) for m in maxs
        )
        return mins, maxs, ready | settled, it + 1

    mins, maxs, _, _ = jax.lax.while_loop(
        cond, body, (mins, maxs, ready, jnp.int32(0))
    )
    return jnp.stack(mins, axis=-1), jnp.stack(maxs, axis=-1)


def compute_links(child_l, child_r, parent, n):
    """Skip links for stackless traversal (top-down, level-synchronous).

    skip(root) = -1; skip(left child of p) = right child of p;
    skip(right child of p) = skip(p).  This threads the tree in the same
    left-first depth-first order the reference's stack traversal visits
    (reference: RayTraceTraversal.hlsl:184-191 pushes right, descends left).

    Returns (entry_link, skip_link): [2n] int32; entry_link = left child
    for internal nodes, = skip for leaves.
    """
    two_n = 2 * n
    ids = jnp.arange(two_n, dtype=jnp.int32)
    has_parent = parent >= 0
    p = jnp.maximum(parent, 0)

    skip = jnp.full(two_n, -1, jnp.int32)
    # root settles immediately; the unused slot 2n-1 and any orphan are
    # marked settled so the loop terminates.
    settled = ~has_parent

    def cond(state):
        _, settled, it = state
        return (~jnp.all(settled)) & (it < two_n)

    def body(state):
        skip, settled, it = state
        cand = jnp.where(ids == child_l[p], child_r[p], skip[p])
        newly = has_parent & settled[p] & ~settled
        skip = jnp.where(newly, cand, skip)
        return skip, settled | newly, it + 1

    skip, _, _ = jax.lax.while_loop(cond, body, (skip, settled, jnp.int32(0)))
    entry = jnp.where(ids < n, skip, child_l)
    return entry, skip
