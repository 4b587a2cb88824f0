"""BVH construction invariants + golden checks.

The reference validates its builder with printouts on random leaves and the
Karras-paper example tree (reference: CPUTests/BVHConstructTest,
CPUTests/RadixBVHCombo); these tests assert the same properties
mechanically: sortedness, binary-radix-tree structure, contiguous leaf
ranges, box containment, and DFS skip-link coverage — plus parity between
the loop-free fit/links and their round-1 level-synchronous references.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from raytracebvh_tpu.ops import bvh as bvh_ops
from raytracebvh_tpu.ops import sort as sort_ops


def build_all(codes_np):
    codes = jnp.asarray(codes_np, jnp.uint32)
    sorted_codes, order = sort_ops.sort_by_code(codes)
    topo = bvh_ops.build_topology(sorted_codes)
    return (
        np.asarray(sorted_codes),
        np.asarray(order),
        np.asarray(topo.child_l),
        np.asarray(topo.child_r),
        np.asarray(topo.parent),
        topo,
    )


def leaves_of(cl, cr, n, node):
    """Collect leaf ids of a subtree (host-side recursion for checking)."""
    stack, out = [node], []
    while stack:
        x = stack.pop()
        if x < n:
            out.append(x)
        else:
            stack.extend([cl[x], cr[x]])
    return sorted(out)


@pytest.mark.parametrize("n,seed", [(8, 0), (256, 1), (1000, 2), (4096, 3)])
def test_tree_structure(n, seed):
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 1 << 30, n).astype(np.uint32)
    sorted_codes, order, cl, cr, parent, topo = build_all(codes)

    assert np.all(np.diff(sorted_codes.astype(np.int64)) >= 0)

    # every node except the root has exactly one parent; children ranges
    # are contiguous (Karras binary radix tree property)
    seen = np.zeros(2 * n, bool)
    for i in range(n, 2 * n - 1):
        for c in (cl[i], cr[i]):
            assert not seen[c], f"node {c} has two parents"
            seen[c] = True
            assert parent[c] == i
    assert parent[n] == -1  # root
    assert seen[:n].all(), "every leaf must be in the tree"
    rng_leaves = leaves_of(cl, cr, n, n)
    assert rng_leaves == list(range(n))

    # each internal node covers a contiguous leaf range split at gamma,
    # and node_lo/node_hi record exactly that range
    node_lo = np.asarray(topo.node_lo)
    node_hi = np.asarray(topo.node_hi)
    for i in range(n, min(2 * n - 1, n + 200)):
        ls = leaves_of(cl, cr, n, i)
        assert ls == list(range(ls[0], ls[-1] + 1))
        assert node_lo[i] == ls[0] and node_hi[i] == ls[-1]


def test_duplicate_codes():
    # all-equal codes: the index tie-break must still build a valid tree
    # (reference: BVHConstructP1.hlsl:61-72)
    n = 64
    codes = np.full(n, 12345, np.uint32)
    _, _, cl, cr, parent, _ = build_all(codes)
    assert leaves_of(cl, cr, n, n) == list(range(n))


@pytest.mark.parametrize("n,seed", [(512, 4), (1000, 5), (4096, 6)])
def test_fit_links_match_levelsync(n, seed):
    """The loop-free RMQ fit and closed-form links must agree with the
    round-1 level-synchronous implementations on random trees."""
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 1 << 30, n).astype(np.uint32)
    lmin = rng.uniform(-10, 0, (n, 3)).astype(np.float32)
    lmax = lmin + rng.uniform(0, 5, (n, 3)).astype(np.float32)

    sorted_codes, order = sort_ops.sort_by_code(jnp.asarray(codes))
    topo = bvh_ops.build_topology(sorted_codes)
    lmin_s = jnp.asarray(lmin)[order]
    lmax_s = jnp.asarray(lmax)[order]

    bbmin, bbmax = bvh_ops.fit_aabbs(topo.node_lo, topo.node_hi, lmin_s, lmax_s)
    bbmin_ref, bbmax_ref = bvh_ops.fit_aabbs_levelsync(
        topo.child_l, topo.child_r, lmin_s, lmax_s
    )
    # level-sync leaves the unused slot at the union identity; RMQ too
    np.testing.assert_array_equal(np.asarray(bbmin), np.asarray(bbmin_ref))
    np.testing.assert_array_equal(np.asarray(bbmax), np.asarray(bbmax_ref))

    entry, skip = bvh_ops.compute_links(topo, n)
    entry_ref, skip_ref = bvh_ops.compute_links_levelsync(
        topo.child_l, topo.child_r, topo.parent, n
    )
    np.testing.assert_array_equal(np.asarray(skip)[: 2 * n - 1],
                                  np.asarray(skip_ref)[: 2 * n - 1])
    np.testing.assert_array_equal(np.asarray(entry)[: 2 * n - 1],
                                  np.asarray(entry_ref)[: 2 * n - 1])


def test_aabb_fit_and_links():
    rng = np.random.default_rng(4)
    n = 512
    codes = rng.integers(0, 1 << 30, n).astype(np.uint32)
    lmin = rng.uniform(-10, 0, (n, 3)).astype(np.float32)
    lmax = lmin + rng.uniform(0, 5, (n, 3)).astype(np.float32)

    codes_j = jnp.asarray(codes)
    sorted_codes, order = sort_ops.sort_by_code(codes_j)
    topo = bvh_ops.build_topology(sorted_codes)
    cl, cr = topo.child_l, topo.child_r
    bbmin, bbmax = bvh_ops.fit_aabbs(
        topo.node_lo, topo.node_hi,
        jnp.asarray(lmin)[order], jnp.asarray(lmax)[order]
    )
    entry, skip = bvh_ops.compute_links(topo, n)
    bbmin, bbmax = np.asarray(bbmin), np.asarray(bbmax)
    cl_np, cr_np = np.asarray(cl), np.asarray(cr)

    # every internal box is exactly the union of its children
    for i in range(n, 2 * n - 1):
        np.testing.assert_allclose(
            bbmin[i], np.minimum(bbmin[cl_np[i]], bbmin[cr_np[i]])
        )
        np.testing.assert_allclose(
            bbmax[i], np.maximum(bbmax[cl_np[i]], bbmax[cr_np[i]])
        )
    # root box is the scene box
    np.testing.assert_allclose(bbmin[n], lmin.min(0))
    np.testing.assert_allclose(bbmax[n], lmax.max(0))

    # walking entry links (always-descend) visits every node exactly once
    # in DFS order and terminates — the stackless contract
    entry_np, skip_np = np.asarray(entry), np.asarray(skip)
    node, visited = n, []
    while node != -1:
        visited.append(node)
        node = entry_np[node] if node >= n else skip_np[node]
        assert len(visited) <= 2 * n
    assert len(visited) == 2 * n - 1
    assert sorted(visited) == list(range(2 * n - 1))
    # skip from any node never re-enters its own subtree
    for i in range(n, n + 100):
        if skip_np[i] != -1:
            assert skip_np[i] not in leaves_of(cl_np, cr_np, n, i)


def test_karras_paper_example():
    """The 8-key example from the Karras 2012 paper (the reference's
    BVHConstructTest uses the same one, CPUTests/BVHConstructTest
    main.cpp:259-265): sorted keys 00001,00010,00100,00101,10011,11000,
    11001,11110 -> root splits between leaf 3 and 4."""
    codes = np.array([1, 2, 4, 5, 19, 24, 25, 30], np.uint32)
    _, _, cl, cr, parent, _ = build_all(codes)
    n = 8
    root_l = leaves_of(cl, cr, n, cl[n])
    root_r = leaves_of(cl, cr, n, cr[n])
    assert root_l == [0, 1, 2, 3]
    assert root_r == [4, 5, 6, 7]
    # leaf 4 (10011) is alone against (11000,11001,11110)
    right = cr[n]
    assert cl[right] == 4


@pytest.mark.parametrize(
    "n,seed,dup",
    [(8, 0, False), (256, 1, False), (1000, 2, False), (4096, 3, False),
     (512, 4, True), (2, 5, False), (3, 6, False)],
)
def test_rmq_matches_search(n, seed, dup):
    """karras_children_rmq is bit-identical to the reference-shaped
    searches (karras_children), including duplicate-code tie-breaks."""
    rng = np.random.default_rng(seed)
    hi = 1 << 8 if dup else 1 << 30  # dup: force many equal codes
    codes = np.sort(rng.integers(0, hi, n).astype(np.uint32))
    codes = jnp.asarray(codes, jnp.uint32)
    ref = bvh_ops.karras_children(codes)
    got = bvh_ops.karras_children_rmq(codes)
    for r, g, name in zip(ref, got, ("child_l", "child_r", "lo", "hi")):
        np.testing.assert_array_equal(
            np.asarray(g), np.asarray(r), err_msg=name
        )


@pytest.mark.parametrize("n,seed", [(8, 0), (256, 1), (1000, 2)])
def test_preorder_ranks_from_ranges(n, seed):
    """The 2-key-sort ranks equal the entry-link pointer-doubling ranks."""
    rng = np.random.default_rng(seed)
    codes = rng.integers(0, 1 << 30, n).astype(np.uint32)
    sorted_codes, _ = sort_ops.sort_by_code(jnp.asarray(codes, jnp.uint32))
    topo = bvh_ops.build_topology(sorted_codes)
    entry, _ = bvh_ops.compute_links(topo, n)
    ref = bvh_ops.preorder_ranks(entry, n)
    rank, inv = bvh_ops.preorder_ranks_from_ranges(
        topo.node_lo, topo.node_hi, n
    )
    np.testing.assert_array_equal(np.asarray(rank), np.asarray(ref))
    # inv really is the inverse permutation
    np.testing.assert_array_equal(
        np.asarray(rank)[np.asarray(inv)], np.arange(2 * n)
    )
