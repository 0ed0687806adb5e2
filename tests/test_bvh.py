"""LBVH: Karras-tree invariants, refit containment, and traversal vs the
brute-force dense oracle (the fake-BVH pattern from reference bvh.fut:25-43)."""

import pytest
import numpy as np
import jax.numpy as jnp

from tracer_tpu.ops import bvh, intersect, linalg as la, morton, radix_tree, shapes


def random_tris(rng_np, t, scale=3.0, size=0.5):
    base = rng_np.uniform(-scale, scale, (t, 1, 3))
    offs = rng_np.uniform(-size, size, (t, 3, 3))
    return jnp.asarray((base + offs).astype(np.float32))


def random_rays(rng_np, n):
    o = rng_np.uniform(-4, 4, (n, 3)).astype(np.float32)
    d = rng_np.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_expand_bits_known_values():
    got = np.asarray(morton.expand_bits(jnp.asarray([0, 1, 2, 3, 0x3FF],
                                                    jnp.uint32)))
    # each bit spread 3 apart: 1->1, 2->0b1000, 3->0b1001
    assert got[0] == 0 and got[1] == 1 and got[2] == 8 and got[3] == 9
    assert got[4] == 0x09249249


def test_morton_orders_along_axes():
    # x has the most-significant interleave slot
    pts = jnp.asarray(np.array([[0.1, 0.9, 0.9], [0.9, 0.1, 0.1]], np.float32))
    c = np.asarray(morton.morton3d(pts))
    assert c[0] < c[1]


def tree_structure_ok(tree: radix_tree.RadixTree, n):
    n_int = n - 1
    left = np.asarray(tree.left)
    right = np.asarray(tree.right)
    parent = np.asarray(tree.parent)

    # every leaf and every internal node except root referenced exactly once
    children = np.concatenate([left, right])
    internal_children = children[children < n_int]
    leaf_children = children[children >= n_int] - n_int
    assert sorted(leaf_children.tolist()) == list(range(n))
    assert sorted(internal_children.tolist()) == [
        i for i in range(n_int) if i != 0]
    # parent pointers consistent with child pointers
    for i in range(n_int):
        for c in (left[i], right[i]):
            if c < n_int:
                assert parent[c] == i
    assert parent[0] == -1


def test_radix_tree_invariants(rng_np):
    for n in [2, 3, 5, 17, 64, 255]:
        codes = jnp.asarray(
            np.sort(rng_np.integers(0, 2**30, n, dtype=np.uint32)))
        tree = radix_tree.build(codes)
        tree_structure_ok(tree, n)


def test_radix_tree_duplicate_codes(rng_np):
    # all-equal codes exercise the index tiebreak (radix_tree.fut:26-28)
    codes = jnp.asarray(np.full(33, 12345, np.uint32))
    tree = radix_tree.build(codes)
    tree_structure_ok(tree, 33)


def test_refit_containment(rng_np):
    tris = random_tris(rng_np, 50)
    b = bvh.build(tris)
    n_int = b.left.shape[0]
    nmin, nmax = np.asarray(b.node_min), np.asarray(b.node_max)
    tmin, tmax = map(np.asarray, shapes.bounding_box_triangle(b.tris))
    for i in range(n_int):
        for c in (int(b.left[i]), int(b.right[i])):
            cmin, cmax = ((tmin[c - n_int], tmax[c - n_int]) if c >= n_int
                          else (nmin[c], nmax[c]))
            assert (nmin[i] <= cmin + 1e-6).all(), i
            assert (nmax[i] >= cmax - 1e-6).all(), i


@pytest.mark.smoke
def test_lbvh_matches_dense_oracle(rng_np):
    for t in [2, 5, 60, 333]:
        tris = random_tris(rng_np, t)
        b = bvh.build(tris)
        dense = intersect.build_dense(tris)
        o, d = random_rays(rng_np, 257)
        ok_b, t_b, i_b, _, _ = bvh.closest_hit(b, 1e30, o, d)
        ok_d, t_d, i_d, _, _, _ = intersect.closest_hit(
            dense, 1e30, la.v3_from_array(o), la.v3_from_array(d))
        np.testing.assert_array_equal(np.asarray(ok_b), np.asarray(ok_d))
        hit = np.asarray(ok_b)
        np.testing.assert_allclose(np.asarray(t_b)[hit], np.asarray(t_d)[hit],
                                   rtol=1e-4, atol=1e-5)
        # dense returns storage (morton) order: map back via perm
        i_d = jnp.asarray(np.asarray(dense.perm))[np.where(i_d >= 0, i_d, 0)]
        # same triangle except near-exact-tie lanes
        diff = hit & (np.asarray(i_b) != np.asarray(i_d))
        np.testing.assert_allclose(np.asarray(t_b)[diff],
                                   np.asarray(t_d)[diff], rtol=1e-3)


def test_lbvh_any_hit_matches_dense(rng_np):
    tris = random_tris(rng_np, 64)
    b = bvh.build(tris)
    dense = intersect.build_dense(tris)
    o, d = random_rays(rng_np, 129)
    for tm in [1e30, 3.0]:
        got = np.asarray(bvh.any_hit(b, tm, o, d))
        want = np.asarray(intersect.any_hit(
            dense, tm, la.v3_from_array(o), la.v3_from_array(d)))
        np.testing.assert_array_equal(got, want)


def test_lbvh_respects_tmax(rng_np):
    tris = random_tris(rng_np, 32)
    b = bvh.build(tris)
    o, d = random_rays(rng_np, 64)
    ok_far, t_far, _, _, _ = bvh.closest_hit(b, 1e30, o, d)
    # shrink tmax below each hit: must all miss
    tm = jnp.where(jnp.isfinite(t_far), t_far * 0.9, 0.5)
    ok_near, _, _, _, _ = bvh.closest_hit(b, tm, o, d)
    assert not np.any(np.asarray(ok_near) & np.asarray(ok_far))
