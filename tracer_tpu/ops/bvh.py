"""LBVH build and vectorized stackless traversal (replaces bvh.fut:75-168).

Build pipeline (one XLA program, mirrors the call stack in SURVEY.md 3.1):
  triangle AABBs -> scene bounds -> morton codes -> argsort -> Karras
  radix tree -> bottom-up AABB refit.

Refit improves on the reference's fixed (log2 n + 2)-round full-update loop
(bvh.fut:105-120, flagged "so wasteful" by its own TODO): we iterate the
same dense update inside a while_loop with a convergence test, so shallow
trees stop early and pathological trees still converge exactly.

Traversal is the parent-pointer stackless walk (bvh.fut:123-145) run for
the whole ray batch at once: per-ray int32 cursors (current, prev) and a
shrinking tmax, advanced by gathers + selects under one lax.while_loop
until every lane has exited through the root. No per-lane stack, three
int32s of state per ray.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tracer_tpu.ops import morton, radix_tree, shapes


class LBVH(NamedTuple):
    """node arrays are (I,) = (n-1,) internal nodes; tris are morton-ordered.

    Child pointers use the radix_tree encoding: [0, I) internal,
    [I, I+n) leaf (index - I into the reordered leaves).
    """
    node_min: jax.Array   # (I, 3) f32
    node_max: jax.Array   # (I, 3) f32
    left: jax.Array       # (I,) int32
    right: jax.Array      # (I,) int32
    parent: jax.Array     # (I,) int32
    tris: jax.Array       # (n, 3, 3) f32, reordered
    perm: jax.Array       # (n,) int32: leaf i was input triangle perm[i]


def build(tris) -> LBVH:
    """Build an LBVH over (n, 3, 3) triangles, n >= 2."""
    tris = jnp.asarray(tris, jnp.float32)
    n = tris.shape[0]

    tri_min, tri_max = shapes.bounding_box_triangle(tris)
    scene_min = jnp.min(tri_min, axis=0)
    scene_max = jnp.max(tri_max, axis=0)
    dims = jnp.maximum(scene_max - scene_min, 1e-30)
    centers = (shapes.aabb_center(tri_min, tri_max) - scene_min) / dims
    codes = morton.morton3d(centers)

    order = jnp.argsort(codes).astype(jnp.int32)
    codes = codes[order]
    tris = tris[order]
    tri_min = tri_min[order]
    tri_max = tri_max[order]

    tree = radix_tree.build(codes)
    n_int = n - 1

    def get_child_aabb(node_min, node_max, ptr):
        leaf = radix_tree.is_leaf(ptr, n_int)
        li = jnp.clip(radix_tree.leaf_index(ptr, n_int), 0, n - 1)
        ii = jnp.clip(ptr, 0, n_int - 1)
        cmin = jnp.where(leaf[:, None], tri_min[li], node_min[ii])
        cmax = jnp.where(leaf[:, None], tri_max[li], node_max[ii])
        return cmin, cmax

    def refit_round(node_min, node_max):
        lmin, lmax = get_child_aabb(node_min, node_max, tree.left)
        rmin, rmax = get_child_aabb(node_min, node_max, tree.right)
        return jnp.minimum(lmin, rmin), jnp.maximum(lmax, rmax)

    def refit_cond(carry):
        node_min, node_max, prev_min, prev_max, it = carry
        changed = jnp.any(node_min != prev_min) | jnp.any(node_max != prev_max)
        return changed & (it < n_int + 2)

    def refit_body(carry):
        node_min, node_max, _, _, it = carry
        new_min, new_max = refit_round(node_min, node_max)
        return new_min, new_max, node_min, node_max, it + 1

    init_min = jnp.zeros((n_int, 3), jnp.float32)
    init_max = jnp.zeros((n_int, 3), jnp.float32)
    first_min, first_max = refit_round(init_min, init_max)
    node_min, node_max, _, _, _ = jax.lax.while_loop(
        refit_cond, refit_body,
        (first_min, first_max, init_min, init_max, jnp.int32(0)))

    return LBVH(node_min=node_min, node_max=node_max,
                left=tree.left, right=tree.right, parent=tree.parent,
                tris=tris, perm=order)


def _traverse(bvh: LBVH, tmax0, origin, d, *, any_hit: bool,
              max_iters: int | None = None):
    """Shared stackless walk. Returns (closest_leaf (N,), tmax (N,))
    for closest-hit, or (hit (N,) bool, _) for any-hit."""
    n_int = bvh.left.shape[0]
    n_leaves = bvh.tris.shape[0]
    n_rays = origin.shape[0]
    if max_iters is None:
        # Each internal node is entered at most 3 times on the walk.
        max_iters = 3 * n_int + 3 * n_leaves + 8

    tmax0 = jnp.broadcast_to(jnp.asarray(tmax0, jnp.float32), (n_rays,))

    def cond(state):
        current, _, _, _, it = state
        return jnp.any(current != -1) & (it < max_iters)

    def body(state):
        current, prev, closest, tmax, it = state
        live = current != -1
        ci = jnp.where(live, current, 0)

        node_left = bvh.left[ci]
        node_right = bvh.right[ci]
        node_parent = bvh.parent[ci]
        nmin = bvh.node_min[ci]
        nmax = bvh.node_max[ci]

        aabb_hit = shapes.hit_aabb(tmax, origin, d, nmin, nmax)
        from_left = prev == node_left
        take_left = (~from_left) & (prev != node_right) & aabb_hit
        has_child = from_left | take_left
        child = jnp.where(from_left, node_right, node_left)

        child_is_leaf = radix_tree.is_leaf(child, n_int) & has_child
        li = jnp.clip(radix_tree.leaf_index(child, n_int), 0, n_leaves - 1)
        tri = bvh.tris[jnp.where(child_is_leaf, li, 0)]
        ok, t, _, _ = shapes.hit_triangle(tmax, origin, d, tri)
        leaf_hit = child_is_leaf & ok

        if any_hit:
            closest = closest | leaf_hit
        else:
            closest = jnp.where(leaf_hit, li, closest)
            tmax = jnp.where(leaf_hit, t, tmax)

        # Next cursor: descend into internal child, stay on leaf test,
        # or retreat to the parent when no child remains.
        descend = has_child & ~child_is_leaf
        new_current = jnp.where(descend, child,
                                jnp.where(has_child, current, node_parent))
        new_prev = jnp.where(descend | child_is_leaf, child,
                             jnp.where(has_child, prev, current))
        if any_hit:
            # Lane done as soon as anything is hit.
            new_current = jnp.where(closest, -1, new_current)

        new_current = jnp.where(live, new_current, current)
        new_prev = jnp.where(live, new_prev, prev)
        return new_current, new_prev, closest, tmax, it + 1

    init_closest = (jnp.zeros((n_rays,), bool) if any_hit
                    else jnp.full((n_rays,), -1, jnp.int32))
    init = (jnp.zeros((n_rays,), jnp.int32),
            jnp.full((n_rays,), -1, jnp.int32),
            init_closest, tmax0, jnp.int32(0))
    current, prev, closest, tmax, _ = jax.lax.while_loop(cond, body, init)
    return closest, tmax


def closest_hit(bvh: LBVH, tmax, origin, d):
    """Closest-hit query over the batch (bvh.fut:123-145 semantics).

    Returns (ok, t, tri_idx (original input index, -1 on miss), pos, normal).
    """
    leaf, _ = _traverse(bvh, tmax, origin, d, any_hit=False)
    ok0 = leaf >= 0
    li = jnp.where(ok0, leaf, 0)
    tri = bvh.tris[li]
    # Final elementwise re-intersection of the winning leaf, as in the
    # reference (bvh.fut:143-145).
    ok, t, pos, normal = shapes.hit_triangle(
        jnp.asarray(tmax, jnp.float32), origin, d, tri)
    ok = ok & ok0
    tri_idx = jnp.where(ok, bvh.perm[li], -1)
    return ok, jnp.where(ok, t, jnp.inf), tri_idx, pos, normal


def any_hit(bvh: LBVH, tmax, origin, d):
    """Shadow-ray query: any intersection before tmax (bvh.fut:149-167)."""
    hit, _ = _traverse(bvh, tmax, origin, d, any_hit=True)
    return hit
