"""Dense ray-triangle intersection as MXU matmuls.

TPU-native re-design of the brute-force oracle `mk_fake_bvh`
(reference src/bvh.fut:25-43) that is ALSO a production fast path for
small-to-medium scenes: every determinant of the Moller triangle test
(reference src/shapes.fut:66-86) is linear in the ray features

    phi(ray) = [ d, o, o x d, 1 ]            in R^10

so testing N rays against T triangles is one (N,10) @ (10,4T) matmul on
the MXU plus elementwise VPU postprocessing:

    a   = -(n . d)                 n  = e1 x e2
    n.s =  n . o - n . A           s  = o - A
    m.e2 = (o x d) . e2 + (A x e2) . d
    m.e1 = (o x d) . e1 + (A x e1) . d
    t = (n.s)/a,  u = (m.e2)/a,  v = -(m.e1)/a

Triangles are processed in padded chunks under `lax.scan` with a running
(best_t, best_index) reduction so the (N, T) score matrix never
materializes in HBM for large T.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np
import jax
import jax.numpy as jnp

from tracer_tpu.ops import linalg as la
from tracer_tpu.ops import shapes

# Lane width of the TPU vector unit; triangle chunks are padded to this.
_PAD = 128
DEFAULT_CHUNK = 512


class DenseTris(NamedTuple):
    """Precomputed triangle coefficients for the matmul intersector.

    coeffs: (10, T_pad, 4) f32 - columns (a, n.s, m.e2, m.e1) per triangle
    tris:   (T_pad, 3, 3) f32  - padded vertex data (zeros => degenerate,
            always rejected by the |a| >= eps test)
    """
    coeffs: jax.Array
    tris: jax.Array


def build_dense(tris, pad_to: int = _PAD) -> DenseTris:
    """Precompute matmul coefficients from (T, 3, 3) triangles."""
    tris = jnp.asarray(tris, jnp.float32)
    t = tris.shape[0]
    t_pad = max(pad_to, -(-t // pad_to) * pad_to)
    tris = jnp.pad(tris, ((0, t_pad - t), (0, 0), (0, 0)))

    a_v = tris[:, 0, :]
    e1 = tris[:, 1, :] - a_v
    e2 = tris[:, 2, :] - a_v
    n = jnp.cross(e1, e2)
    axe1 = jnp.cross(a_v, e1)
    axe2 = jnp.cross(a_v, e2)

    coeffs = jnp.zeros((10, t_pad, 4), jnp.float32)
    # column 0: a = -(n . d)
    coeffs = coeffs.at[0:3, :, 0].set(-n.T)
    # column 1: n . s = n . o - n . A
    coeffs = coeffs.at[3:6, :, 1].set(n.T)
    coeffs = coeffs.at[9, :, 1].set(-jnp.sum(n * a_v, axis=-1))
    # column 2: m . e2 = (o x d) . e2 + (A x e2) . d
    coeffs = coeffs.at[6:9, :, 2].set(e2.T)
    coeffs = coeffs.at[0:3, :, 2].set(axe2.T)
    # column 3: m . e1
    coeffs = coeffs.at[6:9, :, 3].set(e1.T)
    coeffs = coeffs.at[0:3, :, 3].set(axe1.T)
    return DenseTris(coeffs=coeffs, tris=tris)


def ray_features(origin, d):
    """phi(ray): (N, 10) = [d, o, o x d, 1]."""
    one = jnp.ones(origin.shape[:-1] + (1,), jnp.float32)
    return jnp.concatenate([d, origin, jnp.cross(origin, d), one], axis=-1)


def _chunk_scores(phi, coeffs_chunk, tmax):
    """Intersect rays (N,10) against one chunk (10,C,4) of triangles.

    Returns (valid (N,C) bool, t (N,C) f32 with +inf on invalid lanes).
    """
    p = jnp.einsum("nk,kcf->ncf", phi, coeffs_chunk,
                   precision=jax.lax.Precision.HIGHEST)
    a, nt, nu, nv = p[..., 0], p[..., 1], p[..., 2], p[..., 3]
    nondeg = jnp.abs(a) >= shapes.TRI_EPS
    inv_a = jnp.where(nondeg, 1.0, 0.0) / jnp.where(nondeg, a, 1.0)
    t = nt * inv_a
    u = nu * inv_a
    v = -nv * inv_a
    tm = tmax if jnp.ndim(tmax) == 0 else tmax[..., None]
    valid = nondeg & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0) & (t < tm)
    return valid, jnp.where(valid, t, jnp.inf)


def closest_hit(dense: DenseTris, tmax, origin, d,
                chunk: int = DEFAULT_CHUNK):
    """Closest-hit query: rays (N,3)+(N,3) vs all triangles.

    Returns (ok (N,), t (N,), tri_idx (N,) int32, pos (N,3), normal (N,3)).
    Semantics match mk_fake_bvh.closest_hit (bvh.fut:31-39): global min-t,
    first triangle on ties by index order.
    """
    phi = ray_features(origin, d)
    t_pad = dense.coeffs.shape[1]
    n_chunks = -(-t_pad // chunk)

    if n_chunks == 1:
        valid, t = _chunk_scores(phi, dense.coeffs, tmax)
        best_i = jnp.argmin(t, axis=-1).astype(jnp.int32)
        best_t = jnp.min(t, axis=-1)
    else:
        pad = n_chunks * chunk - t_pad
        coeffs = jnp.pad(dense.coeffs, ((0, 0), (0, pad), (0, 0)))
        coeffs = coeffs.reshape(10, n_chunks, chunk, 4).transpose(1, 0, 2, 3)

        def body(carry, inp):
            best_t, best_i = carry
            c_idx, coeffs_chunk = inp
            _, t = _chunk_scores(phi, coeffs_chunk, tmax)
            loc_i = jnp.argmin(t, axis=-1).astype(jnp.int32)
            loc_t = jnp.min(t, axis=-1)
            better = loc_t < best_t
            best_t = jnp.where(better, loc_t, best_t)
            best_i = jnp.where(better, c_idx * chunk + loc_i, best_i)
            return (best_t, best_i), None

        init = (jnp.full(phi.shape[:-1], jnp.inf, jnp.float32),
                jnp.zeros(phi.shape[:-1], jnp.int32))
        (best_t, best_i), _ = jax.lax.scan(
            body, init, (jnp.arange(n_chunks, dtype=jnp.int32), coeffs))

    ok = jnp.isfinite(best_t)
    # Re-intersect the winning triangle elementwise for exact pos/normal,
    # mirroring the reference's final hit_triangle on the best leaf
    # (bvh.fut:143-145).
    tri = dense.tris[jnp.where(ok, best_i, 0)]
    ok2, t, pos, normal = shapes.hit_triangle(
        jnp.asarray(tmax, jnp.float32) * (1.0 + 1e-6), origin, d, tri)
    ok = ok & ok2
    return (ok, jnp.where(ok, t, jnp.inf),
            jnp.where(ok, best_i, -1), pos, normal)


def any_hit(dense: DenseTris, tmax, origin, d,
            chunk: int = DEFAULT_CHUNK):
    """Shadow-ray query: True where any triangle is hit before tmax
    (mk_fake_bvh.any_hit, bvh.fut:41-42)."""
    phi = ray_features(origin, d)
    t_pad = dense.coeffs.shape[1]
    n_chunks = -(-t_pad // chunk)
    if n_chunks == 1:
        valid, _ = _chunk_scores(phi, dense.coeffs, tmax)
        return jnp.any(valid, axis=-1)

    pad = n_chunks * chunk - t_pad
    coeffs = jnp.pad(dense.coeffs, ((0, 0), (0, pad), (0, 0)))
    coeffs = coeffs.reshape(10, n_chunks, chunk, 4).transpose(1, 0, 2, 3)

    def body(hit, coeffs_chunk):
        valid, _ = _chunk_scores(phi, coeffs_chunk, tmax)
        return hit | jnp.any(valid, axis=-1), None

    hit, _ = jax.lax.scan(body, jnp.zeros(phi.shape[:-1], bool), coeffs)
    return hit


def closest_hit_bruteforce(tris, tmax, origin, d):
    """Pure-broadcast oracle (no matmul) used to validate the MXU path in
    tests; O(N*T) memory, test-sized inputs only."""
    ok, t, _, _ = shapes.hit_triangle(
        tmax, origin[..., None, :], d[..., None, :], tris)
    best_i = jnp.argmin(t, axis=-1).astype(jnp.int32)
    best_t = jnp.min(t, axis=-1)
    hit = jnp.isfinite(best_t)
    return hit, best_t, jnp.where(hit, best_i, -1)
