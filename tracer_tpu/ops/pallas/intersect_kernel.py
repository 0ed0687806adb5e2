"""Fused Pallas TPU kernel for the dense ray-triangle intersector.

The XLA formulation (ops/intersect.py) materializes the (4T, N) score
matrix in HBM and re-reads it through the epilogue + reduction; this
kernel keeps everything in VMEM:

  grid = (ray tiles,); chunk loop in-kernel
  per chunk: slab-test the ray tile against the chunk's AABB (triangles
  are morton-sorted at build, so chunks are spatially tight — an
  implicit two-level hierarchy); if any lane can still hit, run the
  MXU (4C,16)@(16,TILE_N) score matmul + Moller epilogue + min/argmin
  over the C (sublane) axis and merge into the running (best_t,
  best_i). Chunks whose AABB lies behind every lane's current best-t
  (or tmax) are skipped entirely.

  Each tile visits chunks NEAR-TO-FAR along its own schedule
  (_tile_chunk_order, computed XLA-side and passed through SMEM):
  chunks no lane can reach at tmax are never visited, and once the
  near chunks have tightened every lane's best-t the far tail dies on
  the slab cull — so coherent tiles do O(overlapped chunks) matmuls
  instead of O(all chunks).

HBM traffic is phi reads + (TILE_N,) outputs; skipped chunks cost a few
VPU ops. The same shape serves any_hit (bool accumulate + tmax cull).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer_tpu.ops import shapes

# The kernel holds all chunk coefficients VMEM-resident plus ~12MB of
# (C, TILE_N) epilogue temporaries; the default 16MB scoped-vmem budget
# overflows around ~6k triangles (observed 17.57M at 8716 tris). v5e has
# 128MB of VMEM — raise the cap so big scenes compile.
_VMEM_LIMIT = 100 * 1024 * 1024

TILE_N = 2048     # rays per tile (lanes)
# Triangles per chunk are derived per call from the build-time
# chunk_bounds granularity (intersect.build_dense pads large scenes to
# 256): 256 beats 128 by ~1.5x on mid-size scenes (fewer, larger
# per-block matmuls) and ties on 8k+ tris; 512 loses cull
# effectiveness (measured, PERF.md).


def _split_bf16(x):
    """Split f32 into (hi, lo) bf16 so hi+lo reproduces ~16 mantissa bits.

    hi is built by MASKING the low 16 mantissa bits (truncation), not by
    a f32->bf16->f32 convert roundtrip: XLA's bf16 simplification folds
    `x - f32(bf16(x))` into a bf16-precision subtraction, which is
    exactly 0 — silently degrading the split to plain bf16 (observed on
    v5e: lo == 0, 2^-9 relative error, visible light leaks on grazing
    glass hits). The bitmask form has no convert chain to pattern-match,
    so the subtraction stays f32 and lo really carries bits 9..16."""
    xu = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        xu & jnp.uint32(0xFFFF0000), jnp.float32)
    hi = hi_f32.astype(jnp.bfloat16)  # exact: mantissa already truncated
    lo = (x - hi_f32).astype(jnp.bfloat16)
    return hi, lo


def _pack_phi(phi):
    """(16, N) f32 -> (48, N) bf16 [ph; plo; ph] (the K-packed bf16x3
    right operand; see _scores)."""
    ph, plo = _split_bf16(phi)
    return jnp.concatenate([ph, plo, ph], axis=0)


def _scores(coeffs, phi_cat, tmax):
    """coeffs (4C, 48) bf16 packed, phi_cat (48, TILE_N) bf16 packed ->
    (valid, t) each (C, TILE_N).

    bf16x3 arithmetic (x*y ~ xh*yh + xh*yl + xl*yh, f32 accumulation,
    ~2^-22 relative error — far below the geometric epsilons) is packed
    into ONE K=48 matmul instead of three K=16 passes:

        [xh | xh | xl] @ [yh; yl; yh]  ==  xh@yh + xh@yl + xl@yh

    The MXU pipes any K <= 128 through in one pass, so tripling K is
    free — 3x fewer MXU passes than the unpacked form for the same
    precision (coeffs are pre-packed at build time in _pad_inputs; phi
    is packed once per tile in the kernel).

    The four determinant blocks (a, n.t, n.u, n.v) are multiplied and
    consumed ONE AT A TIME: a fused 4C-row product keeps all block
    results + epilogue temps live at once (~12MB/tile at C=128,
    N=2048), which spills VMEM and made the kernel 6x slower at 8716
    triangles. Per-block products cap the live set at a few (C, N)
    buffers.
    """
    c = coeffs.shape[0] // 4
    mm = lambda rows: jnp.dot(rows, phi_cat,
                              preferred_element_type=jnp.float32)

    a = mm(coeffs[:c])
    nondeg = jnp.abs(a) >= shapes.TRI_EPS
    inv_a = jnp.where(nondeg, 1.0, 0.0) / jnp.where(nondeg, a, 1.0)
    t = mm(coeffs[c:2 * c]) * inv_a
    valid = nondeg & (t > 0) & (t < tmax)
    u = mm(coeffs[2 * c:3 * c]) * inv_a
    valid &= u >= 0
    v = -(mm(coeffs[3 * c:]) * inv_a)
    valid &= (v >= 0) & (u + v <= 1)
    return valid, jnp.where(valid, t, jnp.inf)


def _scores_any(coeffs, phi_cat, tmax):
    """Validity-only variant for shadow queries: all Moller tests run in
    multiplied space (u >= 0  <=>  nu*a >= 0, u+v <= 1  <=>
    (nu-nv)*a <= a^2, t < tmax  <=>  nt*a < tmax*a^2, ...), so the
    divide — the most expensive epilogue op — disappears along with the
    t output. Sign tests are exact (IEEE product/quotient signs agree);
    magnitude tests differ from the divide form by <= 1 ulp at the
    boundary, far inside the geometric epsilons.
    """
    c = coeffs.shape[0] // 4
    mm = lambda rows: jnp.dot(rows, phi_cat,
                              preferred_element_type=jnp.float32)

    a = mm(coeffs[:c])
    a2 = a * a
    valid = a2 >= shapes.TRI_EPS * shapes.TRI_EPS
    nt_a = mm(coeffs[c:2 * c]) * a
    valid &= (nt_a > 0) & (nt_a < tmax * a2)
    nu_a = mm(coeffs[2 * c:3 * c]) * a
    valid &= nu_a >= 0
    nv_a = mm(coeffs[3 * c:]) * a
    valid &= (nv_a <= 0) & (nu_a - nv_a <= a2)
    return valid


def _tile_chunk_order(phi, tmaxv, chunk_bounds, n_tiles):
    """Per-ray-tile near-to-far chunk visitation schedule (XLA side).

    For every (tile, chunk) pair: slab-test the tile's rays against the
    chunk AABB at the ray tmax and reduce to the tile's nearest entry
    distance. Chunks no lane can reach get +inf. Returns
      order (n_tiles, K) int32 — chunk ids sorted by tile entry distance
      count (n_tiles,) int32 — how many chunks any lane can reach
    The kernel then loops r < count[tile] visiting order[tile, r]:
    unreachable chunks are never visited at all, and the near-to-far
    order makes the per-lane best-t bound tight after the first few
    chunks so the in-kernel cull (upper = min(tmax, best_t)) rejects the
    far tail — an O(hit chunks) loop instead of O(all chunks) for
    coherent tiles. Scheduling is an optimization only: any order/count
    superset yields identical results (min over a superset of chunks).
    """
    def one(bound):
        tmin = jnp.zeros(phi.shape[1:], jnp.float32)
        tmx = tmaxv
        for k in range(3):
            inv = 1.0 / phi[k]
            t0 = (bound[k] - phi[3 + k]) * inv
            t1 = (bound[3 + k] - phi[3 + k]) * inv
            tmin = jnp.maximum(tmin, jnp.minimum(t0, t1))
            tmx = jnp.minimum(tmx, jnp.maximum(t0, t1)
                              * (1.0 + shapes.AABB_EPS))
        # fully-padded chunks carry an inverted +inf/-inf box, which the
        # slab test does NOT reject (per-axis lo=-inf, hi=+inf) — key
        # them out explicitly so they never enter any tile's schedule
        empty = bound[0] > bound[3]
        entry = jnp.where((tmx > tmin) & ~empty, tmin, jnp.inf)
        return jnp.min(entry.reshape(n_tiles, TILE_N), axis=1)

    keys = jax.lax.map(one, chunk_bounds).T          # (n_tiles, K)
    order = jnp.argsort(keys, axis=1).astype(jnp.int32)
    count = jnp.sum(jnp.isfinite(keys), axis=1).astype(jnp.int32)
    return order, count


def _chunk_cull(phi, bounds_ref, ci, upper):
    """Slab test of the tile's rays against chunk ci's AABB
    (shapes.hit_aabb semantics: tmin0=0, hi inflated by 1+eps).
    Returns per-lane bool "may hit"."""
    tmin = jnp.zeros(phi.shape[1:], jnp.float32)
    tmax_ = upper
    for k in range(3):
        dk = phi[k]
        ok_ = phi[3 + k]
        inv = 1.0 / dk
        t0 = (bounds_ref[ci, k] - ok_) * inv
        t1 = (bounds_ref[ci, 3 + k] - ok_) * inv
        lo = jnp.minimum(t0, t1)
        hi = jnp.maximum(t0, t1) * (1.0 + shapes.AABB_EPS)
        tmin = jnp.maximum(tmin, lo)
        tmax_ = jnp.minimum(tmax_, hi)
    return tmax_ > tmin


def _closest_kernel(chunk_t: int, phi_ref, coeffs_ref,
                    tmax_ref, bounds_ref, order_ref, count_ref,
                    best_t_ref, best_i_ref):
    """Grid is (ray tiles,) only: the chunk loop runs in-kernel following
    this tile's near-to-far schedule (order/count from _tile_chunk_order)
    so unreachable chunks are never visited and far chunks die on the
    best-t slab cull."""
    phi = phi_ref[:]
    phi_cat = _pack_phi(phi)
    tmax = tmax_ref[:]
    best_t_ref[:] = jnp.full((TILE_N,), jnp.inf, jnp.float32)
    best_i_ref[:] = jnp.zeros((TILE_N,), jnp.int32)

    ti = pl.program_id(0)

    def body(r, _):
        ci = order_ref[ti, r]
        upper = jnp.minimum(tmax, best_t_ref[:])
        may_hit = _chunk_cull(phi, bounds_ref, ci, upper)

        @pl.when(jnp.any(may_hit))
        def _():
            coeffs = coeffs_ref[pl.ds(ci * 4 * chunk_t, 4 * chunk_t), :]
            valid, t = _scores(coeffs, phi_cat, tmax)
            loc_t = jnp.min(t, axis=0)
            loc_i = jnp.argmin(t, axis=0).astype(jnp.int32) + ci * chunk_t
            better = loc_t < best_t_ref[:]
            best_t_ref[:] = jnp.where(better, loc_t, best_t_ref[:])
            best_i_ref[:] = jnp.where(better, loc_i, best_i_ref[:])

        return 0

    jax.lax.fori_loop(0, count_ref[ti], body, 0)


def _any_kernel(chunk_t: int, phi_ref, coeffs_ref, tmax_ref,
                bounds_ref, order_ref, count_ref, hit_ref):
    phi = phi_ref[:]
    phi_cat = _pack_phi(phi)
    tmax = tmax_ref[:]
    hit_ref[:] = jnp.zeros((TILE_N,), jnp.bool_)

    ti = pl.program_id(0)

    def body(r, _):
        ci = order_ref[ti, r]
        may_hit = _chunk_cull(phi, bounds_ref, ci, tmax) & ~hit_ref[:]

        @pl.when(jnp.any(may_hit))
        def _():
            coeffs = coeffs_ref[pl.ds(ci * 4 * chunk_t, 4 * chunk_t), :]
            valid = _scores_any(coeffs, phi_cat, tmax)
            hit_ref[:] = hit_ref[:] | jnp.any(valid, axis=0)

        return 0

    jax.lax.fori_loop(0, count_ref[ti], body, 0)


def _pad_inputs(coeffs, phi_t, tmax, n, n_chunks):
    """Pad rays to TILE_N multiple and the feature axis 10 -> 16
    (sublane alignment for the MXU operand), then pre-pack the triangle
    coefficients as the K=48 bf16x3 left operand [rh | rh | rl] (see
    _scores). Chunking matches the build-time chunk_bounds
    granularity."""
    t_pad = coeffs.shape[1]
    assert t_pad % n_chunks == 0, (t_pad, n_chunks)
    chunk_t = t_pad // n_chunks
    n_pad = -(-n // TILE_N) * TILE_N
    coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, 6)))
    coeffs = coeffs.reshape(4, n_chunks, chunk_t, 16)
    coeffs = coeffs.transpose(1, 0, 2, 3).reshape(n_chunks * 4 * chunk_t, 16)
    rh, rl = _split_bf16(coeffs)
    coeffs = jnp.concatenate([rh, rh, rl], axis=-1)   # (rows, 48) bf16
    phi = jnp.pad(phi_t, ((0, 6), (0, n_pad - n)))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    tmax = jnp.pad(tmax, (0, n_pad - n))
    return coeffs, phi, tmax, n_pad, chunk_t


def closest_hit_pallas(coeffs, phi_t, tmax, chunk_bounds, *,
                       interpret: bool = False):
    """coeffs (4, T_pad, 10) + chunk_bounds (T_pad/128, 8) from
    intersect.build_dense, phi_t (10, N), tmax scalar or (N,).
    Returns (best_t (N,), best_i (N,)) with best_i in storage order."""
    import functools
    n = phi_t.shape[1]
    n_chunks = chunk_bounds.shape[0]
    coeffs2, phi, tmaxv, n_pad, chunk_t = _pad_inputs(
        coeffs, phi_t, tmax, n, n_chunks)
    n_tiles = n_pad // TILE_N
    order, count = _tile_chunk_order(phi, tmaxv, chunk_bounds, n_tiles)
    grid = (n_tiles,)
    best_t, best_i = pl.pallas_call(
        functools.partial(_closest_kernel, chunk_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, TILE_N), lambda ri: (0, ri)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all chunk coeffs
            pl.BlockSpec((TILE_N,), lambda ri: (ri,)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # order (n_tiles, K)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count (n_tiles,)
        ],
        out_specs=[
            pl.BlockSpec((TILE_N,), lambda ri: (ri,)),
            pl.BlockSpec((TILE_N,), lambda ri: (ri,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(phi, coeffs2, tmaxv, chunk_bounds, order, count)
    return best_t[:n], best_i[:n]


def any_hit_pallas(coeffs, phi_t, tmax, chunk_bounds, *,
                   interpret: bool = False):
    """Shadow-query variant. Returns hit (N,) bool."""
    import functools
    n = phi_t.shape[1]
    n_chunks = chunk_bounds.shape[0]
    coeffs2, phi, tmaxv, n_pad, chunk_t = _pad_inputs(
        coeffs, phi_t, tmax, n, n_chunks)
    n_tiles = n_pad // TILE_N
    order, count = _tile_chunk_order(phi, tmaxv, chunk_bounds, n_tiles)
    grid = (n_tiles,)
    hit = pl.pallas_call(
        functools.partial(_any_kernel, chunk_t),
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, TILE_N), lambda ri: (0, ri)),
            pl.BlockSpec(memory_space=pltpu.VMEM),  # all chunk coeffs
            pl.BlockSpec((TILE_N,), lambda ri: (ri,)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),  # order (n_tiles, K)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count (n_tiles,)
        ],
        out_specs=pl.BlockSpec((TILE_N,), lambda ri: (ri,)),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.bool_),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(phi, coeffs2, tmaxv, chunk_bounds, order, count)
    return hit[:n]
