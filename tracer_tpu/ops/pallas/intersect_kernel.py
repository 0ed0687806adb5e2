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

  The schedule is built at SUPERCHUNK granularity — groups of
  g = ceil(n_chunks / MAX_SCHED) morton-consecutive chunks — so its
  SMEM table and XLA-side build cost stay bounded (<= MAX_SCHED
  entries/tile) at any scene size. At g > 1 the kernel walk is
  two-level: each scheduled superchunk's union AABB is re-tested at
  the current (best-t-tightened) bound before its g member culls run,
  so superchunks occluded since schedule time cost one slab test, not
  g. Stock scenes (< MAX_SCHED chunks) get g = 1: per-chunk
  scheduling, flat walk.

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

TILE_N = 2048     # rays per tile (lanes); override via TRACER_TILE_N


def _round_tile(v: int) -> int:
    """Lane tiles must be multiples of the 128-lane vreg width (the
    (1, N) rank-2 per-lane carriers make any 128-multiple legal).
    Non-multiples round UP and warn once: silent rounding would make a
    user-set TRACER_TILE_N(_ANY) quietly mean something else, and
    knob_key caches on the raw env string so two spellings of the same
    rounded tile would compile duplicate executables."""
    r = max(128, -(-v // 128) * 128)
    if r != v:
        import warnings
        warnings.warn(
            f"tile width {v} is not a multiple of the 128-lane vreg; "
            f"rounding up to {r} (set TRACER_TILE_N/_ANY to a multiple "
            "of 128 to silence)", stacklevel=3)
    return r


def _tile_n() -> int:
    """Per-call tile width. Smaller tiles cull better (a tile's chunk
    schedule covers the union of its rays' reachable sets) at the cost
    of more per-tile fixed work (phi pack, schedule walk)."""
    import os
    return _round_tile(int(os.environ.get("TRACER_TILE_N", str(TILE_N))))


def _tile_n_any() -> int:
    """TRACER_TILE_N_ANY: anyhit-specific ray-tile width (defaults to
    TRACER_TILE_N). Shadow queries carry tight tmax and, on
    specular-heavy scenes, ~90% NEE-masked lanes (tmax 0 fails every
    slab), so smaller tiles isolate the live lanes and cull far better
    than for closest: on the captured SpectrumSphere ray mix, anyhit
    element-work varies 3x across tile 256-2048 while closest is flat
    (benchmarks/schedule_stats.py)."""
    import os
    v = os.environ.get("TRACER_TILE_N_ANY")
    return _round_tile(int(v)) if v else _tile_n()


def _approx_recip() -> bool:
    """TRACER_APPROX_RECIP: approximate reciprocal in the closest
    epilogue (see _scores). ON by default (=0 opts out): measured +16%
    end-to-end on the spectrum config (47.4 -> 54.9 Mrays/s,
    2026-08-19) and every accepted hit is re-verified by the exact
    elementwise _reintersect, so approximation can only shuffle winners
    within the error band (APPROX_RECIP_REL), never admit a false hit.
    """
    import os
    return os.environ.get("TRACER_APPROX_RECIP", "1") != "0"


# Relative-error bound for pl.reciprocal(approx=True), measured
# 2026-08-19 (tests/test_pallas_kernel.py::test_approx_recip_error_band
# re-pins it). In INTERPRET mode jax lowers approx=True as
# 1/f32(bf16(x)) — the INPUT is rounded to bf16 (8 mantissa bits), so
# the bound is 2^-8 (observed in-kernel max 3.6e-3 = 2^-8.1). The TPU
# Mosaic lowering emits the hardware reciprocal instruction, measured
# at max_rel 1.6e-5 = 2^-15.9 over 2^20 inputs spanning exponents
# [-20, 20) (benchmarks/measure_recip.py, v5e via axon, 2026-08-19) —
# ~256x tighter. The shared bound here is the worst of the two paths
# so one constant covers tests and production on either backend.
APPROX_RECIP_REL = 2.0 ** -8
# Max schedule entries per tile: chunks group into superchunks of
# g = ceil(n_chunks / MAX_SCHED) so the SMEM order table is (n_tiles,
# <=MAX_SCHED) int32 and the XLA-side schedule build is O(MAX_SCHED * N)
# regardless of scene size.
MAX_SCHED = 64
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


def _split_bf16_3(x):
    """Split f32 into (hi, mid, lo) bf16 so hi+mid+lo reproduces the
    full 24-bit mantissa (same mask-don't-convert construction as
    _split_bf16; each residual subtraction is exact because the
    truncated piece shares x's exponent range)."""
    xu = jax.lax.bitcast_convert_type(x, jnp.uint32)
    hi_f32 = jax.lax.bitcast_convert_type(
        xu & jnp.uint32(0xFFFF0000), jnp.float32)
    r1 = x - hi_f32
    r1u = jax.lax.bitcast_convert_type(r1, jnp.uint32)
    mid_f32 = jax.lax.bitcast_convert_type(
        r1u & jnp.uint32(0xFFFF0000), jnp.float32)
    lo = (r1 - mid_f32).astype(jnp.bfloat16)
    return hi_f32.astype(jnp.bfloat16), mid_f32.astype(jnp.bfloat16), lo


# K-packed multi-word bf16 emulation of the f32 score matmul: each
# operand splits into `splits` bf16 words and the product keeps every
# term pair whose magnitude exceeds the target precision, laid out so
# ONE dot_general computes their sum (the MXU pipes any K <= 128
# through in one pass, so K-packing is free compute):
#   x3 (splits=2, K=48):  [xh|xh|xl] @ [yh;yl;yh]       ~2^-16 error
#   x6 (splits=3, K=96):  [xh|xh|xm|xh|xm|xl] @
#                         [yh;ym;yh;yl;ym;yh]           ~2^-24 (f32) error
# Word indices per block, left operand then right operand:
_PACK_LEFT = {2: (0, 0, 1), 3: (0, 0, 1, 0, 1, 2)}
_PACK_RIGHT = {2: (0, 1, 0), 3: (0, 1, 0, 2, 1, 0)}


def _split_words(x, splits: int):
    return _split_bf16(x) if splits == 2 else _split_bf16_3(x)


def _mxu_splits(t_pad: int) -> int:
    """Words per operand for the score matmul. bf16x3's error is
    ~2^-16 relative to the TERM magnitudes of each determinant dot
    product, and the near-edge barycentric scores it feeds suffer
    catastrophic cancellation as triangles shrink relative to the ray
    origin's distance (terms ~ |o|*edge, result ~ edge^2): at ~2M
    subdivided triangles the barycentric error band reaches ~1e-2 and
    visibly loses shared-edge hits (benchmarks/bigscene_check.py found
    5/8192 lost hits at 2.23M tris). x6 restores full f32 accuracy for
    the SAME number of MXU passes (K=96 <= 128), at 2x coefficient
    bytes — so it gates on scene size, where the conditioning needs it
    and the coefficients already live lane-major/streamed.
    TRACER_MXU_PACK=x3|x6 forces either."""
    import os
    mode = os.environ.get("TRACER_MXU_PACK", "").lower()
    if mode == "x3":
        return 2
    if mode == "x6":
        return 3
    return 3 if t_pad > LANE_MAJOR_MIN_TRIS else 2


def _pack_phi(phi, splits: int = 2):
    """(16, N) f32 -> (16*len(order), N) bf16 K-packed right operand
    (see _PACK_RIGHT)."""
    w = _split_words(phi, splits)
    return jnp.concatenate([w[i] for i in _PACK_RIGHT[splits]], axis=0)


def _blocks(coeffs, lane_major: bool):
    """Split the packed coefficient operand into its four determinant
    blocks + a matmul closure, for either storage layout:

      sublane-major (4C, 48): rows on sublanes, K=48 on lanes (padded
        to 128 in VMEM — 2.7x footprint, but the fastest MXU feed;
        the default for stock scenes).
      lane-major (48, 4C): rows on lanes, K=48 on sublanes (exact
        footprint — 48 = 3 bf16 sublane tiles; required for big scenes
        where the padded form would blow VMEM: a 139k-tri scene's
        coefficients are 54MB exact but 136MB padded, and the MXU
        contracts dim 0 of both operands directly at a modest
        throughput cost).
    """
    if lane_major:
        c = coeffs.shape[1] // 4
        blk = lambda b: coeffs[:, b * c:(b + 1) * c]
        dims = (((0,), (0,)), ((), ()))
    else:
        c = coeffs.shape[0] // 4
        blk = lambda b: coeffs[b * c:(b + 1) * c]
        dims = (((1,), (0,)), ((), ()))

    def mm(b, phi_cat):
        return jax.lax.dot_general(blk(b), phi_cat, dims,
                                   preferred_element_type=jnp.float32)
    return mm


def _scores(coeffs, phi_cat, tmax, lane_major: bool):
    """coeffs packed bf16 (layout per _blocks), phi_cat (48, TILE_N)
    bf16 packed -> (valid, t) each (C, TILE_N).

    bf16x3 arithmetic (x*y ~ xh*yh + xh*yl + xl*yh, f32 accumulation,
    ~2^-15 relative error: hi+lo carry ~16 mantissa bits and the xl*yl
    term is dropped — within the geometric epsilon budget, see
    _reintersect) is packed
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
    mm = _blocks(coeffs, lane_major)
    a = mm(0, phi_cat)
    nondeg = jnp.abs(a) >= shapes.TRI_EPS
    if _approx_recip():
        # Approximate reciprocal (on TPU: one VPU op vs the ~7-op
        # Newton divide; in interpret mode: 1/bf16(a)), relative error
        # <= APPROX_RECIP_REL (2^-8, measured — see the constant). t
        # only drives the in-chunk min/argmin, the monotone best-t cull
        # bound, and the returned best_t — the accepted winner is
        # re-verified by the exact elementwise _reintersect, whose tmax
        # slack is derived from this same bound (intersect.closest_hit).
        # Triangles within the band of each other may swap winners
        # (near-coincident surfaces); the XLA formulation uses the
        # exact divide.
        inv_a = jnp.where(nondeg, pl.reciprocal(a, approx=True), 0.0)
    else:
        inv_a = jnp.where(nondeg, 1.0, 0.0) / jnp.where(nondeg, a, 1.0)
    t = mm(1, phi_cat) * inv_a
    valid = nondeg & (t > 0) & (t < tmax)
    u = mm(2, phi_cat) * inv_a
    valid &= u >= 0
    v = -(mm(3, phi_cat) * inv_a)
    valid &= (v >= 0) & (u + v <= 1)
    return valid, jnp.where(valid, t, jnp.inf)


def _scores_any(coeffs, phi_cat, tmax, lane_major: bool):
    """Validity-only variant for shadow queries: all Moller tests run in
    multiplied space (u >= 0  <=>  nu*a >= 0, u+v <= 1  <=>
    (nu-nv)*a <= a^2, t < tmax  <=>  nt*a < tmax*a^2, ...), so the
    divide — the most expensive epilogue op — disappears along with the
    t output. Sign tests are exact (IEEE product/quotient signs agree);
    magnitude tests differ from the divide form by <= 1 ulp at the
    boundary, far inside the geometric epsilons.
    """
    mm = _blocks(coeffs, lane_major)
    a = mm(0, phi_cat)
    a2 = a * a
    valid = a2 >= shapes.TRI_EPS * shapes.TRI_EPS
    nt_a = mm(1, phi_cat) * a
    valid &= (nt_a > 0) & (nt_a < tmax * a2)
    nu_a = mm(2, phi_cat) * a
    valid &= nu_a >= 0
    nv_a = mm(3, phi_cat) * a
    valid &= (nv_a <= 0) & (nu_a - nv_a <= a2)
    return valid


def _superchunk_bounds(chunk_bounds, g: int):
    """Group g morton-consecutive chunks into one scheduling superchunk:
    (n_chunks, 8) -> (ceil(n_chunks/g), 8). Padding members carry the
    empty inverted box (+inf lo / -inf hi), which min/max absorbs."""
    n_chunks = chunk_bounds.shape[0]
    n_super = -(-n_chunks // g)
    pad = n_super * g - n_chunks
    if pad:
        empty = jnp.concatenate([
            jnp.full((pad, 3), jnp.inf, jnp.float32),
            jnp.full((pad, 3), -jnp.inf, jnp.float32),
            jnp.zeros((pad, 2), jnp.float32)], axis=1)
        chunk_bounds = jnp.concatenate([chunk_bounds, empty], axis=0)
    grp = chunk_bounds.reshape(n_super, g, 8)
    return jnp.concatenate([
        jnp.min(grp[:, :, 0:3], axis=1),
        jnp.max(grp[:, :, 3:6], axis=1),
        jnp.zeros((n_super, 2), jnp.float32)], axis=1)


def _tile_chunk_order(phi, tmaxv, chunk_bounds, n_tiles, tile_n):
    """Per-ray-tile near-to-far (super)chunk visitation schedule
    (XLA side).

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
    superset yields the same hit set and best-t (min over a superset of
    chunks); on EXACT t ties between triangles in different chunks the
    winning index follows visitation order, which is per-tile here
    rather than the XLA path's chunk-index order.
    """
    def batch(bounds_b):
        """Slab-test all lanes against a BATCH of chunk AABBs at once:
        bounds_b (B, 8) -> per-tile nearest entry (B, n_tiles). Batching
        (vs the old per-chunk lax.map) turns K sequential fused passes
        over the pool into ceil(K/B) — the sequential-map form cost
        ~0.7 ms/iter (13% of the loop) on SpectrumSphere."""
        tmin = jnp.zeros((bounds_b.shape[0],) + phi.shape[1:], jnp.float32)
        tmx = jnp.broadcast_to(tmaxv, tmin.shape)
        for k in range(3):
            # Axis-parallel rays (d[k] == 0) whose origin sits exactly on
            # a bound plane produce 0 * inf = NaN, which would poison the
            # comparison into "unreachable" and (unlike the g == 1 case,
            # where scheduler and kernel test the same box) silently drop
            # a member chunk the kernel WOULD visit. Treat d[k] == 0 as
            # always-pass on this axis: a superset, so scheduling stays
            # a pure optimization.
            par = (phi[k] == 0.0)[None]
            inv = 1.0 / jnp.where(par, 1.0, phi[k][None])
            t0 = (bounds_b[:, k, None] - phi[3 + k][None]) * inv
            t1 = (bounds_b[:, 3 + k, None] - phi[3 + k][None]) * inv
            tmin = jnp.maximum(tmin, jnp.where(par, 0.0,
                                               jnp.minimum(t0, t1)))
            tmx = jnp.minimum(tmx, jnp.where(par, tmaxv,
                                             jnp.maximum(t0, t1)
                                             * (1.0 + shapes.AABB_EPS)))
        # fully-padded chunks carry an inverted +inf/-inf box, which the
        # slab test does NOT reject (per-axis lo=-inf, hi=+inf) — key
        # them out explicitly so they never enter any tile's schedule
        empty = (bounds_b[:, 0] > bounds_b[:, 3])[:, None]
        entry = jnp.where((tmx > tmin) & ~empty, tmin, jnp.inf)
        return jnp.min(entry.reshape(bounds_b.shape[0], n_tiles, tile_n),
                       axis=2)

    k_chunks = chunk_bounds.shape[0]
    b = min(k_chunks, 8)  # bound the (B, N) temp footprint
    n_groups = -(-k_chunks // b)
    pad = n_groups * b - k_chunks
    if pad:
        # padded entries carry the empty inverted box -> +inf entry
        empty_box = jnp.concatenate([
            jnp.full((pad, 3), jnp.inf, jnp.float32),
            jnp.full((pad, 3), -jnp.inf, jnp.float32),
            jnp.zeros((pad, 2), jnp.float32)], axis=1)
        chunk_bounds = jnp.concatenate([chunk_bounds, empty_box], axis=0)
    grouped = chunk_bounds.reshape(n_groups, b, 8)
    if n_groups == 1:
        keys = batch(grouped[0])
    else:
        keys = jax.lax.map(batch, grouped).reshape(n_groups * b, -1)
    keys = keys[:k_chunks].T                         # (n_tiles, K)
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
        # d[k] == 0 with origin exactly on a bound plane gives 0*inf=NaN,
        # which would cull a chunk the XLA oracle (no AABB cull) hits —
        # same always-pass handling as _tile_chunk_order so the cull
        # stays a strict superset of the exact test.
        par = dk == 0.0
        inv = 1.0 / jnp.where(par, 1.0, dk)
        t0 = (bounds_ref[ci, k] - ok_) * inv
        t1 = (bounds_ref[ci, 3 + k] - ok_) * inv
        lo = jnp.where(par, 0.0, jnp.minimum(t0, t1))
        hi = jnp.where(par, upper,
                       jnp.maximum(t0, t1) * (1.0 + shapes.AABB_EPS))
        tmin = jnp.maximum(tmin, lo)
        tmax_ = jnp.minimum(tmax_, hi)
    return tmax_ > tmin


def _closest_kernel(g: int, n_chunks: int, chunk_t: int, lane_major: bool,
                    splits: int,
                    phi_ref, coeffs_ref, tmax_ref, bounds_ref, sbounds_ref,
                    order_ref, count_ref, best_t_ref, best_i_ref):
    """Grid is (ray tiles,) only: the chunk loop runs in-kernel following
    this tile's near-to-far schedule (order/count from _tile_chunk_order,
    superchunk granularity g) so unreachable superchunks are never
    visited and far chunks die on the best-t slab cull.

    At g > 1 the walk is TWO-LEVEL: each scheduled superchunk's union
    AABB (sbounds) is slab-tested at the CURRENT tightened bound
    (min(tmax, best_t) — tighter than the schedule-time bound, which
    couldn't know best_t) before its g member culls run, so a superchunk
    the near chunks have since occluded costs one slab test instead of
    g. Sound for the same reason the member cull is: the union box test
    is a superset of every member test."""
    phi = phi_ref[:]
    phi_cat = _pack_phi(phi, splits)
    tmax = tmax_ref[0, :]
    best_t_ref[:] = jnp.full(best_t_ref.shape, jnp.inf, jnp.float32)
    best_i_ref[:] = jnp.zeros(best_i_ref.shape, jnp.int32)

    ti = pl.program_id(0)

    def visit(ci, in_range):
        ci = jnp.minimum(ci, n_chunks - 1)
        upper = jnp.minimum(tmax, best_t_ref[0, :])
        may_hit = _chunk_cull(phi, bounds_ref, ci, upper)

        @pl.when(in_range & jnp.any(may_hit))
        def _():
            if lane_major:
                coeffs = coeffs_ref[:, pl.ds(ci * 4 * chunk_t, 4 * chunk_t)]
            else:
                coeffs = coeffs_ref[pl.ds(ci * 4 * chunk_t, 4 * chunk_t), :]
            valid, t = _scores(coeffs, phi_cat, tmax, lane_major)
            loc_t = jnp.min(t, axis=0)
            loc_i = jnp.argmin(t, axis=0).astype(jnp.int32) + ci * chunk_t
            better = loc_t < best_t_ref[0, :]
            best_t_ref[0, :] = jnp.where(better, loc_t, best_t_ref[0, :])
            best_i_ref[0, :] = jnp.where(better, loc_i, best_i_ref[0, :])

    if g == 1:
        def body(rr, _):
            ci = order_ref[ti, rr]
            visit(ci, ci < n_chunks)
            return 0

        jax.lax.fori_loop(0, count_ref[ti], body, 0)
    else:
        def super_body(r, _):
            si = order_ref[ti, r]
            upper = jnp.minimum(tmax, best_t_ref[0, :])

            @pl.when(jnp.any(_chunk_cull(phi, sbounds_ref, si, upper)))
            def _():
                def member(j, _):
                    ci = si * g + j
                    visit(ci, ci < n_chunks)
                    return 0

                jax.lax.fori_loop(0, g, member, 0)

            return 0

        jax.lax.fori_loop(0, count_ref[ti], super_body, 0)


def _any_kernel(g: int, n_chunks: int, chunk_t: int, lane_major: bool,
                splits: int,
                phi_ref, coeffs_ref, tmax_ref, bounds_ref, sbounds_ref,
                order_ref, count_ref, hit_ref):
    phi = phi_ref[:]
    phi_cat = _pack_phi(phi, splits)
    tmax = tmax_ref[0, :]
    # int32 carrier: a (1, N) bool output would need i8 (32,128) tiling
    hit_ref[:] = jnp.zeros(hit_ref.shape, jnp.int32)

    ti = pl.program_id(0)

    def visit(ci, in_range):
        ci = jnp.minimum(ci, n_chunks - 1)
        may_hit = _chunk_cull(phi, bounds_ref, ci, tmax) & (hit_ref[0, :] == 0)

        @pl.when(in_range & jnp.any(may_hit))
        def _():
            if lane_major:
                coeffs = coeffs_ref[:, pl.ds(ci * 4 * chunk_t, 4 * chunk_t)]
            else:
                coeffs = coeffs_ref[pl.ds(ci * 4 * chunk_t, 4 * chunk_t), :]
            valid = _scores_any(coeffs, phi_cat, tmax, lane_major)
            hit_ref[0, :] = (hit_ref[0, :]
                             | jnp.any(valid, axis=0).astype(jnp.int32))

    if g == 1:
        def body(rr, _):
            ci = order_ref[ti, rr]
            visit(ci, ci < n_chunks)
            return 0

        jax.lax.fori_loop(0, count_ref[ti], body, 0)
    else:
        def super_body(r, _):
            si = order_ref[ti, r]
            alive = (_chunk_cull(phi, sbounds_ref, si, tmax)
                     & (hit_ref[0, :] == 0))

            @pl.when(jnp.any(alive))
            def _():
                def member(j, _):
                    ci = si * g + j
                    visit(ci, ci < n_chunks)
                    return 0

                jax.lax.fori_loop(0, g, member, 0)

            return 0

        jax.lax.fori_loop(0, count_ref[ti], super_body, 0)


# Above this many padded triangles the packed coefficients switch to the
# lane-major layout: the sublane-major form's 48->128 lane padding costs
# 2.7x VMEM (968 bytes/tri) and would overflow the scoped-vmem budget on
# big scenes, while lane-major is exact (384 bytes/tri) at a modest
# MXU-feed cost (only paid where it's the only option).
LANE_MAJOR_MIN_TRIS = 32768


def _use_lane_major(t_pad: int) -> bool:
    import os
    mode = os.environ.get("TRACER_COEFF_LAYOUT", "").lower()
    if mode == "lane":
        return True
    if mode == "sublane":
        return False
    return t_pad > LANE_MAJOR_MIN_TRIS


# Above this many bytes of packed coefficients the kernels switch to
# STREAMING: coefficients stay HBM-resident (memory_space=ANY) and each
# tile DMAs its scheduled chunks through a 2-slot VMEM scratch,
# double-buffered so the copy of chunk r+1 overlaps the matmul of
# chunk r. The prefetch-time cull also gates the DMA: upper bounds only
# shrink (best-t monotone, tmax fixed), so a chunk culled at prefetch
# time would also be culled at visit time — skipping its copy is sound.
# TRACER_STREAM_COEFFS=1 forces streaming (tests); =0 forbids it.
_STREAM_BYTES = 48 * 1024 * 1024


def _use_streaming(coeff_bytes: int) -> bool:
    import os
    mode = os.environ.get("TRACER_STREAM_COEFFS", "")
    if mode == "1":
        return True
    if mode == "0":
        return False
    return coeff_bytes > _STREAM_BYTES


def _closest_kernel_streamed(g: int, n_chunks: int, chunk_t: int,
                             splits: int,
                             phi_ref, coeffs_hbm, tmax_ref, bounds_ref,
                             sbounds_ref, order_ref, count_ref,
                             best_t_ref, best_i_ref):
    """Streaming variant of _closest_kernel: lane-major coefficients in
    HBM, chunks DMA'd through a double-buffered VMEM scratch along this
    tile's schedule.

    Two-level at g > 1 (see _closest_kernel): each scheduled
    superchunk's union AABB gates its whole member pipeline, so a
    superchunk occluded since schedule time costs one slab test — no
    member culls, no DMAs. The member DMA pipeline restarts per live
    superchunk (one DMA-latency bubble each; members within a
    superchunk still double-buffer)."""
    phi = phi_ref[:]
    phi_cat = _pack_phi(phi, splits)
    tmax = tmax_ref[0, :]
    best_t_ref[:] = jnp.full(best_t_ref.shape, jnp.inf, jnp.float32)
    best_i_ref[:] = jnp.zeros(best_i_ref.shape, jnp.int32)

    ti = pl.program_id(0)
    rows = 4 * chunk_t

    def body(scratch, sems):
        def dma(ci, slot):
            ci = jnp.minimum(ci, n_chunks - 1)
            return pltpu.make_async_copy(
                coeffs_hbm.at[:, pl.ds(ci * rows, rows)],
                scratch.at[slot], sems.at[slot])

        def may(ci, upper):
            ok = ci < n_chunks
            ci = jnp.minimum(ci, n_chunks - 1)
            return ok & jnp.any(_chunk_cull(phi, bounds_ref, ci, upper))

        def compute(ci, slot):
            coeffs = scratch[slot]
            valid, t = _scores(coeffs, phi_cat, tmax, True)
            loc_t = jnp.min(t, axis=0)
            loc_i = (jnp.argmin(t, axis=0).astype(jnp.int32)
                     + ci * chunk_t)
            better = loc_t < best_t_ref[0, :]
            best_t_ref[0, :] = jnp.where(better, loc_t, best_t_ref[0, :])
            best_i_ref[0, :] = jnp.where(better, loc_i, best_i_ref[0, :])

        if g == 1:
            total = count_ref[ti]

            def chunk_id(rr):
                return order_ref[ti, rr]

            m0 = (total > 0) & may(chunk_id(0), tmax)

            @pl.when(m0)
            def _():
                dma(chunk_id(0), 0).start()

            def loop(rr, started):
                upper = jnp.minimum(tmax, best_t_ref[0, :])
                m_next = (rr + 1 < total) & may(chunk_id(rr + 1), upper)

                @pl.when(m_next)
                def _():
                    dma(chunk_id(rr + 1), (rr + 1) % 2).start()

                @pl.when(started)
                def _():
                    dma(chunk_id(rr), rr % 2).wait()
                    compute(chunk_id(rr), rr % 2)

                return m_next

            jax.lax.fori_loop(0, total, loop, m0)
        else:
            def super_body(r, _):
                si = order_ref[ti, r]
                upper0 = jnp.minimum(tmax, best_t_ref[0, :])

                @pl.when(jnp.any(_chunk_cull(phi, sbounds_ref, si, upper0)))
                def _():
                    base = si * g
                    m0 = may(base, jnp.minimum(tmax, best_t_ref[0, :]))

                    @pl.when(m0)
                    def _():
                        dma(base, 0).start()

                    def member(j, started):
                        upper = jnp.minimum(tmax, best_t_ref[0, :])
                        m_next = (j + 1 < g) & may(base + j + 1, upper)

                        @pl.when(m_next)
                        def _():
                            dma(base + j + 1, (j + 1) % 2).start()

                        @pl.when(started)
                        def _():
                            dma(base + j, j % 2).wait()
                            compute(base + j, j % 2)

                        return m_next

                    jax.lax.fori_loop(0, g, member, m0)

                return 0

            jax.lax.fori_loop(0, count_ref[ti], super_body, 0)

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((2, 16 * len(_PACK_LEFT[splits]), rows),
                                     jnp.bfloat16),
                  sems=pltpu.SemaphoreType.DMA((2,)))


def _any_kernel_streamed(g: int, n_chunks: int, chunk_t: int,
                         splits: int,
                         phi_ref, coeffs_hbm, tmax_ref, bounds_ref,
                         sbounds_ref, order_ref, count_ref, hit_ref):
    phi = phi_ref[:]
    phi_cat = _pack_phi(phi, splits)
    tmax = tmax_ref[0, :]
    # int32 carrier: a (1, N) bool output would need i8 (32,128) tiling
    hit_ref[:] = jnp.zeros(hit_ref.shape, jnp.int32)

    ti = pl.program_id(0)
    rows = 4 * chunk_t

    def body(scratch, sems):
        def dma(ci, slot):
            ci = jnp.minimum(ci, n_chunks - 1)
            return pltpu.make_async_copy(
                coeffs_hbm.at[:, pl.ds(ci * rows, rows)],
                scratch.at[slot], sems.at[slot])

        def may(ci):
            ok = ci < n_chunks
            ci = jnp.minimum(ci, n_chunks - 1)
            return ok & jnp.any(_chunk_cull(phi, bounds_ref, ci, tmax)
                                & (hit_ref[0, :] == 0))

        def compute(slot):
            valid = _scores_any(scratch[slot], phi_cat, tmax, True)
            hit_ref[0, :] = (hit_ref[0, :]
                             | jnp.any(valid, axis=0).astype(jnp.int32))

        if g == 1:
            total = count_ref[ti]

            def chunk_id(rr):
                return order_ref[ti, rr]

            m0 = (total > 0) & may(chunk_id(0))

            @pl.when(m0)
            def _():
                dma(chunk_id(0), 0).start()

            def loop(rr, started):
                m_next = (rr + 1 < total) & may(chunk_id(rr + 1))

                @pl.when(m_next)
                def _():
                    dma(chunk_id(rr + 1), (rr + 1) % 2).start()

                @pl.when(started)
                def _():
                    dma(chunk_id(rr), rr % 2).wait()
                    compute(rr % 2)

                return m_next

            jax.lax.fori_loop(0, total, loop, m0)
        else:
            def super_body(r, _):
                si = order_ref[ti, r]
                alive = (_chunk_cull(phi, sbounds_ref, si, tmax)
                         & (hit_ref[0, :] == 0))

                @pl.when(jnp.any(alive))
                def _():
                    base = si * g
                    m0 = may(base)

                    @pl.when(m0)
                    def _():
                        dma(base, 0).start()

                    def member(j, started):
                        m_next = (j + 1 < g) & may(base + j + 1)

                        @pl.when(m_next)
                        def _():
                            dma(base + j + 1, (j + 1) % 2).start()

                        @pl.when(started)
                        def _():
                            dma(base + j, j % 2).wait()
                            compute(j % 2)

                        return m_next

                    jax.lax.fori_loop(0, g, member, m0)

                return 0

            jax.lax.fori_loop(0, count_ref[ti], super_body, 0)

    pl.run_scoped(body,
                  scratch=pltpu.VMEM((2, 16 * len(_PACK_LEFT[splits]), rows),
                                     jnp.bfloat16),
                  sems=pltpu.SemaphoreType.DMA((2,)))


def _pad_inputs(coeffs, phi_t, tmax, n, n_chunks, lane_major: bool,
                tile_n: int, splits: int):
    """Pad rays to TILE_N multiple and the feature axis 10 -> 16
    (sublane alignment for the MXU operand), then pre-pack the triangle
    coefficients as the K-packed bf16 left operand (see _PACK_LEFT;
    K=48 x3 or K=96 x6) — sublane-major (rows, K) for stock scenes,
    lane-major (K, rows) for big ones. Chunking matches the build-time
    chunk_bounds granularity."""
    t_pad = coeffs.shape[1]
    assert t_pad % n_chunks == 0, (t_pad, n_chunks)
    chunk_t = t_pad // n_chunks
    n_pad = -(-n // tile_n) * tile_n
    coeffs = jnp.pad(coeffs, ((0, 0), (0, 0), (0, 6)))
    coeffs = coeffs.reshape(4, n_chunks, chunk_t, 16)
    order = _PACK_LEFT[splits]
    if lane_major:
        coeffs = coeffs.transpose(3, 1, 0, 2).reshape(
            16, n_chunks * 4 * chunk_t)
        w = _split_words(coeffs, splits)
        coeffs = jnp.concatenate([w[i] for i in order], axis=0)   # (K, rows)
    else:
        coeffs = coeffs.transpose(1, 0, 2, 3).reshape(
            n_chunks * 4 * chunk_t, 16)
        w = _split_words(coeffs, splits)
        coeffs = jnp.concatenate([w[i] for i in order], axis=-1)  # (rows, K)
    phi = jnp.pad(phi_t, ((0, 6), (0, n_pad - n)))
    # per-lane scalars travel as (1, N) rank-2: a rank-1 f32 operand pins
    # XLA's 1-D T(1024) layout, which Mosaic can only match with >=1024
    # lane blocks — rank-2 gets the (8,128) tiling and any 128-multiple
    # tile (TRACER_TILE_N_ANY=256 crashed the compile before this)
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    tmax = jnp.pad(tmax, (0, n_pad - n))[None, :]
    return coeffs, phi, tmax, n_pad, chunk_t


def closest_hit_pallas(coeffs, phi_t, tmax, chunk_bounds, *,
                       interpret: bool = False):
    """coeffs (4, T_pad, 10) + chunk_bounds (T_pad/128, 8) from
    intersect.build_dense, phi_t (10, N), tmax scalar or (N,).
    Returns (best_t (N,), best_i (N,)) with best_i in storage order."""
    import functools
    n = phi_t.shape[1]
    n_chunks = chunk_bounds.shape[0]
    splits = _mxu_splits(coeffs.shape[1])
    k_pack = 16 * len(_PACK_LEFT[splits])
    streaming = _use_streaming(4 * coeffs.shape[1] * k_pack * 2)
    lane_major = streaming or _use_lane_major(coeffs.shape[1])
    tile_n = _tile_n()
    coeffs2, phi, tmaxv, n_pad, chunk_t = _pad_inputs(
        coeffs, phi_t, tmax, n, n_chunks, lane_major, tile_n, splits)
    n_tiles = n_pad // tile_n
    g = -(-n_chunks // MAX_SCHED)
    sbounds = chunk_bounds if g == 1 else _superchunk_bounds(chunk_bounds, g)
    order, count = _tile_chunk_order(phi, tmaxv, sbounds, n_tiles, tile_n)
    grid = (n_tiles,)
    if streaming:
        kernel = functools.partial(
            _closest_kernel_streamed, g, n_chunks, chunk_t, splits)
        coeff_spec = pl.BlockSpec(memory_space=pl.ANY)  # HBM-resident
        # per-chunk bounds outgrow the 1MB SMEM at ~2000 chunks (SMEM
        # pads each element heavily); VMEM holds them comfortably
        bounds_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(
            _closest_kernel, g, n_chunks, chunk_t, lane_major, splits)
        coeff_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        bounds_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    best_t, best_i = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, tile_n), lambda ri: (0, ri)),
            coeff_spec,                             # all chunk coeffs
            pl.BlockSpec((1, tile_n), lambda ri: (0, ri)),
            bounds_spec,                            # per-chunk AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # superchunk AABBs (<=64)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # order (n_tiles, K)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count (n_tiles,)
        ],
        out_specs=[
            pl.BlockSpec((1, tile_n), lambda ri: (0, ri)),
            pl.BlockSpec((1, tile_n), lambda ri: (0, ri)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        # at g == 1 the kernel's flat walk never reads sbounds_ref, so
        # ship a 1-entry stub instead of a full duplicate of chunk_bounds
    )(phi, coeffs2, tmaxv, chunk_bounds,
      sbounds[:1] if g == 1 else sbounds, order, count)
    return best_t[0, :n], best_i[0, :n]


def any_hit_pallas(coeffs, phi_t, tmax, chunk_bounds, *,
                   interpret: bool = False):
    """Shadow-query variant. Returns hit (N,) bool."""
    import functools
    n = phi_t.shape[1]
    n_chunks = chunk_bounds.shape[0]
    splits = _mxu_splits(coeffs.shape[1])
    k_pack = 16 * len(_PACK_LEFT[splits])
    streaming = _use_streaming(4 * coeffs.shape[1] * k_pack * 2)
    lane_major = streaming or _use_lane_major(coeffs.shape[1])
    tile_n = _tile_n_any()
    coeffs2, phi, tmaxv, n_pad, chunk_t = _pad_inputs(
        coeffs, phi_t, tmax, n, n_chunks, lane_major, tile_n, splits)
    n_tiles = n_pad // tile_n
    g = -(-n_chunks // MAX_SCHED)
    sbounds = chunk_bounds if g == 1 else _superchunk_bounds(chunk_bounds, g)
    order, count = _tile_chunk_order(phi, tmaxv, sbounds, n_tiles, tile_n)
    grid = (n_tiles,)
    if streaming:
        kernel = functools.partial(
            _any_kernel_streamed, g, n_chunks, chunk_t, splits)
        coeff_spec = pl.BlockSpec(memory_space=pl.ANY)  # HBM-resident
        bounds_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    else:
        kernel = functools.partial(
            _any_kernel, g, n_chunks, chunk_t, lane_major, splits)
        coeff_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
        bounds_spec = pl.BlockSpec(memory_space=pltpu.SMEM)
    hit = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, tile_n), lambda ri: (0, ri)),
            coeff_spec,                             # all chunk coeffs
            pl.BlockSpec((1, tile_n), lambda ri: (0, ri)),
            bounds_spec,                            # per-chunk AABBs
            pl.BlockSpec(memory_space=pltpu.SMEM),  # superchunk AABBs (<=64)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # order (n_tiles, K)
            pl.BlockSpec(memory_space=pltpu.SMEM),  # count (n_tiles,)
        ],
        out_specs=pl.BlockSpec((1, tile_n), lambda ri: (0, ri)),
        out_shape=jax.ShapeDtypeStruct((1, n_pad), jnp.int32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
            vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
        # g == 1: 1-entry stub, see closest_hit_pallas
    )(phi, coeffs2, tmaxv, chunk_bounds,
      sbounds[:1] if g == 1 else sbounds, order, count)
    return hit[0, :n] != 0
