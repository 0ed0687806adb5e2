"""Pallas fused intersector vs the XLA formulation (interpret mode on CPU)."""

import pytest
import numpy as np
import jax.numpy as jnp

from tracer_tpu.ops import intersect, linalg as la
from tracer_tpu.ops.pallas import intersect_kernel as pk


@pytest.mark.smoke
def test_pallas_matches_xla(rng_np, monkeypatch):
    # exact divide: this test pins the bf16x3 packing + epilogue math;
    # the approx-reciprocal default is covered by its own band test
    # (test_approx_recip_error_band) with the measured 2^-8 bound
    monkeypatch.setenv("TRACER_APPROX_RECIP", "0")
    tris = jnp.asarray(rng_np.uniform(-2, 2, (300, 3, 3)).astype(np.float32))
    dense = intersect.build_dense(tris)
    n = 257
    o = jnp.asarray(rng_np.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ov, dv = la.v3_from_array(o), la.v3_from_array(d)
    phi = intersect.ray_features_t(ov, dv)

    bt, bi = pk.closest_hit_pallas(dense.coeffs, phi, 1e30, dense.chunk_bounds, interpret=True)
    ok_x, t_x, i_x, _, _, _ = intersect.closest_hit(dense, 1e30, ov, dv)
    okp = np.isfinite(np.asarray(bt))
    np.testing.assert_array_equal(okp, np.asarray(ok_x))
    hit = okp
    np.testing.assert_allclose(np.asarray(bt)[hit], np.asarray(t_x)[hit],
                               rtol=1e-3, atol=1e-4)
    agree = np.asarray(bi)[hit] == np.asarray(i_x)[hit]
    assert agree.mean() > 0.99  # ties only

    hp = pk.any_hit_pallas(dense.coeffs, phi, 4.0, dense.chunk_bounds, interpret=True)
    hx = intersect.any_hit(dense, 4.0, ov, dv)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hx))


def test_pallas_superchunk_schedule(rng_np, monkeypatch):
    """g > 1 (superchunk-granular scheduling, the big-scene path) yields
    identical results to g = 1: force it by shrinking MAX_SCHED so a
    small scene spans several superchunks, including a padded one."""
    monkeypatch.setattr(pk, "MAX_SCHED", 3)  # 5 chunks -> g=2, n_super=3
    monkeypatch.setenv("TRACER_CHUNK_T", "256")  # counts below assume 256
    tris = jnp.asarray(rng_np.uniform(-2, 2, (1100, 3, 3)).astype(np.float32))
    dense = intersect.build_dense(tris)
    assert dense.chunk_bounds.shape[0] == 5  # padded to 1280 @ chunk 256
    n = 300
    o = jnp.asarray(rng_np.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ov, dv = la.v3_from_array(o), la.v3_from_array(d)
    phi = intersect.ray_features_t(ov, dv)

    bt, bi = pk.closest_hit_pallas(dense.coeffs, phi, 1e30,
                                   dense.chunk_bounds, interpret=True)
    hp = pk.any_hit_pallas(dense.coeffs, phi, 4.0, dense.chunk_bounds,
                           interpret=True)
    monkeypatch.setattr(pk, "MAX_SCHED", 64)
    bt1, bi1 = pk.closest_hit_pallas(dense.coeffs, phi, 1e30,
                                     dense.chunk_bounds, interpret=True)
    hp1 = pk.any_hit_pallas(dense.coeffs, phi, 4.0, dense.chunk_bounds,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(bt), np.asarray(bt1))
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi1))
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hp1))


def test_schedule_axis_parallel_ray_on_bound_plane():
    """An axis-parallel ray (d[k] == 0) whose origin sits exactly on a
    chunk bound plane hits 0 * inf = NaN in the slab test; the
    scheduler must treat that axis as pass (superset) rather than let
    the NaN exclude a reachable chunk (light leak at g > 1)."""
    import jax.numpy as jnp
    # one chunk spanning x in [0, 1]: ray along -z with origin x == 0
    bounds = jnp.asarray([[0.0, -1.0, -5.0, 1.0, 1.0, 5.0, 0.0, 0.0]])
    o = jnp.asarray([[0.0], [0.0], [4.0]], jnp.float32)
    d = jnp.asarray([[0.0], [0.0], [-1.0]], jnp.float32)
    phi = intersect.ray_features_t(o, d)
    phi = jnp.pad(phi, ((0, 6), (0, pk.TILE_N - 1)))
    tmaxv = jnp.full((pk.TILE_N,), 1e30, jnp.float32)
    order, count = pk._tile_chunk_order(phi, tmaxv, bounds, 1, pk.TILE_N)
    assert int(count[0]) == 1  # NaN would have dropped it


def test_anyhit_tile_override_matches(rng_np, monkeypatch):
    """TRACER_TILE_N_ANY (anyhit-only tile width) changes only the grid
    partition — hits must be identical to the default tiling."""
    tris = jnp.asarray(rng_np.uniform(-2, 2, (300, 3, 3)).astype(np.float32))
    dense = intersect.build_dense(tris)
    n = 700
    o = jnp.asarray(rng_np.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ov, dv = la.v3_from_array(o), la.v3_from_array(d)
    phi = intersect.ray_features_t(ov, dv)
    # per-lane tmax with a masked (tmax 0) majority, like NEE shadow rays
    tmaxes = jnp.where(jnp.arange(n) % 4 == 0, 4.0, 0.0)

    hp = pk.any_hit_pallas(dense.coeffs, phi, tmaxes, dense.chunk_bounds,
                           interpret=True)
    monkeypatch.setenv("TRACER_TILE_N_ANY", "256")
    hp1 = pk.any_hit_pallas(dense.coeffs, phi, tmaxes, dense.chunk_bounds,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hp1))
    assert not np.asarray(hp)[1::4].any()  # masked lanes never hit


def test_member_chunk_cull_axis_parallel_on_plane():
    """Same NaN hazard as the scheduler test, one level down: the
    in-kernel member-chunk slab test (_chunk_cull) must treat
    d[k] == 0 with origin exactly on a bound plane as pass, so the
    kernel's cull stays a strict superset of the exact test (the XLA
    oracle has no AABB cull at all)."""
    bounds = jnp.asarray([[0.0, -1.0, -5.0, 1.0, 1.0, 5.0, 0.0, 0.0]])
    o = jnp.asarray([[0.0], [0.0], [4.0]], jnp.float32)
    d = jnp.asarray([[0.0], [0.0], [-1.0]], jnp.float32)
    phi = intersect.ray_features_t(o, d)
    phi = jnp.pad(phi, ((0, 6), (0, pk.TILE_N - 1)))
    upper = jnp.full((pk.TILE_N,), 1e30, jnp.float32)
    may = pk._chunk_cull(phi, bounds, 0, upper)
    assert bool(may[0])  # 0 * inf = NaN would have culled the lane


def test_pallas_lane_major_layout(rng_np, monkeypatch):
    """The big-scene lane-major (48, rows) coefficient layout (forced
    via TRACER_COEFF_LAYOUT) matches the default sublane-major one."""
    tris = jnp.asarray(rng_np.uniform(-2, 2, (300, 3, 3)).astype(np.float32))
    dense = intersect.build_dense(tris)
    n = 200
    o = jnp.asarray(rng_np.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ov, dv = la.v3_from_array(o), la.v3_from_array(d)
    phi = intersect.ray_features_t(ov, dv)

    monkeypatch.setenv("TRACER_COEFF_LAYOUT", "lane")
    bt, bi = pk.closest_hit_pallas(dense.coeffs, phi, 1e30,
                                   dense.chunk_bounds, interpret=True)
    hp = pk.any_hit_pallas(dense.coeffs, phi, 4.0, dense.chunk_bounds,
                           interpret=True)
    monkeypatch.setenv("TRACER_COEFF_LAYOUT", "sublane")
    bt1, bi1 = pk.closest_hit_pallas(dense.coeffs, phi, 1e30,
                                     dense.chunk_bounds, interpret=True)
    hp1 = pk.any_hit_pallas(dense.coeffs, phi, 4.0, dense.chunk_bounds,
                            interpret=True)
    # layouts reassociate the K=48 contraction (~1e-6 relative), so
    # hits/any within that band of a boundary may flip: agreement rate,
    # not exact equality
    hit = np.isfinite(np.asarray(bt))
    hit1 = np.isfinite(np.asarray(bt1))
    assert (hit == hit1).mean() > 0.99
    both = hit & hit1
    np.testing.assert_allclose(np.asarray(bt)[both], np.asarray(bt1)[both],
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(bi)[both] == np.asarray(bi1)[both]).mean() > 0.99
    assert (np.asarray(hp) == np.asarray(hp1)).mean() > 0.99


def test_pallas_streaming_matches_resident(rng_np, monkeypatch):
    """The HBM-streaming double-buffered-DMA kernels (forced via
    TRACER_STREAM_COEFFS=1) match the VMEM-resident lane-major path
    exactly (same layout, same arithmetic — only the data movement
    differs)."""
    monkeypatch.setattr(pk, "MAX_SCHED", 3)  # exercise g > 1 too
    tris = jnp.asarray(rng_np.uniform(-2, 2, (1100, 3, 3)).astype(np.float32))
    dense = intersect.build_dense(tris)
    n = 300
    o = jnp.asarray(rng_np.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ov, dv = la.v3_from_array(o), la.v3_from_array(d)
    phi = intersect.ray_features_t(ov, dv)

    monkeypatch.setenv("TRACER_STREAM_COEFFS", "1")
    bt, bi = pk.closest_hit_pallas(dense.coeffs, phi, 1e30,
                                   dense.chunk_bounds, interpret=True)
    hp = pk.any_hit_pallas(dense.coeffs, phi, 4.0, dense.chunk_bounds,
                           interpret=True)
    monkeypatch.setenv("TRACER_STREAM_COEFFS", "0")
    monkeypatch.setenv("TRACER_COEFF_LAYOUT", "lane")
    bt1, bi1 = pk.closest_hit_pallas(dense.coeffs, phi, 1e30,
                                     dense.chunk_bounds, interpret=True)
    hp1 = pk.any_hit_pallas(dense.coeffs, phi, 4.0, dense.chunk_bounds,
                            interpret=True)
    np.testing.assert_array_equal(np.asarray(bt), np.asarray(bt1))
    np.testing.assert_array_equal(np.asarray(bi), np.asarray(bi1))
    np.testing.assert_array_equal(np.asarray(hp), np.asarray(hp1))


def test_pallas_per_ray_tmax(rng_np):
    tris = jnp.asarray(rng_np.uniform(-2, 2, (64, 3, 3)).astype(np.float32))
    dense = intersect.build_dense(tris)
    n = 65
    o = jnp.asarray(rng_np.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ov, dv = la.v3_from_array(o), la.v3_from_array(d)
    phi = intersect.ray_features_t(ov, dv)
    bt, _ = pk.closest_hit_pallas(dense.coeffs, phi, 1e30, dense.chunk_bounds, interpret=True)
    tmaxes = jnp.where(jnp.isfinite(bt), bt * 0.5, 1.0)
    bt2, _ = pk.closest_hit_pallas(dense.coeffs, phi, tmaxes, dense.chunk_bounds, interpret=True)
    assert not np.any(np.isfinite(np.asarray(bt2)) & np.isfinite(np.asarray(bt)))


def test_split_bf16_3_is_f32_exact(rng_np):
    """hi+mid+lo reproduces f32 to the last bit (lo absorbs <= 1 ulp of
    bf16 rounding) across magnitudes."""
    x = jnp.asarray((rng_np.standard_normal(4096)
                     * 10.0 ** rng_np.uniform(-6, 6, 4096)).astype(np.float32))
    h, m, l = pk._split_bf16_3(x)
    rec = (h.astype(np.float32) + m.astype(np.float32)
           + l.astype(np.float32))
    np.testing.assert_allclose(np.asarray(rec), np.asarray(x),
                               rtol=2 ** -31, atol=0)


def test_x6_packing_matches_f32_matmul(rng_np):
    """The K=96 x6-packed product reproduces the exact f32 dot product
    to ~2^-22 relative, vs ~2^-14 for x3 (catastrophic-cancellation
    guard for big-scene barycentric scores)."""
    a = jnp.asarray(rng_np.uniform(-3, 3, (64, 16)).astype(np.float32))
    b = jnp.asarray(rng_np.uniform(-3, 3, (16, 128)).astype(np.float32))
    exact = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    scale = (np.abs(np.asarray(a, np.float64)) @
             np.abs(np.asarray(b, np.float64)))  # term-magnitude scale

    def packed(splits):
        wa = pk._split_words(a, splits)
        wb = pk._split_words(b, splits)
        pa = jnp.concatenate([wa[i] for i in pk._PACK_LEFT[splits]], axis=1)
        pb = jnp.concatenate([wb[i] for i in pk._PACK_RIGHT[splits]], axis=0)
        import jax
        return np.asarray(jax.lax.dot_general(
            pa, pb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32))

    err3 = np.abs(packed(2) - exact) / scale
    err6 = np.abs(packed(3) - exact) / scale
    assert err3.max() < 2 ** -13, err3.max()
    assert err6.max() < 2 ** -21, err6.max()
    assert err6.max() < err3.max() / 32


def test_pallas_x6_matches_x3(rng_np, monkeypatch):
    """Forced x6 packing gives the same hits as x3 on a well-conditioned
    scene, in all three layout/streaming modes."""
    # exact divide: the x6-vs-exact rtol=1e-4 leg below measures the
    # PACKING error; the approx reciprocal (default ON, ~2^-8 in
    # interpret mode) would swamp it — it has its own band test
    monkeypatch.setenv("TRACER_APPROX_RECIP", "0")
    tris = jnp.asarray(rng_np.uniform(-2, 2, (900, 3, 3)).astype(np.float32))
    dense = intersect.build_dense(tris)
    n = 300
    o = jnp.asarray(rng_np.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ov, dv = la.v3_from_array(o), la.v3_from_array(d)
    phi = intersect.ray_features_t(ov, dv)

    results = {}
    for mode, env in [("sublane", {"TRACER_COEFF_LAYOUT": "sublane"}),
                      ("lane", {"TRACER_COEFF_LAYOUT": "lane"}),
                      ("stream", {"TRACER_STREAM_COEFFS": "1"})]:
        for pack in ("x3", "x6"):
            monkeypatch.setenv("TRACER_MXU_PACK", pack)
            for k, v in env.items():
                monkeypatch.setenv(k, v)
            bt, bi = pk.closest_hit_pallas(dense.coeffs, phi, 1e30,
                                           dense.chunk_bounds, interpret=True)
            hp = pk.any_hit_pallas(dense.coeffs, phi, 4.0,
                                   dense.chunk_bounds, interpret=True)
            results[(mode, pack)] = (np.asarray(bt), np.asarray(bi),
                                     np.asarray(hp))
            for k in env:
                monkeypatch.delenv(k)
        bt3, bi3, hp3 = results[(mode, "x3")]
        bt6, bi6, hp6 = results[(mode, "x6")]
        hit3, hit6 = np.isfinite(bt3), np.isfinite(bt6)
        assert (hit3 == hit6).mean() > 0.99, mode
        both = hit3 & hit6
        assert (bi6[both] == bi3[both]).mean() > 0.99, mode
        assert (hp3 == hp6).mean() > 0.99, mode
        # the raw kernel ts differ by x3's cancellation error (up to a
        # few % relative when |terms| >> |t|); assert x6 is the more
        # accurate one against the exact per-winner re-intersection
        same = both & (bi6 == bi3)
        _, te, _, _, _ = intersect._reintersect(
            dense, jnp.asarray(bi6), ov, dv, 1e30)
        te = np.asarray(te)
        e6 = np.abs(bt6[same] - te[same])
        e3 = np.abs(bt3[same] - te[same])
        assert np.median(e6) <= np.median(e3), mode
        np.testing.assert_allclose(bt6[same], te[same],
                                   rtol=1e-4, atol=1e-5, err_msg=mode)


def test_approx_recip_error_band(rng_np, monkeypatch):
    """Default mode (approx reciprocal ON): the kernel's raw best_t
    stays within APPROX_RECIP_REL of the XLA oracle's exact-divide t,
    and hit/miss classification is unchanged. This re-pins the measured
    bound that the _reintersect tmax slack is derived from
    (intersect.closest_hit): in interpret mode jax lowers
    pl.reciprocal(approx=True) as 1/f32(bf16(a)) — the INPUT is rounded
    to bf16 (8 mantissa bits), so the error bound is 2^-8 (observed
    in-kernel max ~3.6e-3). The TPU hardware lowering is tighter; the
    shared constant is the worst of the two paths."""
    monkeypatch.setenv("TRACER_APPROX_RECIP", "1")
    tris = jnp.asarray(rng_np.uniform(-2, 2, (300, 3, 3)).astype(np.float32))
    dense = intersect.build_dense(tris)
    n = 257
    o = jnp.asarray(rng_np.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ov, dv = la.v3_from_array(o), la.v3_from_array(d)
    phi = intersect.ray_features_t(ov, dv)

    bt, bi = pk.closest_hit_pallas(dense.coeffs, phi, 1e30,
                                   dense.chunk_bounds, interpret=True)
    ok_x, t_x, i_x, _, _, _ = intersect.closest_hit(dense, 1e30, ov, dv)
    okp = np.isfinite(np.asarray(bt))
    # the approximation can shuffle near-tie winners, never hit<->miss
    np.testing.assert_array_equal(okp, np.asarray(ok_x))
    same = okp & (np.asarray(bi) == np.asarray(i_x))
    assert same[okp].mean() > 0.97  # near-tie winner swaps only
    t_ref = np.asarray(t_x)[same]
    # rtol = the approx-recip band; atol absorbs bf16x3 cancellation on
    # tiny t (terms are O(1) so ~2^-15 ABSOLUTE error can exceed t
    # itself when the origin sits on a surface — same atol as the
    # exact-divide test above)
    np.testing.assert_allclose(np.asarray(bt)[same], t_ref,
                               rtol=pk.APPROX_RECIP_REL * 1.1, atol=1e-4)
    # and the band is actually exercised (approx path really on):
    # exact-divide agreement is ~2^-15 relative, so a max relative
    # error above 2^-11 on well-scaled t proves the knob routed
    # through the approximate reciprocal
    big = same & (np.asarray(t_x) > 0.1)
    rel = np.abs(np.asarray(bt)[big] - np.asarray(t_x)[big]) / np.asarray(t_x)[big]
    assert rel.max() > 2.0 ** -11, rel.max()


def test_perm_rays_matches_unpermuted(rng_np, monkeypatch):
    """TRACER_PERM_RAYS (boundary-only coherence sort at the closest
    query) must return identical hits in the ORIGINAL lane order for
    every key mode — the sort is a pure reordering around the kernel
    (exact-t cross-chunk ties may pick a different winner id; t must
    match exactly)."""
    tris = jnp.asarray(rng_np.uniform(-2, 2, (300, 3, 3)).astype(np.float32))
    dense = intersect.build_dense(tris)
    n = 257
    o = jnp.asarray(rng_np.uniform(-3, 3, (n, 3)).astype(np.float32))
    d = jnp.asarray(rng_np.normal(size=(n, 3)).astype(np.float32))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    ov, dv = la.v3_from_array(o), la.v3_from_array(d)
    phi = intersect.ray_features_t(ov, dv)

    class _PK:  # route the kernel through interpret mode on CPU
        @staticmethod
        def closest_hit_pallas(coeffs, p, tmax, bounds):
            return pk.closest_hit_pallas(coeffs, p, tmax, bounds,
                                         interpret=True)

    bt0, bi0 = pk.closest_hit_pallas(dense.coeffs, phi, 1e30,
                                     dense.chunk_bounds, interpret=True)
    # per-lane tmax must ride the sort too
    tmaxes = jnp.where(jnp.isfinite(bt0), bt0 * 1.5, 2.0)
    btm0, _ = pk.closest_hit_pallas(dense.coeffs, phi, tmaxes,
                                    dense.chunk_bounds, interpret=True)
    for mode in ("oct", "dmorton", "odmorton"):
        monkeypatch.setenv("TRACER_PERM_RAYS", mode)
        bt, bi = intersect._permuted_closest(dense, 1e30, phi, _PK)
        np.testing.assert_array_equal(np.asarray(bt), np.asarray(bt0))
        agree = np.asarray(bi) == np.asarray(bi0)
        assert agree.mean() > 0.99, mode  # exact-t ties only
        btm, _ = intersect._permuted_closest(dense, tmaxes, phi, _PK)
        np.testing.assert_array_equal(np.asarray(btm), np.asarray(btm0))

    class _PKA:  # anyhit through interpret mode
        @staticmethod
        def any_hit_pallas(coeffs, p, tmax, bounds):
            return pk.any_hit_pallas(coeffs, p, tmax, bounds,
                                     interpret=True)

    # anyhit perm: ~half the lanes NEE-masked (tmax 0), like production
    tm_any = jnp.where(jnp.arange(n) % 2 == 0, 4.0, 0.0)
    h0 = pk.any_hit_pallas(dense.coeffs, phi, tm_any, dense.chunk_bounds,
                           interpret=True)
    for mode in ("oct", "dmorton", "odmorton"):
        monkeypatch.setenv("TRACER_PERM_ANY", mode)
        hp = intersect._permuted_any(dense, tm_any, phi, _PKA)
        np.testing.assert_array_equal(np.asarray(hp), np.asarray(h0))


def test_perm_auto_gating(monkeypatch):
    """Unset knobs resolve by chunk count (measured thresholds in
    intersect.py); '0'/'off' force off; a key name forces on."""
    monkeypatch.delenv("TRACER_PERM_RAYS", raising=False)
    monkeypatch.delenv("TRACER_PERM_ANY", raising=False)
    assert intersect._perm_mode(1) == ""
    assert intersect._perm_mode(9) == ""     # config-4 wash
    assert intersect._perm_mode(35) == "odmorton"
    assert intersect._perm_any_mode(1) == ""
    assert intersect._perm_any_mode(9) == "odmorton"  # +18% at 9 chunks
    monkeypatch.setenv("TRACER_PERM_RAYS", "off")
    monkeypatch.setenv("TRACER_PERM_ANY", "0")
    assert intersect._perm_mode(544) == ""
    assert intersect._perm_any_mode(544) == ""
    monkeypatch.setenv("TRACER_PERM_RAYS", "oct")
    assert intersect._perm_mode(1) == "oct"
