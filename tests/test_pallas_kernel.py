"""Pallas fused intersector vs the XLA formulation (interpret mode on CPU)."""

import numpy as np
import jax.numpy as jnp

from tracer_tpu.ops import intersect, linalg as la
from tracer_tpu.ops.pallas import intersect_kernel as pk


def test_pallas_matches_xla(rng_np):
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
