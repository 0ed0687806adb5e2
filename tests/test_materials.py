"""Uber-BSDF: distributions, physical identities, and preserved quirks.

Vectors use the hot-path V3 = (3, N) transposed convention."""

import pytest
import numpy as np
import jax.numpy as jnp

from tracer_tpu.ops import linalg as la
from tracer_tpu.ops import materials as M
from tracer_tpu.ops import rng as prng


def lanes(n, color=0.8, roughness=1.0, metalness=0.0, ref_ix=1.0,
          opacity=1.0):
    f = lambda v: jnp.full((n,), v, jnp.float32)
    return M.MaterialLanes(color=f(color), roughness=f(roughness),
                           metalness=f(metalness), ref_ix=f(ref_ix),
                           opacity=f(opacity))


def unit_v3(x, y, z, n):
    v = np.array([x, y, z], np.float32)
    v /= np.linalg.norm(v)
    return jnp.broadcast_to(jnp.asarray(v)[:, None], (3, n))


def test_cosine_hemisphere_distribution():
    n = 1 << 15
    st = prng.make_streams(0, 0, jnp.arange(n, dtype=jnp.uint32))
    _, wi = M.cosine_sample_hemisphere(st)
    wi = np.asarray(wi)
    assert wi.shape == (3, n)
    assert (wi[2] >= 0).all()
    assert abs(np.linalg.norm(wi, axis=0).mean() - 1.0) < 1e-3
    # cosine-weighted: E[cos theta] = 2/3
    assert abs(wi[2].mean() - 2 / 3) < 0.01


@pytest.mark.smoke
def test_reflect_is_mirror():
    w = jnp.asarray([[0.3], [0.4], [0.866]], jnp.float32)
    nrm = jnp.asarray([[0.0], [0.0], [1.0]], jnp.float32)
    r = np.asarray(M.reflect(w, nrm))[:, 0]
    assert np.allclose(r, [-0.3, -0.4, 0.866], atol=1e-6)


def test_refract_snell():
    # 45 degrees into glass (eta = 1/1.5)
    s = float(np.sin(np.pi / 4))
    wi = jnp.asarray([[s], [0.0], [s]], jnp.float32)
    nrm = jnp.asarray([[0.0], [0.0], [1.0]], jnp.float32)
    wt, tir = M.refract(wi, nrm, jnp.float32(1 / 1.5))
    wt = np.asarray(wt)[:, 0]
    assert not bool(tir[0])
    sin_t = np.hypot(wt[0], wt[1])
    assert np.isclose(sin_t, s / 1.5, atol=1e-5)
    assert wt[2] < 0  # transmitted through


def test_refract_tir():
    # shallow angle from dense to thin medium: TIR
    z = float(np.sqrt(1 - 0.95**2))
    wi = jnp.asarray([[0.95], [0.0], [z]], jnp.float32)
    nrm = jnp.asarray([[0.0], [0.0], [1.0]], jnp.float32)
    _, tir = M.refract(wi, nrm, jnp.float32(1.5))
    assert bool(tir[0])


def test_fresnel_normal_incidence():
    m = lanes(1, ref_ix=1.5)
    wo = jnp.asarray([[0.0], [0.0], [1.0]], jnp.float32)
    r = float(M.fresnel_reflectance(wo, m)[0])
    assert np.isclose(r, ((1 - 1.5) / (1 + 1.5)) ** 2, atol=1e-6)


def test_diffuse_sample_consistency():
    """For the pure-diffuse branch, sampled (bsdf, pdf) must equal the
    diffuse lobe closed forms, and bsdf*cos/pdf == color (the reference's
    unit-weight RR identity, integrator.fut:62-69)."""
    n = 1 << 14
    m = lanes(n, color=0.67, metalness=0.0, opacity=1.0, ref_ix=1.0)
    st = prng.make_streams(1, 0, jnp.arange(n, dtype=jnp.uint32))
    wo = unit_v3(0.3, 0.2, 0.93, n)
    st, wi, bsdf, pdf, kind = M.uber_sample_dir(st, wo, m)
    wi_n, bsdf_n, pdf_n, kind_n = map(np.asarray, (wi, bsdf, pdf, kind))
    diffuse = kind_n == M.PDF_NONZERO
    d_mask = diffuse & (np.abs(bsdf_n - 0.67 / np.pi) < 1e-4)
    assert d_mask.mean() > 0.9
    ratio = bsdf_n[d_mask] * np.abs(wi_n[2][d_mask]) / pdf_n[d_mask]
    np.testing.assert_allclose(ratio, 0.67, rtol=1e-4)


@pytest.mark.smoke
def test_uber_pdf_reversed_lerp_quirk():
    """uber_pdf lerps (metal, dielectric, metalness) — the reference's
    reversed order vs uber_bsdf (material.fut:358-361) must be preserved."""
    n = 4
    wo = unit_v3(0.2, 0.1, 0.97, n)
    wi = unit_v3(-0.3, 0.2, 0.93, n)
    m0 = lanes(n, metalness=0.0, roughness=0.4, ref_ix=1.5, opacity=1.0)
    got = np.asarray(M.uber_pdf(wo, wi, m0))
    metal = np.asarray(M.metal_pdf(wo, wi, m0))
    np.testing.assert_allclose(got, metal, rtol=1e-6)
    m1 = lanes(n, metalness=1.0, roughness=0.4, ref_ix=1.5, opacity=1.0)
    got1 = np.asarray(M.uber_pdf(wo, wi, m1))
    diel = np.asarray(M.dielectric_pdf(wo, wi, m1))
    np.testing.assert_allclose(got1, diel, rtol=1e-6)


def test_metal_sampling_stays_in_hemisphere():
    n = 1 << 13
    m = lanes(n, color=0.9, metalness=1.0, roughness=0.3, ref_ix=10.0)
    st = prng.make_streams(2, 0, jnp.arange(n, dtype=jnp.uint32))
    wo = unit_v3(0.4, -0.1, 0.91, n)
    st, wi, bsdf, pdf, kind = M.uber_sample_dir(st, wo, m)
    kind_n = np.asarray(kind)
    wi_n = np.asarray(wi)
    ok = kind_n == M.PDF_NONZERO
    # wrong-hemisphere reflections become null samples (material.fut:313-315)
    assert ok.mean() > 0.9
    assert (wi_n[2][ok] > 0).all()
    assert (np.asarray(pdf)[ok] > 0).all()
    assert (np.asarray(bsdf)[ok] >= 0).all()


def test_transmission_goes_through():
    n = 1 << 12
    m = lanes(n, metalness=0.0, opacity=0.0, ref_ix=1.5, roughness=0.0)
    st = prng.make_streams(3, 0, jnp.arange(n, dtype=jnp.uint32))
    wo = unit_v3(0.1, 0.0, 0.995, n)
    st, wi, bsdf, pdf, kind = M.uber_sample_dir(st, wo, m)
    kind_n, wi_n = np.asarray(kind), np.asarray(wi)
    trans = kind_n == M.PDF_DELTA
    # ref_ix 1.5 at ~6deg: fresnel ~4%, so most samples transmit
    assert trans.mean() > 0.8
    assert (wi_n[2][trans] < 0).all()


def test_beckmann_pdf_matches_histogram():
    """Microfacet wh sampling: empirical cos-theta distribution should
    integrate against the analytic D(wh)|cos| pdf."""
    n = 1 << 15
    m = lanes(n, roughness=0.5)
    st = prng.make_streams(4, 0, jnp.arange(n, dtype=jnp.uint32))
    wo = unit_v3(0.0, 0.0, 1.0, n)
    st, wh, pdf_wh = M._sample_beckmann_wh(st, wo, m)
    wh_n = np.asarray(wh)
    assert (wh_n[2] > 0).all()
    alpha = float(M.beckmann_alpha(jnp.float32(0.5)))
    theta = np.linspace(1e-4, np.pi / 2 - 1e-4, 4000)
    dd = (np.exp(-np.tan(theta) ** 2 / alpha**2)
          / (np.pi * alpha**2 * np.cos(theta) ** 4))
    pdf_theta = dd * np.cos(theta) * np.sin(theta) * 2 * np.pi
    norm = np.trapezoid(pdf_theta, theta)
    e_cos = np.trapezoid(np.cos(theta) * pdf_theta, theta) / norm
    assert abs(wh_n[2].mean() - e_cos) < 0.01


def test_world_local_roundtrip():
    n = 256
    rng = np.random.default_rng(0)
    nrm = la.v3_normalize(jnp.asarray(rng.normal(size=(3, n)), jnp.float32))
    w = la.v3_normalize(jnp.asarray(rng.normal(size=(3, n)), jnp.float32))
    onb = M.make_onb(nrm)
    back = M.local_to_world(onb, M.world_to_local(onb, w))
    np.testing.assert_allclose(np.asarray(back), np.asarray(w),
                               rtol=1e-4, atol=1e-5)
    # local normal maps to +z
    loc_n = M.world_to_local(onb, nrm)
    np.testing.assert_allclose(np.asarray(loc_n[2]), 1.0, atol=1e-5)


def test_parse_mats_roundtrip():
    rows = np.zeros((2, 28), np.float32)
    rows[0, 0:12] = [610, 0.5, 550, 0.6, 460, 0.7, -1, 0, -1, 0, -1, 0]
    rows[0, 12:16] = [0.3, 0.9, 1.5, 0.2]
    rows[1, 16:28] = [610, 2.0, 550, 1.0, 460, 0.5, -1, 0, -1, 0, -1, 0]
    t = M.parse_mats(rows)
    assert np.isclose(float(t.roughness[0]), 0.3)
    assert np.isclose(float(t.metalness[0]), 0.9)
    assert np.isclose(float(t.ref_ix[0]), 1.5)
    assert np.isclose(float(t.opacity[0]), 0.2)
    assert np.isclose(float(t.emission[1, 0, 1]), 2.0)
    # dispersion hack: ref_ix shifts with wavelength (material.fut:38-41)
    ml = M.at_wavelength(t, jnp.zeros((1,), jnp.int32), jnp.full((1,), 689.0))
    assert np.isclose(float(ml.ref_ix[0]), 1.5 - 100 / 10000, atol=1e-6)
    # transposed-row path agrees with the gather path
    from tracer_tpu.ops import tables
    ix = jnp.asarray([0, 1, 0, 1], jnp.int32)
    wl = jnp.asarray([500.0, 600.0, 689.0, 460.0])
    rows_t = tables.take_rows_t(jnp.asarray(rows), ix)
    got, em = M.at_wavelength_rows(rows_t, wl)
    want = M.at_wavelength(t, ix, wl)
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=1e-5)
