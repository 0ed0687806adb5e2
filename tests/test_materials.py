"""Uber-BSDF: distributions, physical identities, and preserved quirks."""

import numpy as np
import jax.numpy as jnp

from tracer_tpu.ops import materials as M
from tracer_tpu.ops import rng as prng


def lanes(n, color=0.8, roughness=1.0, metalness=0.0, ref_ix=1.0,
          opacity=1.0):
    f = lambda v: jnp.full((n,), v, jnp.float32)
    return M.MaterialLanes(color=f(color), roughness=f(roughness),
                           metalness=f(metalness), ref_ix=f(ref_ix),
                           opacity=f(opacity))


def test_cosine_hemisphere_distribution():
    n = 1 << 15
    st = prng.make_streams(0, 0, jnp.arange(n, dtype=jnp.uint32))
    _, wi = M.cosine_sample_hemisphere(st)
    wi = np.asarray(wi)
    assert (wi[:, 2] >= 0).all()
    assert abs(np.linalg.norm(wi, axis=-1).mean() - 1.0) < 1e-3
    # cosine-weighted: E[cos theta] = 2/3
    assert abs(wi[:, 2].mean() - 2 / 3) < 0.01


def test_reflect_is_mirror():
    w = jnp.asarray([[0.3, 0.4, 0.866]], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    r = np.asarray(M.reflect(w, n))[0]
    assert np.allclose(r, [-0.3, -0.4, 0.866], atol=1e-6)


def test_refract_snell():
    # 45 degrees into glass (eta = 1/1.5)
    wi = jnp.asarray([[np.sin(np.pi / 4), 0.0, np.cos(np.pi / 4)]], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    wt, tir = M.refract(wi, n, jnp.float32(1 / 1.5))
    wt = np.asarray(wt)[0]
    assert not bool(tir[0])
    sin_t = np.hypot(wt[0], wt[1])
    assert np.isclose(sin_t, np.sin(np.pi / 4) / 1.5, atol=1e-5)
    assert wt[2] < 0  # transmitted through


def test_refract_tir():
    # shallow angle from dense to thin medium: TIR
    wi = jnp.asarray([[0.95, 0.0, np.sqrt(1 - 0.95**2)]], jnp.float32)
    n = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    _, tir = M.refract(wi, n, jnp.float32(1.5))
    assert bool(tir[0])


def test_fresnel_normal_incidence():
    m = lanes(1, ref_ix=1.5)
    wo = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)
    r = float(M.fresnel_reflectance(wo, m)[0])
    assert np.isclose(r, ((1 - 1.5) / (1 + 1.5)) ** 2, atol=1e-6)


def test_diffuse_sample_consistency():
    """For the pure-diffuse branch, sampled (bsdf, pdf) must equal the
    diffuse lobe closed forms, and bsdf*cos/pdf == color (the reference's
    unit-weight RR identity, integrator.fut:62-69)."""
    n = 1 << 14
    m = lanes(n, color=0.67, metalness=0.0, opacity=1.0, ref_ix=1.0)
    st = prng.make_streams(1, 0, jnp.arange(n, dtype=jnp.uint32))
    wo = jnp.broadcast_to(jnp.asarray([0.3, 0.2, 0.93]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    st, wi, bsdf, pdf, kind = M.uber_sample_dir(st, wo, m)
    wi_n, bsdf_n, pdf_n, kind_n = map(np.asarray, (wi, bsdf, pdf, kind))
    # ref_ix=1 -> fresnel r0=0 at normal... at grazing some reflection;
    # restrict to lanes that took the diffuse branch
    diffuse = kind_n == M.PDF_NONZERO
    d_mask = diffuse & (np.abs(bsdf_n - 0.67 / np.pi) < 1e-4)
    assert d_mask.mean() > 0.9
    ratio = bsdf_n[d_mask] * np.abs(wi_n[d_mask, 2]) / pdf_n[d_mask]
    np.testing.assert_allclose(ratio, 0.67, rtol=1e-4)


def test_uber_pdf_reversed_lerp_quirk():
    """uber_pdf lerps (metal, dielectric, metalness) — the reference's
    reversed order vs uber_bsdf (material.fut:358-361) must be preserved."""
    n = 4
    wo = jnp.broadcast_to(jnp.asarray([0.2, 0.1, 0.97]), (n, 3))
    wi = jnp.broadcast_to(jnp.asarray([-0.3, 0.2, 0.93]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    wi = wi / jnp.linalg.norm(wi, axis=-1, keepdims=True)
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
    wo = jnp.broadcast_to(jnp.asarray([0.4, -0.1, 0.91]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    st, wi, bsdf, pdf, kind = M.uber_sample_dir(st, wo, m)
    kind_n = np.asarray(kind)
    wi_n = np.asarray(wi)
    ok = kind_n == M.PDF_NONZERO
    # wrong-hemisphere reflections become null samples (material.fut:313-315)
    assert ok.mean() > 0.9
    assert (wi_n[ok, 2] > 0).all()
    assert (np.asarray(pdf)[ok] > 0).all()
    assert (np.asarray(bsdf)[ok] >= 0).all()


def test_transmission_goes_through():
    n = 1 << 12
    m = lanes(n, metalness=0.0, opacity=0.0, ref_ix=1.5, roughness=0.0)
    st = prng.make_streams(3, 0, jnp.arange(n, dtype=jnp.uint32))
    wo = jnp.broadcast_to(jnp.asarray([0.1, 0.0, 0.995]), (n, 3))
    wo = wo / jnp.linalg.norm(wo, axis=-1, keepdims=True)
    st, wi, bsdf, pdf, kind = M.uber_sample_dir(st, wo, m)
    kind_n, wi_n = np.asarray(kind), np.asarray(wi)
    trans = kind_n == M.PDF_DELTA
    # ref_ix 1.5 at ~6deg: fresnel ~4%, so most samples transmit
    assert trans.mean() > 0.8
    assert (wi_n[trans, 2] < 0).all()


def test_beckmann_pdf_matches_histogram():
    """Microfacet wh sampling: empirical cos-theta distribution should
    integrate against the analytic D(wh)|cos| pdf."""
    n = 1 << 15
    m = lanes(n, roughness=0.5)
    st = prng.make_streams(4, 0, jnp.arange(n, dtype=jnp.uint32))
    wo = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (n, 3))
    st, wh, pdf_wh = M._sample_beckmann_wh(st, wo, m)
    wh_n, pdf_n = np.asarray(wh), np.asarray(pdf_wh)
    assert (wh_n[:, 2] > 0).all()
    # MC estimate of the pdf's own normalization: E[1/pdf * pdf] trivial;
    # instead check E[cos] under sampling vs numeric integral of D*cos
    alpha = float(M.beckmann_alpha(jnp.float32(0.5)))
    theta = np.linspace(1e-4, np.pi / 2 - 1e-4, 4000)
    d = (np.exp(-np.tan(theta) ** 2 / alpha**2)
         / (np.pi * alpha**2 * np.cos(theta) ** 4))
    pdf_theta = d * np.cos(theta) * np.sin(theta) * 2 * np.pi
    norm = np.trapezoid(pdf_theta, theta)
    e_cos = np.trapezoid(np.cos(theta) * pdf_theta, theta) / norm
    assert abs(wh_n[:, 2].mean() - e_cos) < 0.01


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
