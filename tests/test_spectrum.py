"""Spectrum lookup semantics vs a direct transcription of the reference's
sequential knot scan (reference src/spectrum.fut:30-49)."""

import pytest
import numpy as np
import jax.numpy as jnp

from tracer_tpu.ops import spectrum


def ref_lookup(v, knots):
    """Literal re-statement of the Futhark loop semantics in Python."""
    (w_below, x_below), (w_above, x_above) = (-1.0, 0.0), (np.inf, 0.0)
    for (w, x) in knots:
        if w > w_below and w <= v:
            w_below, x_below = w, x
        elif w < w_above and w > v:
            w_above, x_above = w, x
    if w_below < 0 and np.isinf(w_above):
        return 0.0
    if w_below < 0:
        return x_above
    if np.isinf(w_above):
        return x_below
    return x_below + (x_above - x_below) * (v - w_below) / (w_above - w_below)


@pytest.mark.smoke
def test_lookup_matches_reference_scan(rng_np):
    cases_k, cases_v = [], []
    for _ in range(200):
        n_real = rng_np.integers(1, 7)
        knots = np.full((6, 2), [-1.0, 0.0], dtype=np.float32)
        ws = np.sort(rng_np.uniform(0, 1000, n_real)).astype(np.float32)
        xs = rng_np.uniform(0, 5, n_real).astype(np.float32)
        knots[:n_real, 0] = ws
        knots[:n_real, 1] = xs
        cases_k.append(knots)
        cases_v.append(np.float32(rng_np.uniform(-100, 1200)))
    ks = np.stack(cases_k)
    vs = np.array(cases_v, np.float32)
    got = np.asarray(spectrum.lookup(jnp.asarray(vs), jnp.asarray(ks)))
    want = np.array([ref_lookup(float(v), k.tolist())
                     for v, k in zip(vs, ks)], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_lookup_uniform_and_empty():
    uni = jnp.asarray(spectrum.uniform_spectrum(3.5))
    assert np.isclose(float(spectrum.lookup(700.0, uni)), 3.5)
    assert np.isclose(float(spectrum.lookup(0.0, uni)), 3.5)
    zero = jnp.asarray(spectrum.no_sky())
    assert float(spectrum.lookup(550.0, zero)) == 0.0


def test_lookup_batched():
    s = jnp.asarray(np.stack([spectrum.uniform_spectrum(1.0),
                              spectrum.uniform_spectrum(2.0)]))
    v = jnp.array([500.0, 500.0])
    got = np.asarray(spectrum.lookup(v, s))
    assert np.allclose(got, [1.0, 2.0])


def test_blackbody_normalized_peak_near_one():
    s = spectrum.blackbody_normalized(5500.0)
    peak = max(s[:, 1])
    assert 0.5 < peak <= 1.2


def test_bright_blue_sky_is_blueish():
    s = jnp.asarray(spectrum.bright_blue_sky())
    blue = float(spectrum.lookup(spectrum.BLUE_WAVELEN, s))
    red = float(spectrum.lookup(spectrum.RED_WAVELEN, s))
    assert blue > red > 0
