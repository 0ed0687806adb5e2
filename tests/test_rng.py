"""Statistical checks on the per-lane PCG sampler."""

import pytest
import numpy as np
import jax.numpy as jnp

from tracer_tpu.ops import rng as prng


@pytest.mark.smoke
def test_unit_range_and_mean():
    st = prng.make_streams(0, 0, jnp.arange(1 << 14, dtype=jnp.uint32))
    st, u = prng.next_unit(st)
    u = np.asarray(u)
    assert (u >= 0).all() and (u < prng.UNIT_SCALE).all()
    assert abs(u.mean() - 0.5) < 0.01
    assert abs(u.var() - 1 / 12) < 0.01


def test_streams_decorrelated_across_lanes_and_frames():
    lanes = jnp.arange(4096, dtype=jnp.uint32)
    st0 = prng.make_streams(7, 0, lanes)
    st1 = prng.make_streams(7, 1, lanes)
    _, u0 = prng.next_unit(st0)
    _, u1 = prng.next_unit(st1)
    c = np.corrcoef(np.asarray(u0), np.asarray(u1))[0, 1]
    assert abs(c) < 0.05
    # adjacent lanes decorrelated
    u0 = np.asarray(u0)
    c2 = np.corrcoef(u0[:-1], u0[1:])[0, 1]
    assert abs(c2) < 0.05


@pytest.mark.smoke
def test_sequential_draws_advance():
    st = prng.make_streams(3, 0, jnp.arange(1024, dtype=jnp.uint32))
    st, a = prng.next_unit(st)
    st, b = prng.next_unit(st)
    assert not np.allclose(np.asarray(a), np.asarray(b))
    c = np.corrcoef(np.asarray(a), np.asarray(b))[0, 1]
    assert abs(c) < 0.07


def test_disk_sample_in_disk():
    st = prng.make_streams(0, 0, jnp.arange(8192, dtype=jnp.uint32))
    _, d = prng.in_unit_disk(st)
    d = np.asarray(d)
    r = np.hypot(d[:, 0], d[:, 1])
    assert (r < 1.0).all()
    assert (d[:, 2] == 0).all()
    # uniform over disk: mean radius = 2/3
    assert abs(r.mean() - 2 / 3) < 0.01


def test_triangle_sample_valid_barycentrics():
    st = prng.make_streams(0, 0, jnp.arange(8192, dtype=jnp.uint32))
    _, (u, v) = prng.in_triangle(st)
    u, v = np.asarray(u), np.asarray(v)
    assert (u >= 0).all() and (v >= 0).all() and (u + v <= 1.0).all()


def test_select_uniform():
    st = prng.make_streams(0, 0, jnp.arange(1 << 15, dtype=jnp.uint32))
    _, idx = prng.select(st, 7)
    counts = np.bincount(np.asarray(idx), minlength=7)
    assert counts.min() > 0.9 * counts.mean()
