"""Spectral sensor / camera model and ray generation (replaces camera.fut).

A sensor is C spectral channels, each a normal-distribution sensitivity
(mu, sigma) plus a visualization color (camera.fut:12-26). One camera
sample picks a channel uniformly and draws its hero wavelength by inverse
transform sampling (probit) of that normal (camera.fut:68-79); ray
generation is a jittered thin-lens model (camera.fut:81-110).

The reference's sample_camera_ray reuses ONE rng for both the pixel
jitter and the lens disk (camera.fut:86-102): random_in_unit_square and
random_in_unit_disk start from the same state, so theta is the jitter-x
draw mapped to [0, 2pi) and the disk radius^2 IS the jitter-y draw.
sample_ray reproduces that correlation exactly by deriving the lens
sample from the same (ox, oy) pair (no extra draws). The reference also
hands the SAME pre-camera rng on to path_trace (integrator.fut:86-101),
so its first path decision repeats the jitter draws; sample_ray matches
that too by returning its INCOMING state un-advanced, so the path
re-reads the jitter draws exactly as the reference does (PARITY.md:
FULLY MATCHED).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.scipy.special import ndtri

from tracer_tpu.ops import linalg as la
from tracer_tpu.ops import rng as prng
from tracer_tpu.ops import shapes

# Transmitter kinds (static config, camera.fut:30-32)
TRANSMITTER_NONE = "none"
TRANSMITTER_FLASH = "flash"
TRANSMITTER_SCANNING = "scanning"

TRANSMITTER_SECTORS = 8  # disk fan resolution (camera.fut:113)


class CameraConfig(NamedTuple):
    """Numeric camera configuration; all fields traced so runtime tweaks
    (aperture/focal keys, lib.fut:156-167) never trigger recompiles.
    The transmitter *kind* is static and lives in engine state."""
    aperture: jax.Array        # scalar
    focal_dist: jax.Array      # scalar
    offset_radius: jax.Array   # scalar
    field_of_view: jax.Array   # scalar, radians
    sensor_mu: jax.Array       # (C,)
    sensor_sigma: jax.Array    # (C,)
    sensor_color: jax.Array    # (C, 3) channel visualization colors
    trans_radius: jax.Array    # scalar
    trans_theta: jax.Array     # scalar, radians (scanning cone)
    trans_emission: jax.Array  # (6, 2)


class Camera(NamedTuple):
    pitch: jax.Array   # scalar
    yaw: jax.Array     # scalar
    origin: jax.Array  # (3,)
    conf: CameraConfig


def cam_dir(cam: Camera):
    """camera.fut:47-49 (note: no cos(pitch) scaling of xz — preserved)."""
    return la.normalize(la.vec3(jnp.sin(cam.yaw), jnp.sin(cam.pitch),
                                -jnp.cos(cam.yaw)))


def cam_right(cam: Camera):
    return la.normalize(la.cross(cam_dir(cam), la.WORLD_UP))


def cam_up(cam: Camera):
    return la.normalize(la.cross(cam_right(cam), cam_dir(cam)))


def move_camera(cam: Camera, m) -> Camera:
    """WASD/XZ translation, step 0.1 (camera.fut:57-62)."""
    d = cam_dir(cam)
    forward = la.normalize(la.vec3(d[..., 0], jnp.zeros_like(d[..., 1]),
                                   d[..., 2]))
    m = jnp.asarray(m, jnp.float32)
    origin = (cam.origin
              + la.scale(0.1 * m[2], forward)
              + la.scale(0.1 * m[0], cam_right(cam))
              + la.scale(0.1 * m[1], la.WORLD_UP))
    return cam._replace(origin=origin)


def turn_camera(cam: Camera, dpitch, dyaw) -> Camera:
    """Arrow-key rotation; pitch clamped to +-pi/2 (camera.fut:64-66)."""
    pitch = jnp.clip(cam.pitch + dpitch, -0.5 * jnp.pi, 0.5 * jnp.pi)
    yaw = jnp.mod(cam.yaw + dyaw, 2.0 * jnp.pi)
    return cam._replace(pitch=pitch, yaw=yaw)


# Salt for the out-of-band channel/wavelength draws (ops/rng.py
# salted_pair: the chained channel select is measurably correlated
# with the path draws that follow it, biasing channel-conditioned
# energy — the round-4 mirrorbox +5% G root cause; see docs/PARITY.md
# "mirrorbox investigation").
_SALT_WAVELENGTH = 0x3C6EF372


def sample_wavelength(state, conf: CameraConfig):
    """Pick channel uniformly, sample its wavelength by probit
    (camera.fut:68-79). Per-lane. Returns (state, wavelen, channel).

    The channel and probit draws come from one threefry block over the
    PRE-advance state (decorrelated from the downstream path draws);
    the main stream still advances twice, so every other draw in the
    sample keeps its position."""
    n_channels = conf.sensor_mu.shape[0]
    b0, b1 = prng.salted_pair(state, _SALT_WAVELENGTH)
    state, _ = prng.next_u32(state)
    state, _ = prng.next_u32(state)
    channel = (b0 % jnp.uint32(n_channels)).astype(jnp.int32)
    p = (b1 >> jnp.uint32(8)).astype(jnp.float32) * jnp.float32(
        prng.UNIT_SCALE / (1 << 24))
    # channel -> (mu, sigma) via a static select chain (C <= 3), no gather
    mu = jnp.full(channel.shape, conf.sensor_mu[0], jnp.float32)
    sigma = jnp.full(channel.shape, conf.sensor_sigma[0], jnp.float32)
    for c in range(1, n_channels):
        mu = jnp.where(channel == c, conf.sensor_mu[c], mu)
        sigma = jnp.where(channel == c, conf.sensor_sigma[c], sigma)
    wavelen = mu + sigma * ndtri(jnp.maximum(p, 1e-12))
    return state, wavelen, channel


def sample_ray(state, cam: Camera, wh, jx, iy):
    """Thin-lens jittered primary ray per lane (camera.fut:81-110),
    transposed layout.

    wh: (w, h) python/scalar pair; jx/iy: (N,) pixel coords with
    j = column, i already flipped as (h - i - 1) by the caller.
    Returns (state, origin (3,N), dir (3,N)).

    The returned state is the INCOMING state, un-advanced: the
    reference's sample_camera_ray discards its rng (`let (_rng, ...)`,
    camera.fut:86, :102) and sample_pixel hands the same pre-jitter rng
    to path_trace (integrator.fut:86-101), so the path's first draws
    re-read the jitter outputs. Matching this closes the last
    documented rng-stream deviation (docs/PARITY.md thin-lens row).
    """
    conf = cam.conf
    w_f, h_f = wh
    ratio = w_f / h_f
    state0 = state
    state, (ox, oy) = prng.in_unit_square(state)
    x = (jx + ox * conf.offset_radius) / w_f
    y = (iy + oy * conf.offset_radius) / h_f

    # lens disk from the SAME draws as the jitter (camera.fut:86-102
    # reuses one rng for both): theta is the jitter-x draw remapped from
    # [0, 0.9999) to [0, 2pi), r^2 is the jitter-y draw — exactly the
    # reference's random_in_unit_disk on the pre-jitter state
    theta = ox * (2.0 * jnp.pi / prng.UNIT_SCALE)
    lr = jnp.sqrt(oy)
    lx, ly = lr * jnp.cos(theta), lr * jnp.sin(theta)

    lens_radius = conf.aperture / 2.0
    half_height = jnp.tan(conf.field_of_view / 2.0)
    half_width = ratio * half_height
    d = la.v3_from_array(cam_dir(cam))[:, None]       # (3,1)
    u = la.v3_from_array(cam_right(cam))[:, None]
    v = la.v3_from_array(cam_up(cam))[:, None]
    w_vec = -d
    fd = conf.focal_dist
    origin0 = cam.origin[:, None]                      # (3,1)
    lower_left = (origin0
                  - (half_width * fd) * u
                  - (half_height * fd) * v
                  - fd * w_vec)
    horizontal = (2.0 * half_width * fd) * u
    vertical = (2.0 * half_height * fd) * v

    lens_offset = (lens_radius * lx) * u + (lens_radius * ly) * v
    origin = origin0 + lens_offset
    target = lower_left + x * horizontal + y * vertical
    return state0, origin, la.v3_normalize(target - origin)


def gen_transmitter_sectors(cam: Camera, transmitter_kind: str, ray_dir):
    """Per-ray transmitter geometry: an 8-sector disk fan at the camera
    origin (camera.fut:112-122), transposed layout.

    flash: normal = camera direction (same fan for every ray)
    scanning: normal = the ray's own direction (per-ray fan)
    Returns a list of TRANSMITTER_SECTORS (a, b, c) V3 tuples, or None.
    """
    if transmitter_kind == TRANSMITTER_NONE:
        return None
    if transmitter_kind == TRANSMITTER_FLASH:
        normal = la.v3_from_array(cam_dir(cam))[:, None]
    else:
        normal = ray_dir
    origin = jnp.broadcast_to(cam.origin[:, None], normal.shape)
    return shapes.disk_sectors_v(origin, normal, cam.conf.trans_radius,
                                 TRANSMITTER_SECTORS)
