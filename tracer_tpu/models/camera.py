"""Spectral sensor / camera model and ray generation (replaces camera.fut).

A sensor is C spectral channels, each a normal-distribution sensitivity
(mu, sigma) plus a visualization color (camera.fut:12-26). One camera
sample picks a channel uniformly and draws its hero wavelength by inverse
transform sampling (probit) of that normal (camera.fut:68-79); ray
generation is a jittered thin-lens model (camera.fut:81-110).

Deviation from the reference (documented): sample_camera_ray there reuses
one rng for both the pixel jitter and the lens disk without advancing
(camera.fut:86-102), correlating defocus with antialiasing. We draw
independent uniforms; since every built-in config has aperture = 0 the
lens term vanishes in all stock configurations anyway.
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


def sample_wavelength(state, conf: CameraConfig):
    """Pick channel uniformly, sample its wavelength by probit
    (camera.fut:68-79). Per-lane. Returns (state, wavelen, channel)."""
    n_channels = conf.sensor_mu.shape[0]
    state, channel = prng.select(state, n_channels)
    state, p = prng.next_unit(state)
    # channel -> (mu, sigma) via a static select chain (C <= 3), no gather
    mu = jnp.full(channel.shape, conf.sensor_mu[0], jnp.float32)
    sigma = jnp.full(channel.shape, conf.sensor_sigma[0], jnp.float32)
    for c in range(1, n_channels):
        mu = jnp.where(channel == c, conf.sensor_mu[c], mu)
        sigma = jnp.where(channel == c, conf.sensor_sigma[c], sigma)
    wavelen = mu + sigma * ndtri(jnp.maximum(p, 1e-12))
    return state, wavelen, channel


def sample_ray(state, cam: Camera, wh, ji):
    """Thin-lens jittered primary ray per lane (camera.fut:81-110).

    wh: (2,) image plane size (w, h) as f32; ji: (N, 2) pixel coords with
    j = column, i flipped as (h - i - 1) by the caller.
    Returns (state, origin (N,3), dir (N,3)).
    """
    conf = cam.conf
    ratio = wh[0] / wh[1]
    state, (ox, oy) = prng.in_unit_square(state)
    offset = jnp.stack([ox, oy], axis=-1) * conf.offset_radius
    xy = (ji + offset) / wh

    lens_radius = conf.aperture / 2.0
    half_height = jnp.tan(conf.field_of_view / 2.0)
    half_width = ratio * half_height
    d = cam_dir(cam)
    w, u, v = -d, cam_right(cam), cam_up(cam)
    fd = conf.focal_dist
    lower_left = (cam.origin
                  - la.scale(half_width * fd, u)
                  - la.scale(half_height * fd, v)
                  - la.scale(fd, w))
    horizontal = la.scale(2.0 * half_width * fd, u)
    vertical = la.scale(2.0 * half_height * fd, v)

    state, disk = prng.in_unit_disk(state)
    lens = disk * lens_radius
    lens_offset = la.scale(lens[..., 0], u) + la.scale(lens[..., 1], v)
    origin = cam.origin + lens_offset
    target = (lower_left
              + la.scale(xy[..., 0], horizontal)
              + la.scale(xy[..., 1], vertical))
    return state, origin, la.normalize(target - origin)


def gen_transmitter_tris(cam: Camera, transmitter_kind: str, ray_dir):
    """Per-ray transmitter geometry: an 8-sector disk fan at the camera
    origin (camera.fut:112-122).

    flash: normal = camera direction (same fan for every ray)
    scanning: normal = the ray's own direction (per-ray fan)
    Returns (N, 8, 3, 3) triangles, or None when kind == none.
    """
    if transmitter_kind == TRANSMITTER_NONE:
        return None
    n = ray_dir.shape[0]
    if transmitter_kind == TRANSMITTER_FLASH:
        fan = shapes.disk(cam.origin, cam_dir(cam), cam.conf.trans_radius,
                          TRANSMITTER_SECTORS)
        return jnp.broadcast_to(fan, (n,) + fan.shape)
    origin = jnp.broadcast_to(cam.origin, ray_dir.shape)
    return shapes.disk(origin, ray_dir, cam.conf.trans_radius,
                       TRANSMITTER_SECTORS)
