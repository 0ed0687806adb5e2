"""Built-in virtual sensor configurations (replaces lib.fut:10-33).

Three presets, selected by cam_conf_id at init and cycled with the 't'
key (lib.fut:89-92, :168-179):
  0 visual        3-channel RGB-ish spectral camera, no transmitter
  1 visual_flash  same sensor + blackbody flash transmitter
  2 lidar         single 1550nm channel + scanning transmitter
"""

from __future__ import annotations

import math

import numpy as np
import jax.numpy as jnp

from tracer_tpu.models import camera as cam_mod
from tracer_tpu.ops import spectrum as spec

# (render_mode, transmitter_kind) static info per conf id
CONF_VISUAL = 0
CONF_VISUAL_FLASH = 1
CONF_LIDAR = 2

RENDER_COLOR = "color"
RENDER_DISTANCE = "distance"


def _mkconf(aperture, focal_dist, offset_radius, fov_deg, mus, sigmas,
            colors, trans_radius=0.0, trans_theta=0.0,
            trans_emission=None) -> cam_mod.CameraConfig:
    if trans_emission is None:
        trans_emission = spec.uniform_spectrum(0.0)
    f32 = jnp.float32
    return cam_mod.CameraConfig(
        aperture=f32(aperture),
        focal_dist=f32(focal_dist),
        offset_radius=f32(offset_radius),
        field_of_view=f32(math.radians(fov_deg)),
        sensor_mu=jnp.asarray(mus, jnp.float32),
        sensor_sigma=jnp.asarray(sigmas, jnp.float32),
        sensor_color=jnp.asarray(colors, jnp.float32),
        trans_radius=f32(trans_radius),
        trans_theta=f32(trans_theta),
        trans_emission=jnp.asarray(trans_emission, jnp.float32),
    )


def visual_conf() -> cam_mod.CameraConfig:
    """lib.fut:20-28 — Canon-400D-like triple-normal sensor."""
    return _mkconf(
        aperture=0.0, focal_dist=1.0, offset_radius=1.0, fov_deg=80.0,
        mus=[455.0, 535.0, 610.0],
        sigmas=[22.0, 32.0, 26.0],
        colors=[[0.0, 0.0, 1.0], [0.0, 1.0, 0.0], [1.0, 0.0, 0.0]],
    )


def visual_flash_conf() -> cam_mod.CameraConfig:
    """lib.fut:30-33 — visual sensor + 5500K flash at 1000x intensity."""
    emission = spec.map_intensities(lambda i: i * 1000.0,
                                    spec.blackbody_normalized(5500.0))
    c = visual_conf()
    return c._replace(trans_radius=jnp.float32(0.05),
                      trans_emission=jnp.asarray(emission, jnp.float32))


def lidar_conf() -> cam_mod.CameraConfig:
    """lib.fut:10-18 — 1550nm single channel, 3-degree scanning cone."""
    return _mkconf(
        aperture=0.0, focal_dist=1.0, offset_radius=0.01, fov_deg=90.0,
        mus=[1550.0], sigmas=[10.0], colors=[[1.0, 0.0, 0.0]],
        trans_radius=0.01, trans_theta=math.radians(3.0),
        trans_emission=spec.uniform_spectrum(1500.0),
    )


def conf_for_id(conf_id: int):
    """Returns (config, render_mode, transmitter_kind) for a conf id
    (lib.fut:89-92: 0 visual, 1 visual+flash, else lidar)."""
    if conf_id == CONF_VISUAL:
        return visual_conf(), RENDER_COLOR, cam_mod.TRANSMITTER_NONE
    if conf_id == CONF_VISUAL_FLASH:
        return visual_flash_conf(), RENDER_COLOR, cam_mod.TRANSMITTER_FLASH
    return lidar_conf(), RENDER_DISTANCE, cam_mod.TRANSMITTER_SCANNING
