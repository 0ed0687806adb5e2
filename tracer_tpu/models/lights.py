"""Light types and incident-radiance evaluation (replaces light.fut).

The reference's sum type #pointlight | #arealight(#diffuselight |
#frustumlight) (light.fut:4-11) becomes a fixed-size SoA table with an
int32 kind per slot, so one gathered lane per ray evaluates any light
type branch-free.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from tracer_tpu.ops import linalg as la
from tracer_tpu.ops import shapes
from tracer_tpu.ops import spectrum as spec

KIND_POINT = 0
KIND_DIFFUSE_AREA = 1
KIND_FRUSTUM_AREA = 2


class Lights(NamedTuple):
    """SoA light table. For point lights `tri[0]` holds the position in
    vertex 0; for area lights `tri` is the emitting triangle."""
    kind: jax.Array      # (L,) int32
    tri: jax.Array       # (L, 3, 3) f32
    theta: jax.Array     # (L,) f32 frustum half-angle (radians)
    emission: jax.Array  # (L, 6, 2) f32

    @property
    def count(self) -> int:
        return self.kind.shape[0]


def empty_lights() -> Lights:
    return Lights(kind=jnp.zeros((0,), jnp.int32),
                  tri=jnp.zeros((0, 3, 3), jnp.float32),
                  theta=jnp.zeros((0,), jnp.float32),
                  emission=jnp.zeros((0, 6, 2), jnp.float32))


def _toward(lightp, hitp):
    v = lightp - hitp
    return la.normalize(v, eps=1e-30), la.quadrance(v)


def diffuse_area_incident_radiance(tri, emission, hitp, lightp, wavelen):
    """Cosine-falloff emitter (light.fut:19-30). All args per-lane."""
    wi, dist_sq = _toward(lightp, hitp)
    lnormal = shapes.triangle_normal(tri)
    cos_theta_l = la.dot(-wi, lnormal)
    return jnp.maximum(
        0.0, spec.lookup(wavelen, emission) * cos_theta_l / dist_sq)


def frustum_area_incident_radiance(tri, theta, emission, hitp, lightp,
                                   wavelen):
    """Cone-restricted emitter for the scanning LiDAR transmitter
    (light.fut:32-44)."""
    wi, dist_sq = _toward(lightp, hitp)
    lnormal = shapes.triangle_normal(tri)
    cos_theta_l = la.dot(-wi, lnormal)
    inside = jnp.arccos(jnp.clip(cos_theta_l, -1.0, 1.0)) <= theta
    return jnp.where(inside, spec.lookup(wavelen, emission) / dist_sq, 0.0)


def area_incident_radiance(kind, tri, theta, emission, hitp, lightp,
                           wavelen):
    """arealight_incident_radiance (light.fut:46-55), kind-dispatched."""
    diffuse = diffuse_area_incident_radiance(tri, emission, hitp, lightp,
                                             wavelen)
    frustum = frustum_area_incident_radiance(tri, theta, emission, hitp,
                                             lightp, wavelen)
    return jnp.where(kind == KIND_FRUSTUM_AREA, frustum, diffuse)
