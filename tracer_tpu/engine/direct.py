"""Next-event estimation with balance-heuristic MIS (replaces direct.fut).

Per bounce, each live lane stochastically selects ONE light (uniform over
scene lights + per-ray transmitter fan), then combines a light-area sample
and a BSDF sample with the balance heuristic — UniformSampleOneLight of
PBR Book 14.3 (direct.fut:106-122).

TPU shape: the reference appends the transmitter to the light list per
ray (integrator.fut:96, flagged by its own TODO as a strange pattern); we
instead treat the transmitter as an explicit per-ray light-table extension:
indices [0, L) gather the static scene table, [L, L+8) select the lane's
own transmitter fan triangle. Everything is one fused select chain on the
VPU; the two shadow queries per bounce batch into two any_hit calls.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tracer_tpu.models import camera as cam_mod
from tracer_tpu.models import lights as lights_mod
from tracer_tpu.models import scene as scene_mod
from tracer_tpu.ops import linalg as la
from tracer_tpu.ops import materials, shapes
from tracer_tpu.ops import rng as prng
from tracer_tpu.ops import spectrum as spec

OCCLUSION_EPS = 0.01  # direct.fut:11


class LaneLights(NamedTuple):
    """The one light each lane selected: per-lane kind/geometry/emission."""
    kind: jax.Array      # (N,) int32
    tri: jax.Array       # (N, 3, 3)
    theta: jax.Array     # (N,)
    emission: jax.Array  # (N, 6, 2)


def select_lane_light(state, scene: scene_mod.Scene,
                      trans_tris: Optional[jax.Array],
                      transmitter_kind: str,
                      trans_theta, trans_emission, n_rays: int):
    """Uniformly pick one light per lane from scene lights + transmitter
    fan (random_select, direct.fut:118). Returns (state, LaneLights, n_lights)
    or (state, None, 0) when there are no lights at all."""
    n_scene = scene.lights.count
    n_trans = 0 if trans_tris is None else trans_tris.shape[1]
    n_lights = n_scene + n_trans
    if n_lights == 0:
        return state, None, 0

    state, li = prng.select(state, n_lights)

    if n_scene > 0:
        si = jnp.clip(li, 0, n_scene - 1)
        kind = scene.lights.kind[si]
        tri = scene.lights.tri[si]
        theta = scene.lights.theta[si]
        emission = scene.lights.emission[si]
    else:
        kind = jnp.zeros((n_rays,), jnp.int32)
        tri = jnp.zeros((n_rays, 3, 3), jnp.float32)
        theta = jnp.zeros((n_rays,), jnp.float32)
        emission = jnp.zeros((n_rays, 6, 2), jnp.float32)

    if n_trans > 0:
        ti = jnp.clip(li - n_scene, 0, n_trans - 1)
        t_tri = jnp.take_along_axis(
            trans_tris, ti[:, None, None, None], axis=1)[:, 0]
        t_kind = (lights_mod.KIND_FRUSTUM_AREA
                  if transmitter_kind == cam_mod.TRANSMITTER_SCANNING
                  else lights_mod.KIND_DIFFUSE_AREA)
        is_t = li >= n_scene
        kind = jnp.where(is_t, t_kind, kind)
        tri = jnp.where(is_t[:, None, None], t_tri, tri)
        theta = jnp.where(is_t, trans_theta, theta)
        emission = jnp.where(is_t[:, None, None],
                             jnp.broadcast_to(trans_emission, (n_rays, 6, 2)),
                             emission)

    return state, LaneLights(kind=kind, tri=tri, theta=theta,
                             emission=emission), n_lights


def occluded(scene, hit_pos, hit_normal, lightp):
    """Backface test + shadow ray (occluded, direct.fut:7-15)."""
    v = lightp - hit_pos
    w = la.normalize(v, eps=1e-30)
    backface = la.dot(w, hit_normal) <= 0
    dist = la.norm(v)
    o, d = shapes.mkray_adjust_acne(hit_pos, hit_normal, w)
    blocked = scene_mod.any_hit(scene, dist - OCCLUSION_EPS, o, d)
    return backface | blocked


def balance(pdf_f, pdf_g):
    """Balance heuristic with nf = ng = 1 (direct.fut:56-58)."""
    return pdf_f / (pdf_f + pdf_g)


def estimate_direct(state, scene: scene_mod.Scene, wo,
                    inter: scene_mod.Interaction, light: LaneLights,
                    wavelen):
    """MIS light-sample + BSDF-sample estimate toward each lane's light
    (estimate_direct, direct.fut:63-103). Returns (state, radiance (N,))."""
    is_point = light.kind == lights_mod.KIND_POINT
    a = light.tri[:, 0, :]
    e1 = light.tri[:, 1, :] - a
    e2 = light.tri[:, 2, :] - a
    area = la.norm(la.cross(e1, e2)) * 0.5
    inv_area = 1.0 / jnp.maximum(area, 1e-30)

    # --- light sampling (sample_light, direct.fut:24-53)
    state, (u, v) = prng.in_triangle(state)
    p_area = a + la.scale(u, e1) + la.scale(v, e2)
    lightp = jnp.where(is_point[:, None], a, p_area)
    wi_l = la.normalize(lightp - inter.pos, eps=1e-30)

    point_rad = (spec.lookup(wavelen, light.emission)
                 / jnp.maximum(la.quadrance(lightp - inter.pos), 1e-30))
    area_rad = lights_mod.area_incident_radiance(
        light.kind, light.tri, light.theta, light.emission,
        inter.pos, lightp, wavelen)
    in_radiance = jnp.where(is_point, point_rad, area_rad)
    light_pdf = jnp.where(is_point, 1.0, inv_area)

    occ = occluded(scene, inter.pos, inter.normal, lightp)
    in_radiance = jnp.where(occ, 0.0, in_radiance)

    f_l = (materials.bsdf_f(wo, wi_l, inter.normal, inter.mat)
           * jnp.abs(la.dot(wi_l, inter.normal)))
    scattering_pdf = materials.bsdf_pdf(wo, wi_l, inter.normal, inter.mat)
    weight_l = balance(light_pdf, scattering_pdf)
    light_part = jnp.where(
        (light_pdf == 0) | (in_radiance == 0), 0.0,
        f_l * weight_l * in_radiance / light_pdf)

    # --- BSDF sampling toward the same light (direct.fut:79-102);
    # zero for point lights (a BSDF sample almost surely misses a point).
    state, wi_b, bsdf_b, pdf_b, kind_b = materials.sample_dir(
        state, wo, inter.normal, inter.mat)
    o_b, d_b = shapes.mkray_adjust_acne(inter.pos, inter.normal, wi_b)
    hit_ok, _, lh_pos, _ = shapes.hit_triangle(
        shapes.F32_HIGHEST, o_b, d_b, light.tri)
    occ_b = occluded(scene, inter.pos, inter.normal, lh_pos)
    in_rad_b = lights_mod.area_incident_radiance(
        light.kind, light.tri, light.theta, light.emission,
        inter.pos, lh_pos, wavelen)
    f_b = bsdf_b * jnp.abs(la.dot(wi_b, inter.normal))
    weight_b = balance(pdf_b, inv_area)
    contrib = jnp.where(
        kind_b == materials.PDF_DELTA, f_b * in_rad_b,
        jnp.where(kind_b == materials.PDF_NONZERO,
                  f_b * in_rad_b * weight_b / jnp.maximum(pdf_b, 1e-30),
                  0.0))
    bsdf_part = jnp.where(is_point | ~hit_ok | occ_b, 0.0, contrib)

    return state, light_part + bsdf_part


def direct_radiance(state, scene: scene_mod.Scene, wo,
                    inter: scene_mod.Interaction, wavelen,
                    trans_tris: Optional[jax.Array],
                    transmitter_kind: str, trans_theta, trans_emission):
    """One-light estimate scaled by light count (direct_radiance,
    direct.fut:111-122). Returns (state, radiance (N,))."""
    n_rays = wo.shape[0]
    state, light, n_lights = select_lane_light(
        state, scene, trans_tris, transmitter_kind, trans_theta,
        trans_emission, n_rays)
    if light is None:
        return state, jnp.zeros((n_rays,), jnp.float32)
    state, radiance = estimate_direct(state, scene, wo, inter, light,
                                      wavelen)
    return state, radiance * jnp.float32(n_lights)
