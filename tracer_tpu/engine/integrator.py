"""Wavefront path integrator (replaces integrator.fut).

The reference's megakernel — one thread running the full bounce loop per
pixel (integrator.fut:27-76, :103-116) — becomes a batched wavefront: a
flat pool of N = w*h lanes advances one bounce per iteration of a single
lax.while_loop. Each iteration batches one closest-hit query, one NEE+MIS
direct-lighting estimate (two any_hit shadow queries) and one BSDF sample
across the entire pool, keeping the VPU/MXU dense; finished lanes are
masked and the loop exits early once every lane is dead
(SURVEY.md section 7.6).

Layout: rays are V3 = (3, N) transposed vectors and per-bounce records
are (PATH_LEN, N) — lanes always live on the minor axis, so per-bounce
writes and per-path reductions are major-axis ops (see linalg.py V3
notes for why this matters on TPU).

Estimator semantics preserved exactly (SURVEY.md "estimator fidelity"):
one hero wavelength + one channel per camera sample, emission added only
at the first bounce, ambience on miss, unit-weight Russian roulette
(p_terminate = 1 - bsdf*cos/pdf so surviving samples carry weight 1,
integrator.fut:62-69), per-bounce (distance, radiance) records of length
16 for the LiDAR return pipeline.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from tracer_tpu.models import camera as cam_mod
from tracer_tpu.models import scene as scene_mod
from tracer_tpu.ops import linalg as la
from tracer_tpu.ops import materials, shapes
from tracer_tpu.ops import rng as prng
from tracer_tpu.ops import spectrum as spec
from tracer_tpu.engine import direct as direct_mod

PATH_LEN = 16  # max path length (integrator.fut:23)

# LiDAR return distance window (lib.fut:40, integrator.fut:153)
LIDAR_MIN_D = 0.5
LIDAR_MAX_D = 10.0


class PathRecords(NamedTuple):
    """Per-bounce records, transposed — `path` in integrator.fut:25."""
    distance: jax.Array   # (PATH_LEN, N) cumulative distance, +inf dark
    radiance: jax.Array   # (PATH_LEN, N)


class FrameSamples(NamedTuple):
    """Everything sample_pixels produces for one 1-spp wavefront."""
    ray_origin: jax.Array  # (3, N) primary ray
    ray_dir: jax.Array     # (3, N)
    channel: jax.Array     # (N,) int32 sensor channel of the hero sample
    path: PathRecords
    rays_traced: jax.Array  # scalar int32: total trace queries (bench)


def path_trace(state, scene: scene_mod.Scene, origin, d, wavelen,
               ambience, transmitter_kind: str,
               trans_sectors, trans_theta,
               trans_emission) -> tuple[jax.Array, PathRecords, jax.Array]:
    """Trace the whole lane pool through <= PATH_LEN bounces
    (path_trace, integrator.fut:27-76). Rays are V3 (3, N). Returns
    (rng_state, PathRecords, rays_traced)."""
    n = d.shape[-1]
    ambience = jnp.asarray(ambience, jnp.float32)
    ambient = spec.lookup_pairs(
        wavelen, [(ambience[k, 0], ambience[k, 1]) for k in range(6)])
    ambient = jnp.broadcast_to(ambient, (n,))

    init = dict(
        rng=state,
        o=jnp.broadcast_to(origin, (3, n)), d=d,
        alive=jnp.ones((n,), bool),
        cum_dist=jnp.zeros((n,), jnp.float32),
        dist=jnp.full((PATH_LEN, n), jnp.inf, jnp.float32),
        rad=jnp.zeros((PATH_LEN, n), jnp.float32),
        i=jnp.int32(0),
        rays=jnp.int32(0),
    )

    def cond(c):
        return (c["i"] < PATH_LEN) & jnp.any(c["alive"])

    def body(c):
        alive = c["alive"]
        inter = scene_mod.closest_interaction(
            scene, shapes.F32_HIGHEST, c["o"], c["d"], wavelen)
        hit = alive & inter.ok
        miss = alive & ~inter.ok

        # Hit: NEE direct light + first-bounce emission
        # (integrator.fut:46-55).
        wo = -c["d"]
        rng, direct = direct_mod.direct_radiance(
            c["rng"], scene, wo, inter, wavelen, trans_sectors,
            transmitter_kind, trans_theta, trans_emission)
        emitted = jnp.where(c["i"] == 0, inter.emission_at_wl, 0.0)
        radiance = direct + emitted
        cum_dist = jnp.where(hit, c["cum_dist"] + inter.t, c["cum_dist"])

        # one (1, N) row write per bounce: hit -> (cum_dist, radiance),
        # miss -> (inf, ambience) (integrator.fut:55, :76)
        row_dist = jnp.where(hit, cum_dist, jnp.inf)
        row_rad = jnp.where(hit, radiance, jnp.where(miss, ambient, 0.0))
        dist = jax.lax.dynamic_update_index_in_dim(
            c["dist"], row_dist, c["i"], 0)
        rad = jax.lax.dynamic_update_index_in_dim(
            c["rad"], row_rad, c["i"], 0)

        # BSDF bounce + unit-weight Russian roulette
        # (integrator.fut:56-75).
        rng, wi, bsdf, pdf_val, pdf_kind = materials.sample_dir(
            rng, wo, inter.normal, inter.mat)
        pdf = jnp.where(pdf_kind == materials.PDF_DELTA, 1.0,
                        jnp.where(pdf_kind == materials.PDF_NONZERO,
                                  pdf_val, 0.0))
        cos_falloff = jnp.abs(la.v3_dot(inter.normal, wi))
        p_terminate = 1.0 - bsdf * cos_falloff / pdf
        rng, u = prng.next_unit(rng)
        terminate = u < p_terminate
        alive_next = hit & (pdf != 0) & ~terminate

        o_new, d_new = shapes.mkray_adjust_acne_v(inter.pos, inter.normal, wi)
        o = jnp.where(alive_next, o_new, c["o"])
        dnew = jnp.where(alive_next, d_new, c["d"])

        # 1 closest + 2 shadow queries per live lane this bounce.
        rays = c["rays"] + 3 * jnp.sum(alive).astype(jnp.int32)
        return dict(rng=rng, o=o, d=dnew, alive=alive_next,
                    cum_dist=cum_dist, dist=dist, rad=rad,
                    i=c["i"] + 1, rays=rays)

    out = jax.lax.while_loop(cond, body, init)
    return (out["rng"],
            PathRecords(distance=out["dist"], radiance=out["rad"]),
            out["rays"])


def sample_pixels(seed, nonce, scene: scene_mod.Scene, cam: cam_mod.Camera,
                  ambience, w: int, h: int, transmitter_kind: str,
                  row0=0, full_h: int | None = None) -> FrameSamples:
    """One 1-spp wavefront over a w x h grid (sample_pixels,
    integrator.fut:103-116 + sample_pixel :78-101), N = w*h lanes in
    row-major order.

    seed/nonce: scalars. Independent per-pixel streams come from hashing
    (seed, nonce, lane id) — the counter-based analogue of the
    reference's per-frame split_rng (integrator.fut:109); the caller
    advances the nonce each frame.

    row0/full_h support image-tile sharding (parallel/render.py): this
    call renders rows [row0, row0+h) of a full_h-tall image, with lane
    ids offset so every global pixel keeps its own stream.
    """
    if full_h is None:
        full_h = h
    n = w * h
    lane = jnp.arange(n, dtype=jnp.int32)
    jx = (lane % w).astype(jnp.float32)
    iy_row = (lane // w).astype(jnp.float32) + jnp.asarray(row0, jnp.float32)
    # the reference flips i: y = h - i - 1 (integrator.fut:89)
    iy = full_h - iy_row - 1.0

    lane_ids = (lane.astype(jnp.uint32)
                + jnp.asarray(row0, jnp.uint32) * jnp.uint32(w))
    state = prng.make_streams(seed, nonce, lane_ids)
    state, wavelen, channel = cam_mod.sample_wavelength(state, cam.conf)
    state, origin, d = cam_mod.sample_ray(
        state, cam, (jnp.float32(w), jnp.float32(full_h)), jx, iy)

    trans_sectors = cam_mod.gen_transmitter_sectors(cam, transmitter_kind, d)

    state, path, rays = path_trace(
        state, scene, origin, d, wavelen, ambience, transmitter_kind,
        trans_sectors, cam.conf.trans_theta, cam.conf.trans_emission)
    rays = rays + jnp.int32(n)  # primary rays
    return FrameSamples(ray_origin=jnp.broadcast_to(origin, (3, n)),
                        ray_dir=d, channel=channel, path=path,
                        rays_traced=rays)


# ---------------------------------------------------------------------------
# Visualization (integrator.fut:133-170)

def hue_to_rgb(hhue):
    """HSV->RGB at full saturation/value (integrator.fut:139-148).
    hhue (N,) -> (3, N)."""
    hp = hhue * 6.0
    x = 1.0 - jnp.abs(jnp.mod(hp, 2.0) - 1.0)
    k = jnp.floor(hp).astype(jnp.int32)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    rgb = jnp.select(
        [k == 0, k == 1, k == 2, k == 3, k == 4],
        [la.v3(one, x, zero),
         la.v3(x, one, zero),
         la.v3(zero, one, x),
         la.v3(zero, x, one),
         la.v3(x, zero, one)],
        la.v3(one, zero, x))
    return rgb


def visualize_color(samples: FrameSamples, channel_colors, w: int, h: int):
    """Sum of per-bounce radiance routed to the sample's channel color,
    scaled by the channel count (integrator.fut:163-168)."""
    n_channels = channel_colors.shape[0]
    intensity = jnp.sum(samples.path.radiance, axis=0)  # (N,)
    # channel -> color via a static select chain (C <= 3), not a gather
    color = jnp.zeros((3,) + intensity.shape, jnp.float32)
    for c in range(n_channels):
        color = jnp.where(samples.channel == c,
                          channel_colors[c][:, None], color)
    img = (intensity * color) * jnp.float32(n_channels)  # (3, N)
    return la.v3_to_array(img).reshape(h, w, 3)


def visualize_distance(samples: FrameSamples, w: int, h: int):
    """Closest valid LiDAR return mapped to hue (integrator.fut:150-162)."""
    d = samples.path.distance
    valid = ((samples.path.radiance > 0)
             & (d > LIDAR_MIN_D) & (d < LIDAR_MAX_D))
    dmin = jnp.min(jnp.where(valid, d, jnp.inf), axis=0)  # (N,)
    has = jnp.isfinite(dmin)
    hue = 0.85 * (dmin - LIDAR_MIN_D) / (LIDAR_MAX_D - LIDAR_MIN_D)
    rgb = hue_to_rgb(jnp.where(has, hue, 0.0))
    img = jnp.where(has, rgb, 0.0)  # (3, N)
    return la.v3_to_array(img).reshape(h, w, 3)


def visualize(samples: FrameSamples, render_mode: str, channel_colors,
              w: int, h: int):
    if render_mode == "distance":
        return visualize_distance(samples, w, h)
    return visualize_color(samples, channel_colors, w, h)


# ---------------------------------------------------------------------------
# Frame accumulation (integrator.fut:180-192)

def accumulate_color(acc, new, n_frames):
    """EMA merge using the pre-increment frame count, matching
    sample_frame_accum exactly (integrator.fut:190-192) — including its
    quirk that the n_frames=1 merge discards the first frame."""
    nf = jnp.asarray(n_frames, jnp.float32)
    return acc * ((nf - 1.0) / nf) + new * (1.0 / nf)


def accumulate_distance(acc, new):
    """Keep the existing pixel when it already has a return
    (integrator.fut:188-189)."""
    keep = la.norm(acc) > 0
    return jnp.where(keep[..., None], acc, new)


# ---------------------------------------------------------------------------
# LiDAR point clouds (integrator.fut:118-128, lib.fut:35-63)

class CloudPoints(NamedTuple):
    pos: jax.Array        # (3, PATH_LEN, N)
    distance: jax.Array   # (PATH_LEN, N)
    intensity: jax.Array  # (PATH_LEN, N)


def to_cloud_points(samples: FrameSamples) -> CloudPoints:
    """Positions along the straight primary ray at each return's path
    distance (sample_points, integrator.fut:118-128)."""
    dists = samples.path.distance  # (L, N)
    safe_d = jnp.where(jnp.isfinite(dists), dists, 0.0)
    pos = (samples.ray_origin[:, None, :]
           + safe_d[None] * samples.ray_dir[:, None, :])
    return CloudPoints(pos=pos, distance=dists,
                       intensity=samples.path.radiance)


def closest_return(points: CloudPoints, spp_factor):
    """Scale intensity by 1/spp, filter to the LiDAR window, min-distance
    return per lane (the `closest` helper, lib.fut:40-47). Returns
    (pos (3, N), distance (N,), intensity (N,)); misses are
    pos=(-1,-1,-1), distance=inf, intensity=0."""
    inten = points.intensity * spp_factor
    valid = ((inten > 0)
             & (points.distance > LIDAR_MIN_D)
             & (points.distance < LIDAR_MAX_D))
    dist = jnp.where(valid, points.distance, jnp.inf)
    best_d = jnp.min(dist, axis=0)                    # (N,)
    has = jnp.isfinite(best_d)
    # first record achieving the min (bounce axis is static length 16:
    # unrolled select chain, no argmin-over-lanes)
    best_pos = points.pos[:, 0, :]
    best_i = inten[0]
    found = dist[0] == best_d
    for k in range(1, points.distance.shape[0]):
        m = (~found) & (dist[k] == best_d)
        best_pos = jnp.where(m, points.pos[:, k, :], best_pos)
        best_i = jnp.where(m, inten[k], best_i)
        found = found | m
    pos = jnp.where(has, best_pos, -1.0)
    inten_out = jnp.where(has, best_i, 0.0)
    return pos, jnp.where(has, best_d, jnp.inf), inten_out
