#!/usr/bin/env python
"""Per-stage timing of one pooled-renderer bounce on a chosen scene.

Times, via the axon-safe pattern (K reps inside one jit with input
perturbation, scalar fetch, minus the ~30ms tunnel roundtrip):
  closest   closest_hit query alone (pallas or XLA path)
  anyhit    any_hit shadow query alone
  interact  closest_interaction (query + material row fetch + eval)
  bounce    the full pooled-renderer body (query + NEE + BSDF + records)
  refill    start_samples equivalent: RNG hash + wavelength + camera ray
  store     finish_samples equivalent: (m_items, P) rad/chan where-writes
  pooliter  REAL per-iteration cost: a full render_pooled run divided by
            its own iters counter (PROFILE_SPP, default 64) — the
            ground truth the stage sum is compared against; the gap is
            whatever the stages above do not model (carry copies, masks,
            pool bookkeeping).

Usage: python benchmarks/profile_bounce.py [scene] [lanes]
"""

import os
import sys
import time

os.environ.setdefault("TRACER_COMPILE_CACHE", "/tmp/tracer_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _cpu_pin

_cpu_pin.maybe_force_from_env()  # JAX_PLATFORMS=cpu actually forces CPU

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["TRACER_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tracer_tpu as T
from tracer_tpu.engine import integrator, direct as direct_mod
from tracer_tpu.models import scene as scene_mod, camera as cam_mod
from tracer_tpu.ops import shapes, intersect
from tracer_tpu.utils.objloader import load_obj

ROUNDTRIP_S = 0.030
REPS = 8


def timed(fn, *args, reps=REPS):
    """K-rep scan timing with per-rep input perturbation; returns seconds
    per rep (tunnel roundtrip subtracted). Cheap (sub-ms) stages need a
    high rep count or the roundtrip subtraction swamps the signal."""

    @jax.jit
    def run(eps, args):
        def body(carry, k):
            out = fn(carry, *args)
            return carry + eps * (k + 1), out
        acc, outs = jax.lax.scan(body, jnp.float32(0.0),
                                 jnp.arange(reps, dtype=jnp.int32))
        return acc + jax.tree_util.tree_reduce(
            lambda a, b: a + b.astype(jnp.float32).ravel()[0], outs,
            jnp.float32(0.0))

    r = run(jnp.float32(1e-7), args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(jnp.float32(2e-7), args)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return max(dt - ROUNDTRIP_S, 1e-9) / reps


def main():
    scene_name = sys.argv[1] if len(sys.argv) > 1 else "SpectrumSphere"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 512 * 512
    assets = os.environ.get("TRACER_ASSETS", "/root/reference/assets")
    tris, tm, mats = load_obj(os.path.join(assets, scene_name + ".obj"))
    size = int(round(n ** 0.5))
    s = T.init(0, size, size, 0, tris, tm, mats, cam_origin=(0.0, 0.8, 1.8))
    scene = s.scene
    w, h = s.sub_dims
    n = w * h
    t_pad = scene.accel.coeffs.shape[1] if isinstance(
        scene.accel, intersect.DenseTris) else -1
    print(f"scene={scene_name} tris={tris.shape[0]} t_pad={t_pad} lanes={n} "
          f"backend={jax.default_backend()}")

    key = jax.random.PRNGKey(0)
    o = jnp.broadcast_to(jnp.asarray([[0.0], [0.8], [1.8]], jnp.float32),
                         (3, n)) + 0.0
    d = jax.random.normal(key, (3, n), jnp.float32)
    d = d / jnp.linalg.norm(d, axis=0, keepdims=True)
    wl = jnp.full((n,), 550.0, jnp.float32)

    def f_closest(eps, o, d):
        ok, t, i, pos, nrm = scene_mod.closest_hit(scene, shapes.F32_HIGHEST,
                                                   o + eps, d)
        return t

    def f_anyhit(eps, o, d):
        return scene_mod.any_hit(scene, 5.0, o + eps, d)

    def f_interact(eps, o, d, wl):
        inter = scene_mod.closest_interaction(scene, shapes.F32_HIGHEST,
                                              o + eps, d, wl)
        return inter.t

    print(f"closest   {timed(f_closest, o, d)*1e3:8.2f} ms")
    print(f"anyhit    {timed(f_anyhit, o, d)*1e3:8.2f} ms")
    print(f"interact  {timed(f_interact, o, d, wl)*1e3:8.2f} ms")

    # full bounce: one pooled iteration == render_pooled with spp s.t.
    # iterations ~= REPS is hard to isolate; instead time the body parts
    # we can call standalone: interaction + NEE + BSDF sample.
    from tracer_tpu.ops import materials
    from tracer_tpu.ops import rng as prng

    rng0 = prng.make_streams(jnp.uint32(0), jnp.uint32(0),
                             jnp.arange(n, dtype=jnp.uint32))
    trans = cam_mod.gen_transmitter_sectors(s.cam, s.transmitter_kind, d)

    def f_bounce(eps, o, d, wl):
        inter = scene_mod.closest_interaction(scene, shapes.F32_HIGHEST,
                                              o + eps, d, wl)
        wo = -d
        rng, direct = direct_mod.direct_radiance(
            rng0, scene, wo, inter, wl, trans, s.transmitter_kind,
            s.cam.conf.trans_theta, s.cam.conf.trans_emission)
        rng, wi, bsdf, pdf_val, pdf_kind = materials.sample_dir(
            rng, wo, inter.normal, inter.mat)
        return direct + bsdf

    print(f"bounce    {timed(f_bounce, o, d, wl)*1e3:8.2f} ms")

    # --- pool bookkeeping stages (the real loop's non-query work) -----
    # Gated behind PROFILE_POOL=1: the pooliter ground truth compiles and
    # runs a full render, far too heavy for sweep_spectrum's per-combo
    # subprocess calls. Modeled at the PRODUCTION pool geometry: the
    # pooliter render below runs at PROFILE_RENDER_SIZE^2 pixels, whose
    # pool should equal the stage lane count `n` for an apples-to-apples
    # per-iteration compare.
    if not int(os.environ.get("PROFILE_POOL", "0")):
        return
    spp = int(os.environ.get("PROFILE_SPP", "64"))
    rsize = int(os.environ.get("PROFILE_RENDER_SIZE", "512"))
    rn = rsize * rsize
    pool = integrator._pool_size(rn, spp, t_pad if t_pad > 0 else 0)
    m_items = (rn * spp) // pool
    if pool != n:
        print(f"NOTE: render pool {pool} != stage lanes {n}; stage times "
              f"scale ~linearly in lanes")
    lane = jnp.arange(pool, dtype=jnp.int32)

    def f_refill(eps, pix_f):
        """start_samples cost model on P lanes: stream hash + wavelength
        + channel + thin-lens camera ray (integrator.py start_samples)."""
        pix = (pix_f + eps).astype(jnp.uint32)
        hseed = prng.hash_u32(jnp.uint32(0) ^ prng.hash_u32(pix))
        rng = prng.hash_u32(pix ^ hseed)
        rng, wl_, chan = cam_mod.sample_wavelength(rng, s.cam.conf)
        jx = (pix % jnp.uint32(w)).astype(jnp.float32)
        iy = (pix // jnp.uint32(w)).astype(jnp.float32)
        rng, o_new, d_new = cam_mod.sample_ray(
            rng, s.cam, (jnp.float32(w), jnp.float32(h)), jx, iy)
        return wl_ + d_new[0] + o_new[1] + chan.astype(jnp.float32)

    pix_f = lane.astype(jnp.float32)
    print(f"refill    {timed(f_refill, pix_f, reps=64)*1e3:8.2f} ms   "
          f"(pool={pool})")

    rad_st = jnp.zeros((m_items, pool), jnp.float32)
    chan_st = jnp.zeros((m_items, pool), jnp.int8)
    srow = jnp.arange(m_items, dtype=jnp.int32)[:, None]

    def f_store(eps, rad_st, chan_st):
        """finish_samples cost model: the two full-array where-writes
        the P < n path pays every iteration."""
        done = (lane % jnp.int32(m_items))
        ended = (lane % 3) == 0
        sel = (srow == done[None, :]) & ended[None, :]
        rad2 = jnp.where(sel, eps, rad_st)
        chan2 = jnp.where(sel, jnp.int8(1), chan_st)
        return rad2.ravel()[0] + chan2.astype(jnp.float32).ravel()[0]

    print(f"store     {timed(f_store, rad_st, chan_st, reps=64)*1e3:8.2f} ms"
          f"   (m_items={m_items})")

    # --- ground truth: a real pooled render, per iteration ------------
    import functools

    rs = T.init(0, rsize, rsize, 0, tris, tm, mats,
                cam_origin=(0.0, 0.8, 1.8))
    rw, rh = rs.sub_dims

    @functools.partial(jax.jit, static_argnums=(1,))
    def run_pooled(nonce, spp_):
        out = integrator.render_pooled(
            jnp.uint32(0), nonce, rs.scene, rs.cam, rs.ambience, rw, rh,
            rs.transmitter_kind, spp_, "color")
        return out["img"].ravel()[0], out["iters"], out["rays_traced"]

    _ = jax.block_until_ready(run_pooled(jnp.uint32(1), spp))  # warm
    t0 = time.perf_counter()
    v, iters, rays = jax.block_until_ready(run_pooled(jnp.uint32(2), spp))
    dt = time.perf_counter() - t0 - ROUNDTRIP_S
    iters = int(iters)
    occ = float(rays) / (3.0 * pool * iters)
    print(f"pooliter  {dt / iters * 1e3:8.2f} ms   ({rw}x{rh} spp={spp} "
          f"pool={pool} iters={iters} occupancy={occ:.3f} "
          f"e2e={float(rays) / dt / 1e6:.1f} Mrays/s)")


if __name__ == "__main__":
    main()
