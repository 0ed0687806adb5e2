#!/usr/bin/env python
"""Per-stage timing of one pooled-renderer bounce on a chosen scene.

Times, via the axon-safe pattern (K reps inside one jit with input
perturbation, scalar fetch, minus the ~30ms tunnel roundtrip):
  closest   closest_hit query alone (pallas or XLA path)
  anyhit    any_hit shadow query alone
  interact  closest_interaction (query + material row fetch + eval)
  bounce    the full pooled-renderer body (query + NEE + BSDF + records)

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


def timed(fn, *args):
    """K-rep scan timing with per-rep input perturbation; returns seconds
    per rep (tunnel roundtrip subtracted)."""

    @jax.jit
    def run(eps, args):
        def body(carry, k):
            out = fn(carry, *args)
            return carry + eps * (k + 1), out
        acc, outs = jax.lax.scan(body, jnp.float32(0.0),
                                 jnp.arange(REPS, dtype=jnp.int32))
        return acc + jax.tree_util.tree_reduce(
            lambda a, b: a + b.astype(jnp.float32).ravel()[0], outs,
            jnp.float32(0.0))

    r = run(jnp.float32(1e-7), args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    r = run(jnp.float32(2e-7), args)
    jax.block_until_ready(r)
    dt = time.perf_counter() - t0
    return max(dt - ROUNDTRIP_S, 1e-9) / REPS


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


if __name__ == "__main__":
    main()
