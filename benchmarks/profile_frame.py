#!/usr/bin/env python
"""Per-stage decomposition of the interactive 1-spp frame (config 7).

Round-4 measured the reference's flagship loop (liblys.c:104-123) at
6.48 fps end-to-end / ~130 ms compute per 800x600 1-spp frame — ~8x the
~15 ms its ~3M trace queries cost at the headline 273 Mrays/s. This
pins down where the rest goes, axon-safe (reps inside one jit with
nonce perturbation, scalar fetch, tunnel roundtrip subtracted):

  step @ pool P   render_pooled alone at several TRACER_POOL_TARGET
                  settings -> ms/frame, loop iterations, ms/iter,
                  Mrays/s. The default policy gives P=240000 with
                  m_items=2: the bounce tail then runs ~30 full-width
                  iterations with few live lanes (the occupancy
                  hypothesis this sweep tests).
  argb            _render_core ARGB pack alone
  loop modes      in-process viewer-loop timings over real dispatches:
                  A  step;render per frame, ONE fetch at the end
                     (pure exec+dispatch pipeline cost)
                  B  step;render;fetch per frame (the config-7 loop)
                  C  fused step+render in one executable, fetch/frame
                  D  pipelined: fetch frame k-1's ARGB while frame k
                     computes (one-frame display latency)

Usage: python benchmarks/profile_frame.py [W H] [--pools 262144,60000]
  (defaults 800 600 — the config-7 operating point)
"""

import argparse
import os
import sys
import time

os.environ.setdefault("TRACER_COMPILE_CACHE", "/tmp/tracer_jax_cache")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _cpu_pin

_cpu_pin.maybe_force_from_env()

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.environ["TRACER_COMPILE_CACHE"])
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import tracer_tpu as T
from tracer_tpu.engine import integrator
from tracer_tpu.engine.api import _render_core
from tracer_tpu.utils.objloader import load_obj
from benchmarks._timing import fresh_nonce, roundtrip_s

DEFAULT_SCENE = "CornellBox-Original"


def time_pooled(s, w, h, frames, rt, pool_target=None):
    """ms/frame + iters + Mrays/s of the bare 1-spp pooled render at a
    given TRACER_POOL_TARGET (None = policy default)."""
    old = os.environ.pop("TRACER_POOL_TARGET", None)
    if pool_target is not None:
        os.environ["TRACER_POOL_TARGET"] = str(pool_target)
    try:
        pool = integrator._pool_size(w * h, 1,
                                     integrator._scene_t_pad(s.scene))

        @jax.jit
        def steps(nonce0):
            def body(carry, k):
                out = integrator.render_pooled(
                    jnp.uint32(0), nonce0 + k, s.scene, s.cam, s.ambience,
                    w, h, s.transmitter_kind, 1, "color")
                return (carry[0] + jnp.mean(out["img"]),
                        carry[1] + out["iters"],
                        carry[2] + out["rays_traced"].astype(jnp.float32)), None
            carry, _ = jax.lax.scan(
                body, (jnp.float32(0.0), jnp.int32(0), jnp.float32(0.0)),
                jnp.arange(frames, dtype=jnp.uint32))
            return jnp.stack([carry[0], carry[1].astype(jnp.float32),
                              carry[2]])

        np.asarray(steps(fresh_nonce()))  # compile + warm
        t0 = time.perf_counter()
        out = np.asarray(steps(fresh_nonce()))
        dt = max(time.perf_counter() - t0 - rt, 1e-9) / frames
        iters = float(out[1]) / frames
        rays = float(out[2]) / frames
        return dict(ms=dt * 1e3, pool=pool, iters=iters,
                    ms_per_iter=dt * 1e3 / max(iters, 1),
                    mrays=rays / dt / 1e6)
    finally:
        os.environ.pop("TRACER_POOL_TARGET", None)
        if old is not None:
            os.environ["TRACER_POOL_TARGET"] = old


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("dims", nargs="*", type=int, default=[800, 600])
    ap.add_argument("--scene", default=DEFAULT_SCENE,
                    help="asset OBJ name (e.g. SpectrumSphereHigh for "
                         "the orbit operating point)")
    ap.add_argument("--pools", default="0,480000,120000,60000,30000,16000",
                    help="TRACER_POOL_TARGET sweep (0 = policy default)")
    ap.add_argument("--frames", type=int, default=8)
    ap.add_argument("--loop-frames", type=int, default=16)
    ap.add_argument("--no-loop", action="store_true",
                    help="pool sweep + argb only (skip the viewer-loop "
                         "dispatch modes)")
    args = ap.parse_args()
    w, h = (args.dims + [800, 600])[:2]

    assets = os.environ.get("TRACER_ASSETS", "/root/reference/assets")
    tris, tm, mats = load_obj(os.path.join(assets, args.scene + ".obj"))
    s = T.init(0, h, w, 0, tris, tm, mats, cam_origin=(0.0, 0.8, 1.8))
    rt = roundtrip_s()
    print(f"scene={args.scene} {w}x{h} backend={jax.default_backend()} "
          f"roundtrip={rt * 1000:.1f}ms")

    # ---- pooled step at each pool target -------------------------------
    print(f"{'pool_target':>12} {'pool':>8} {'ms/frame':>9} {'iters':>6} "
          f"{'ms/iter':>8} {'Mrays/s':>8}")
    for tgt in [int(x) for x in args.pools.split(",")]:
        r = time_pooled(s, w, h, args.frames, rt,
                        pool_target=tgt if tgt else None)
        name = str(tgt) if tgt else "default"
        print(f"{name:>12} {r['pool']:>8} {r['ms']:>9.1f} {r['iters']:>6.0f} "
              f"{r['ms_per_iter']:>8.2f} {r['mrays']:>8.1f}", flush=True)

    # ---- ARGB pack alone ----------------------------------------------
    img0 = jnp.zeros((h, w, 3), jnp.float32)

    @jax.jit
    def argbs(eps):
        def body(acc, k):
            fb = _render_core(img0 + eps * (k + 1).astype(jnp.float32),
                              w, h, 1)
            return acc + fb[0, 0].astype(jnp.float32), None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(args.frames, dtype=jnp.int32))
        return acc

    np.asarray(argbs(jnp.float32(1e-7)))
    t0 = time.perf_counter()
    np.asarray(argbs(jnp.float32(2e-7)))
    t_argb = max(time.perf_counter() - t0 - rt, 1e-9) / args.frames
    print(f"{'argb pack':>12} {'':>8} {t_argb * 1e3:>9.2f}")
    if args.no_loop:
        return

    # ---- viewer-loop modes over real dispatches ------------------------
    LF = args.loop_frames

    def mode_a():          # step;render per frame, one fetch at the end
        st = s.replace(nonce=s.nonce + fresh_nonce())
        fb = None
        t0 = time.perf_counter()
        for _ in range(LF):
            st = T.step(st)
            fb = T.render(st)
        np.asarray(fb)
        return (time.perf_counter() - t0 - rt) / LF

    def mode_b():          # the config-7 loop: fetch every frame
        st = s.replace(nonce=s.nonce + fresh_nonce())
        t0 = time.perf_counter()
        for _ in range(LF):
            st = T.step(st)
            np.asarray(T.render(st))
        return (time.perf_counter() - t0) / LF

    from tracer_tpu.engine.api import step_render
    def mode_c():          # fused step+render, fetch every frame
        st = s.replace(nonce=s.nonce + fresh_nonce())
        t0 = time.perf_counter()
        for _ in range(LF):
            st, fb = step_render(st)
            np.asarray(fb)
        return (time.perf_counter() - t0) / LF

    def mode_d():          # pipelined: fetch k-1 while k computes
        st = s.replace(nonce=s.nonce + fresh_nonce())
        st, fb_prev = step_render(st)
        t0 = time.perf_counter()
        for _ in range(LF):
            st, fb = step_render(st)
            np.asarray(fb_prev)   # overlap: previous frame's download
            fb_prev = fb
        np.asarray(fb_prev)
        return (time.perf_counter() - t0) / LF

    # warm every mode's executables (step/render warmed above via modes)
    for name, fn in [("A step;render, 1 fetch", mode_a),
                     ("B +fetch/frame (cfg 7)", mode_b),
                     ("C fused, fetch/frame", mode_c),
                     ("D fused, pipelined", mode_d)]:
        fn()                       # warm (compile + relay caches primed)
        dt = fn()
        print(f"{name:<24} {dt * 1e3:>8.1f} ms/frame  "
              f"({1.0 / dt:>5.1f} fps)", flush=True)


if __name__ == "__main__":
    main()
