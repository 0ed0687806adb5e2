#!/usr/bin/env python
"""Per-stage decomposition of the orbit frame (BASELINE config 5).

The orbit config fuses per-frame dense-accel rebuild + camera turn +
1-spp progressive step into one executable (benchmarks/run_all.py);
round-3 shipped its fps with no decomposition. This times, axon-safe
(reps inside one jit with input perturbation, scalar fetch, tunnel
roundtrip subtracted):

  rebuild   intersect.build_dense alone (morton sort + coeffs + chunk
            AABBs) at the scene's size
  step      the 1-spp pooled render alone on a FIXED accel (the frame's
            query+shade+store work), / its own iteration counter too
  accum     the EMA frame merge (accumulate_color) alone
  fused     the production orbit_frame (rebuild + turn + step fused),
            the number run_all times — fused < rebuild + step when XLA
            overlaps the rebuild with early iterations

Usage: python benchmarks/profile_orbit.py [size] [frames]
  (defaults 1024, 16 — the config-5 operating point)
"""

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
from tracer_tpu.engine.api import _step_core
from tracer_tpu.ops import intersect
from tracer_tpu.utils.objloader import load_obj
from benchmarks._timing import fresh_nonce, roundtrip_s

SCENE = "SpectrumSphereHigh"


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    frames = int(sys.argv[2]) if len(sys.argv) > 2 else 16
    assets = os.environ.get("TRACER_ASSETS", "/root/reference/assets")
    tris, tm, mats = load_obj(os.path.join(assets, SCENE + ".obj"))
    s = T.init(0, size, size, 0, tris, tm, mats,
               cam_origin=(0.0, 0.8, 1.8))
    w, h = s.sub_dims
    rt = roundtrip_s()
    print(f"scene={SCENE} tris={tris.shape[0]} {w}x{h} "
          f"backend={jax.default_backend()} roundtrip={rt * 1000:.1f}ms")

    # ---- rebuild alone -------------------------------------------------
    @jax.jit
    def rebuilds(eps):
        def body(acc, k):
            a = intersect.build_dense(
                s.scene.tris + eps * (k + 1).astype(jnp.float32),
                aux=s.scene.mat_ix.astype(jnp.float32))
            return acc + a.coeffs.ravel()[0] + a.chunk_bounds.ravel()[0], None
        acc, _ = jax.lax.scan(body, jnp.float32(0.0),
                              jnp.arange(frames, dtype=jnp.int32))
        return acc

    np.asarray(rebuilds(jnp.float32(1e-7)))
    t0 = time.perf_counter()
    np.asarray(rebuilds(jnp.float32(2e-7)))
    t_rebuild = max(time.perf_counter() - t0 - rt, 1e-9) / frames

    # ---- 1-spp pooled step alone (fixed accel) -------------------------
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
        return jnp.stack([carry[0], carry[1].astype(jnp.float32), carry[2]])

    np.asarray(steps(fresh_nonce()))
    t0 = time.perf_counter()
    out = np.asarray(steps(fresh_nonce()))
    t_step = max(time.perf_counter() - t0 - rt, 1e-9) / frames
    iters = float(out[1]) / frames
    rays = float(out[2]) / frames

    # ---- accumulation merge alone --------------------------------------
    img0 = jnp.zeros((h, w, 3), jnp.float32)

    @jax.jit
    def accums(eps):
        def body(acc, k):
            m = integrator.accumulate_color(
                acc, img0 + eps * (k + 1).astype(jnp.float32),
                k.astype(jnp.uint32))
            return m, None
        acc, _ = jax.lax.scan(body, img0,
                              jnp.arange(frames, dtype=jnp.int32))
        return acc.ravel()[0]

    np.asarray(accums(jnp.float32(1e-7)))
    t0 = time.perf_counter()
    np.asarray(accums(jnp.float32(2e-7)))
    t_accum = max(time.perf_counter() - t0 - rt, 1e-9) / frames

    # ---- the production fused orbit frame ------------------------------
    orbit_r = float(np.hypot(0.0, 1.8))

    @jax.jit
    def orbit_frame(st):
        accel = intersect.build_dense(
            st.scene.tris, aux=st.scene.mat_ix.astype(jnp.float32))
        yaw = jnp.mod(st.cam.yaw + 0.05, jnp.float32(2.0 * np.pi))
        origin = jnp.stack([-orbit_r * jnp.sin(yaw), st.cam.origin[1],
                            orbit_r * jnp.cos(yaw)])
        st = st.replace(scene=st.scene._replace(accel=accel),
                        cam=st.cam._replace(yaw=yaw, origin=origin))
        return _step_core(st)

    st = orbit_frame(s)
    np.asarray(st.img)
    st = s.replace(nonce=s.nonce + fresh_nonce())
    t0 = time.perf_counter()
    for _ in range(frames):
        st = orbit_frame(st)
    np.asarray(st.img)
    t_fused = max(time.perf_counter() - t0 - rt, 1e-9) / frames

    pool = integrator._pool_size(w * h, 1,
                                 integrator._scene_t_pad(s.scene))
    print(f"{'stage':>10} {'ms/frame':>10}")
    print(f"{'rebuild':>10} {t_rebuild * 1e3:>10.1f}")
    print(f"{'step':>10} {t_step * 1e3:>10.1f}   "
          f"(pool={pool} iters={iters:.0f} "
          f"-> {t_step / max(iters, 1) * 1e3:.2f} ms/iter, "
          f"{rays / t_step / 1e6:.1f} Mrays/s)")
    print(f"{'accum':>10} {t_accum * 1e3:>10.1f}")
    print(f"{'sum':>10} {(t_rebuild + t_step + t_accum) * 1e3:>10.1f}")
    print(f"{'fused':>10} {t_fused * 1e3:>10.1f}   "
          f"({1.0 / t_fused:.2f} fps; dispatch/overlap delta = "
          f"{(t_fused - t_rebuild - t_step - t_accum) * 1e3:+.1f} ms)")


if __name__ == "__main__":
    main()
