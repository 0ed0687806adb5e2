"""Headline benchmark: Mrays/sec on 512x512 CornellBox progressive path
tracing with NEE (BASELINE.md config 2, target >50 Mrays/sec/chip).

Counts actual trace queries (closest-hit + the two MIS shadow queries per
live bounce, + primaries) as reported by the integrator, divided by
steady-state wall time per frame on the device jax selects (the real TPU
chip under the driver; CPU when forced).

Prints exactly one JSON line:
  {"metric": "mrays_per_sec", "value": N, "unit": "Mrays/s",
   "vs_baseline": N/50}
"""

import json
import os
import sys
import time
from functools import partial

import numpy as np



def _enable_compile_cache():
    """Persistent XLA compile cache: compiles of the pooled render loop
    take minutes through the axon remote-compile tunnel; caching makes
    reruns near-instant (and survives worker restarts)."""
    import jax
    cache = os.environ.get("TRACER_COMPILE_CACHE", "/tmp/tracer_jax_cache")
    if cache:
        try:
            jax.config.update("jax_compilation_cache_dir", cache)
            jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        except Exception:
            pass


def build_state(size):
    import tracer_tpu as T
    from tracer_tpu.utils.objloader import load_obj

    assets = os.environ.get("TRACER_ASSETS", "/root/reference/assets")
    path = os.path.join(assets, "CornellBox-Original.obj")
    if os.path.exists(path):
        tris, tm, mats = load_obj(path)
    else:
        from tracer_tpu.utils.testscenes import cornell_like
        tris, tm, mats = cornell_like()
    return T.init(0, size, size, 0, tris, tm, mats,
                  cam_origin=(0.0, 0.8, 1.8))


def main():
    _enable_compile_cache()
    import jax
    import jax.numpy as jnp
    from tracer_tpu.engine import integrator

    size = int(os.environ.get("BENCH_SIZE", "512"))
    spp = int(os.environ.get("BENCH_SPP", "256"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    s = build_state(size)
    w, h = s.sub_dims

    @jax.jit
    def chunk(seed, nonce, scene, cam, ambience):
        out = integrator.render_pooled(
            seed, nonce, scene, cam, ambience, w, h, s.transmitter_kind,
            spp, s.render_mode)
        return out["img"], out["rays_traced"]

    # compile + warmup
    img, rays = chunk(s.seed, s.nonce, s.scene, s.cam, s.ambience)
    jax.block_until_ready(img)

    outs = []
    t0 = time.perf_counter()
    for k in range(reps):
        outs.append(chunk(s.seed, s.nonce + np.uint32(1 + k * spp),
                          s.scene, s.cam, s.ambience))
    jax.block_until_ready(outs[-1][0])
    dt = time.perf_counter() - t0
    # device fetches cost a ~30ms tunnel roundtrip each; keep them
    # outside the timed region
    total_rays = sum(int(rays) for _, rays in outs)

    mrays = total_rays / dt / 1e6
    print(json.dumps({
        "metric": "mrays_per_sec",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 50.0, 3),
    }))


if __name__ == "__main__":
    main()
