"""Headline benchmark: Mrays/sec on 512x512 CornellBox progressive path
tracing with NEE (BASELINE.md config 2, target >50 Mrays/sec/chip).

Counts actual trace queries (closest-hit + the two MIS shadow queries per
live bounce, + primaries) as reported by the integrator, divided by
steady-state wall time on the device jax selects (the real TPU chip under
the driver; CPU when forced).

Timing discipline (docs/PERF.md "measurement pitfalls"): the axon relay
caches executions with identical input buffers, and `block_until_ready`
through the tunnel is not always a true barrier. So the K timed reps run
INSIDE one jit (lax.scan) with per-rep nonce perturbation, the returned
value is a scalar that depends on every rep's image, the base nonce is
fresh per invocation (os.urandom), the timed region is closed by fetching
that scalar to host, and the ~tunnel roundtrip is measured and subtracted.
Values above a physical sanity ceiling are refused (exit 2), never printed.

Prints exactly one JSON line:
  {"metric": "mrays_per_sec", "value": N, "unit": "Mrays/s",
   "vs_baseline": N/50, "achieved_tflops": N, "mfu_pct": N}

achieved_tflops = XLA cost-analysis FLOPs of the timed executable /
steady-state wall time; mfu_pct is that against the chip's bf16 MXU
peak (v5e: 197 TFLOP/s). The intrinsic ceiling is well below 100%:
the intersector matmuls carry K=10/16 coefficient padding and fp32
accuracy via bf16x3 packing (docs/PERF.md "MFU accounting").
"""

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from benchmarks._timing import (SANITY_CEILING_MRAYS,
                                analytic_hw_flops_per_ray, fresh_nonce,
                                peak_tflops, reps_chunk, roundtrip_s)


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


def _require_backend():
    """Fail loudly instead of hanging when the device is unreachable: the
    axon tunnel going down mid-round makes backend init block forever
    inside make_c_api_client (no timeout at the PJRT layer), which would
    leave the driver with a hung bench instead of a clean error
    (_watchdog.arm, rc 3, BENCH_INIT_TIMEOUT_S)."""
    import _watchdog

    timeout_s = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "900"))
    done = _watchdog.arm(
        timeout_s,
        f"bench: backend init did not complete within {timeout_s:.0f}s "
        "(device tunnel unreachable?); refusing to hang", rc=3)
    import jax

    devices = jax.devices()
    done.set()
    return devices


def _arm_deadline():
    """Whole-run deadline: backend init has its own watchdog, but the
    tunnel can also die mid-compile (remote compiles of changed code take
    minutes) or mid-execution, leaving the process stuck in C with no
    Python-level recourse. rc 4 instead of a hang (BENCH_TOTAL_TIMEOUT_S;
    normal completion just lets the process exit first)."""
    import _watchdog

    total_s = float(os.environ.get("BENCH_TOTAL_TIMEOUT_S", "3000"))
    _watchdog.arm(
        total_s,
        f"bench: did not complete within {total_s:.0f}s (device tunnel "
        "stalled mid-compile/run?); refusing to hang", rc=4)


def _flops_of(chunk, *args):
    """Total XLA-counted FLOPs of one timed executable (all reps), via
    compiled cost analysis (utils/profiling.compiled_stats pattern);
    None when the backend doesn't report it. On TPU the score matmuls
    live inside the Pallas custom call, which XLA's cost analysis does
    NOT see into — callers fall back to the analytic model below."""
    try:
        cost = chunk.lower(*args).compile().cost_analysis()
        if isinstance(cost, (list, tuple)):
            cost = cost[0] if cost else {}
        f = float(cost.get("flops", 0.0))
        return f if f > 0 else None
    except Exception:
        return None


def main():
    import _cpu_pin
    _cpu_pin.maybe_force_from_env()  # JAX_PLATFORMS=cpu actually forces CPU
    _enable_compile_cache()
    _arm_deadline()
    _require_backend()

    size = int(os.environ.get("BENCH_SIZE", "512"))
    spp = int(os.environ.get("BENCH_SPP", "256"))
    reps = int(os.environ.get("BENCH_REPS", "2"))
    passes = int(os.environ.get("BENCH_PASSES", "3"))
    s = build_state(size)

    # reps renders inside ONE executable, scalar-fetch barrier — the
    # shared axon-safe timing chunk (benchmarks/_timing.reps_chunk)
    chunk = reps_chunk(s, spp, reps)

    # compile + warmup (untimed)
    np.asarray(chunk(s.seed, fresh_nonce(), s.scene, s.cam, s.ambience))
    flops = _flops_of(chunk, s.seed, fresh_nonce(), s.scene, s.cam,
                      s.ambience)
    roundtrip = roundtrip_s()

    samples = []
    times = []
    rays = []
    for _ in range(passes):
        nonce0 = fresh_nonce()
        t0 = time.perf_counter()
        out = np.asarray(chunk(s.seed, nonce0, s.scene, s.cam, s.ambience))
        dt = time.perf_counter() - t0
        total_rays = float(out[0])
        mrays = total_rays / max(dt - roundtrip, 1e-9) / 1e6
        samples.append(mrays)
        times.append(max(dt - roundtrip, 1e-9))
        rays.append(total_rays)

    order = np.argsort(samples)
    mid = order[len(order) // 2]
    mrays = samples[mid]  # median over passes
    flops_source = "xla-cost-analysis"
    per_ray, _n_chunks = analytic_hw_flops_per_ray(s.scene)
    if per_ray and (not flops or flops < rays[mid] * per_ray / 10):
        # Pallas custom call hides the MXU work from cost analysis;
        # use the analytic kernel model (docs/PERF.md "MFU accounting").
        # The median pass's OWN ray count pairs with its own wall time
        # (fresh nonces shift Russian-roulette terminations per pass).
        flops = rays[mid] * per_ray
        flops_source = "analytic-mxu-model"
    achieved_tflops = (flops / times[mid] / 1e12) if flops else None
    peak, device_kind = peak_tflops()
    mfu_pct = (100.0 * achieved_tflops / peak
               if achieved_tflops and peak else None)
    if not np.isfinite(mrays) or mrays <= 0 or mrays > SANITY_CEILING_MRAYS:
        print(f"bench: implausible measurement {samples} Mrays/s "
              f"(ceiling {SANITY_CEILING_MRAYS}); refusing to report",
              file=sys.stderr)
        sys.exit(2)

    print(json.dumps({
        "metric": "mrays_per_sec",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / 50.0, 3),
        "achieved_tflops": (round(achieved_tflops, 3)
                            if achieved_tflops else None),
        "mfu_pct": round(mfu_pct, 2) if mfu_pct else None,
        "peak_tflops": peak,
        "device_kind": device_kind,
        "flops_source": flops_source if achieved_tflops else None,
    }))


if __name__ == "__main__":
    main()
