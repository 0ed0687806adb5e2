#!/usr/bin/env python
"""Multi-chip scaling benchmark: the pooled wavefront renderer over a
(tile, sample) jax.sharding Mesh (SURVEY §2.4 — image rows shard over
the tile axis, spp replicas pmean over the sample axis, collectives on
ICI). On real multi-chip hardware this measures scaling; under
JAX_PLATFORMS=cpu it runs the identical shard_map code path on a
virtual host mesh (mechanism + executable-cache validation — CPU
numbers say nothing about TPU perf and are labeled by platform).

Prints one JSON line per mesh size plus a final scaling summary:
  {"metric": "samples_per_sec", "devices": N, "mesh": "4x2", ...}

Timing discipline matches bench.py (docs/PERF.md pitfalls): fresh nonce
per repetition (the relay caches identical-input executions), fetch of
the result image as the barrier, tunnel roundtrip subtracted.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import _cpu_pin
import _watchdog

_cpu_pin.maybe_force_from_env(8)

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="CornellBox-Original")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--reps", type=int, default=3)
    ap.add_argument("--meshes", default="1,2,4,8",
                    help="comma-separated device counts to bench")
    args = ap.parse_args()

    timeout_s = float(os.environ.get("BENCH_INIT_TIMEOUT_S", "900"))
    done = _watchdog.arm(
        timeout_s,
        f"bench_multichip: backend init did not complete within "
        f"{timeout_s:.0f}s (device tunnel unreachable?); refusing to hang",
        rc=3)
    import jax

    n_dev = len(jax.devices())
    done.set()

    import tracer_tpu as T
    from benchmarks._timing import fresh_nonce, roundtrip_s
    from tracer_tpu.parallel import render as par
    from tracer_tpu.utils.objloader import load_obj

    assets = os.environ.get("TRACER_ASSETS", "/root/reference/assets")
    tris, tm, mats = load_obj(os.path.join(assets, args.scene + ".obj"))
    s = T.init(0, args.size, args.size, 0, tris, tm, mats,
               cam_origin=(0.0, 0.8, 1.8))
    w, h = s.sub_dims
    platform = jax.default_backend()

    results = []
    for m in [int(x) for x in args.meshes.split(",")]:
        if m > n_dev:
            print(json.dumps({"devices": m, "skipped":
                              f"only {n_dev} {platform} devices"}))
            continue
        n_sample = 2 if m % 2 == 0 and m >= 4 else 1
        n_tile = m // n_sample
        mesh = par.make_mesh(n_tile, n_sample)

        np.asarray(par.render_pooled_sharded(s, mesh, args.spp))  # warm
        rt = roundtrip_s()
        t0 = time.perf_counter()
        for _ in range(args.reps):
            s2 = s.replace(nonce=s.nonce + fresh_nonce())
            np.asarray(par.render_pooled_sharded(s2, mesh, args.spp))
        dt = time.perf_counter() - t0 - rt * args.reps
        sps = w * h * args.spp * args.reps / max(dt, 1e-9)
        rec = {"metric": "samples_per_sec", "devices": m,
               "mesh": f"{n_tile}x{n_sample}", "platform": platform,
               "size": args.size, "spp": args.spp,
               "value": round(sps, 1)}
        results.append(rec)
        print(json.dumps(rec), flush=True)

    if len(results) >= 2:
        base = results[0]
        top = results[-1]
        eff = (top["value"] / base["value"]) / (top["devices"]
                                                / base["devices"])
        print(json.dumps({
            "metric": "scaling_efficiency",
            "from_devices": base["devices"], "to_devices": top["devices"],
            "speedup": round(top["value"] / base["value"], 2),
            "efficiency": round(eff, 3), "platform": platform}))


if __name__ == "__main__":
    main()
