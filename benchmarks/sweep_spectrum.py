#!/usr/bin/env python
"""Knob sweep for the spectrum config's query kernels (VERDICT round-1
item 4: SpectrumSphere 512x512/64spp >= 60 Mrays/s).

Runs benchmarks/profile_bounce.py on SpectrumSphere at the pooled
renderer's actual lane count for that config (integrator._pool_size ->
65536) under each knob combo, in a fresh subprocess per combo (the
knobs are read at trace time, and a fresh process guarantees no stale
executable reuse). Prints a per-combo table of closest/anyhit/bounce
times.

Usage: python benchmarks/sweep_spectrum.py [--lanes 65536] [--combos all]
"""

from __future__ import annotations

import argparse
import os
import re
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

COMBOS = [
    ("baseline", {}),
    ("recip", {"TRACER_APPROX_RECIP": "1"}),
    ("tile1024", {"TRACER_TILE_N": "1024"}),
    ("tile1024+recip", {"TRACER_TILE_N": "1024", "TRACER_APPROX_RECIP": "1"}),
    ("tile4096", {"TRACER_TILE_N": "4096"}),
    ("chunk512", {"TRACER_CHUNK_T": "512"}),
    ("chunk1024", {"TRACER_CHUNK_T": "1024"}),
    ("chunk256", {"TRACER_CHUNK_T": "256"}),
    ("tile512", {"TRACER_TILE_N": "512"}),
    # finer culling granularity: incoherent bounce rays defeat the
    # chunk cull at the default 256-tri chunks / 2048-lane tiles, and
    # both knobs trade fixed overhead for cull selectivity
    ("chunk128", {"TRACER_CHUNK_T": "128"}),
    ("chunk64", {"TRACER_CHUNK_T": "64"}),
    ("chunk128+recip", {"TRACER_CHUNK_T": "128",
                        "TRACER_APPROX_RECIP": "1"}),
    # schedule_stats.py model (CPU, real captured pooled-loop ray mix):
    # MXU/epilogue element-work is nearly FLAT across granularity
    # (0.82-1.08 Gelem, min at c64/t256) because bounce rays on this
    # scene reach ~every chunk — so granularity is a <=15% lever and
    # the winning stack is expected to be recip + modest granularity +
    # pool. These crosses chase that prediction:
    ("chunk64+recip", {"TRACER_CHUNK_T": "64",
                       "TRACER_APPROX_RECIP": "1"}),
    ("chunk64+tile512", {"TRACER_CHUNK_T": "64",
                         "TRACER_TILE_N": "512"}),
    ("chunk64+tile256+recip", {"TRACER_CHUNK_T": "64",
                               "TRACER_TILE_N": "256",
                               "TRACER_APPROX_RECIP": "1"}),
    ("tile512+chunk128", {"TRACER_TILE_N": "512",
                          "TRACER_CHUNK_T": "128"}),
    ("tile512+chunk128+recip", {"TRACER_TILE_N": "512",
                                "TRACER_CHUNK_T": "128",
                                "TRACER_APPROX_RECIP": "1"}),
    ("tile512+recip", {"TRACER_TILE_N": "512",
                       "TRACER_APPROX_RECIP": "1"}),
    ("tile256", {"TRACER_TILE_N": "256"}),
    # anyhit-only small tiles: shadow queries are ~90% NEE-masked on
    # this scene and tight-tmax, so their element-work scales 3x with
    # tile size while closest is flat (schedule_stats) — shrink ONLY
    # the anyhit tile and keep closest at its best size
    ("anyT256", {"TRACER_TILE_N_ANY": "256"}),
    ("anyT512", {"TRACER_TILE_N_ANY": "512"}),
    ("anyT256+recip", {"TRACER_TILE_N_ANY": "256",
                       "TRACER_APPROX_RECIP": "1"}),
    ("chunk64+anyT256+recip", {"TRACER_CHUNK_T": "64",
                               "TRACER_TILE_N_ANY": "256",
                               "TRACER_APPROX_RECIP": "1"}),
    # pool-size combos only make sense end-to-end (--e2e): they change
    # the integrator's iteration structure, not the query kernels
    ("pool32k", {"TRACER_POOL_TARGET": "32768"}),
    ("pool65k", {"TRACER_POOL_TARGET": "65536"}),
    ("pool131k", {"TRACER_POOL_TARGET": "131072"}),
    ("pool262k", {"TRACER_POOL_TARGET": "262144"}),
    # pool x kernel-knob crosses (e2e): the best pool size may shift the
    # best tile/chunk granularity with it
    ("pool131k+recip", {"TRACER_POOL_TARGET": "131072",
                        "TRACER_APPROX_RECIP": "1"}),
    ("pool131k+tile1024", {"TRACER_POOL_TARGET": "131072",
                           "TRACER_TILE_N": "1024"}),
    ("pool262k+recip", {"TRACER_POOL_TARGET": "262144",
                        "TRACER_APPROX_RECIP": "1"}),
    ("pool262k+tile1024+recip", {"TRACER_POOL_TARGET": "262144",
                                 "TRACER_TILE_N": "1024",
                                 "TRACER_APPROX_RECIP": "1"}),
    ("pool131k+chunk512", {"TRACER_POOL_TARGET": "131072",
                           "TRACER_CHUNK_T": "512"}),
    # boundary-only ray permutation at the closest query (round-3
    # VERDICT "Next #2a"; intersect._permuted_closest): lanes sort by a
    # coherence key around the kernel call only — lane state never
    # moves. e2e because the sort cost rides the whole pooled loop.
    ("perm_oct", {"TRACER_PERM_RAYS": "oct"}),
    ("perm_dmorton", {"TRACER_PERM_RAYS": "dmorton"}),
    ("perm_odmorton", {"TRACER_PERM_RAYS": "odmorton"}),
    # coherent/incoherent sub-batch split (round-3 VERDICT "Next #2b"):
    # two complementary tmax-masked closest calls per bounce, primaries
    # vs bounce rays, each optionally at its own tile size
    ("split", {"TRACER_SPLIT_PRIMARY": "1"}),
    ("split2048_512", {"TRACER_SPLIT_PRIMARY": "2048,512"}),
    ("split2048_256", {"TRACER_SPLIT_PRIMARY": "2048,256"}),
    # sorted tiles only pay at FINE granularity (best-t walk sim:
    # odmorton cuts closest element-work 1.4% at c256/t2048 but 46% at
    # c64/t256); these crosses test whether that reverses the measured
    # e2e loss of fine tiles (8x per-tile fixed work)
    ("perm_odm+c64t256", {"TRACER_PERM_RAYS": "odmorton",
                          "TRACER_CHUNK_T": "64",
                          "TRACER_TILE_N": "256"}),
    ("c64t256", {"TRACER_CHUNK_T": "64", "TRACER_TILE_N": "256"}),
    ("perm_odm+c64t512", {"TRACER_PERM_RAYS": "odmorton",
                          "TRACER_CHUNK_T": "64",
                          "TRACER_TILE_N": "512"}),
    # anyhit-side permutation (TRACER_PERM_ANY): dead-lane grouping +
    # direction key for the ~90%-NEE-masked shadow queries
    ("permany_odm", {"TRACER_PERM_ANY": "odmorton"}),
    ("perm_both_odm", {"TRACER_PERM_RAYS": "odmorton",
                       "TRACER_PERM_ANY": "odmorton"}),
    # ring work-stealing (e2e only — a pure schedule change): default is
    # STEAL_D=4; steal0 isolates its win, steal6 checks deeper reach,
    # and pool crosses test whether stealing moves the best pool UP
    # (occupancy no longer taxes big pools; CPU replay: occ 0.84 -> 0.95+
    # at the production m=256)
    ("steal0", {"TRACER_STEAL_D": "0"}),
    ("steal6", {"TRACER_STEAL_D": "6"}),
    ("pool131k+steal6", {"TRACER_POOL_TARGET": "131072",
                         "TRACER_STEAL_D": "6"}),
    ("pool262k+steal6+recip", {"TRACER_POOL_TARGET": "262144",
                               "TRACER_STEAL_D": "6",
                               "TRACER_APPROX_RECIP": "1"}),
]


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=65536)
    ap.add_argument("--scene", default="SpectrumSphere")
    ap.add_argument("--combos", default="all",
                    help="comma-separated combo names, or 'all'")
    ap.add_argument("--timeout", type=int, default=560)
    ap.add_argument("--e2e", action="store_true",
                    help="measure a full config render (run_all's "
                         "nonce-scan worker) instead of isolated queries")
    ap.add_argument("--config", type=int, default=4,
                    help="run_all config id for --e2e (default 4: the "
                         "spectrum config this sweep was built for)")
    args = ap.parse_args()

    if args.e2e:
        sys.path.insert(0, os.path.join(ROOT, "benchmarks"))
        import run_all

    want = None if args.combos == "all" else set(args.combos.split(","))
    for name, env in COMBOS:
        if want is not None and name not in want:
            continue
        integ_only = {"TRACER_POOL_TARGET", "TRACER_STEAL_D"} & set(env)
        if integ_only and not args.e2e and want is None:
            # pool size / work-stealing only affect the integrator's
            # iteration structure; profile_bounce never reads them, so in
            # the default query-level sweep these rows would just
            # re-measure their knob-less twin under a misleading label
            # (and burn TPU minutes doing it).
            print(f"{name:16s}  SKIPPED (integrator combos need --e2e)",
                  flush=True)
            continue
        full = dict(os.environ, **env)
        if args.e2e:
            cfg = dict(run_all.CONFIGS[args.config])
            code = run_all._WORKER.format(root=ROOT, cfg=cfg)
            try:
                proc = subprocess.run([sys.executable, "-c", code],
                                      capture_output=True, text=True,
                                      timeout=args.timeout, env=full)
            except subprocess.TimeoutExpired:
                print(f"{name:16s}  TIMEOUT", flush=True)
                continue
            line = next((l for l in proc.stdout.splitlines()
                         if l.startswith("BENCH_RESULT ")), None)
            if line:
                import json
                res = json.loads(line[len("BENCH_RESULT "):])
                print(f"{name:16s}  {res['value']:8.2f} {res['unit']}  "
                      f"img_mean {res.get('img_mean', '-')}", flush=True)
            else:
                print(f"{name:16s}  ERROR  {proc.stderr[-200:]}", flush=True)
            continue
        try:
            proc = subprocess.run(
                [sys.executable,
                 os.path.join(ROOT, "benchmarks", "profile_bounce.py"),
                 args.scene, str(args.lanes)],
                capture_output=True, text=True, timeout=args.timeout,
                env=full)
            out = proc.stdout
        except subprocess.TimeoutExpired:
            print(f"{name:16s}  TIMEOUT", flush=True)
            continue
        ms = dict(re.findall(r"(closest|anyhit|interact|bounce)\s+"
                             r"([0-9.]+) ms", out))
        if not ms:
            print(f"{name:16s}  ERROR  {proc.stderr[-200:]}", flush=True)
            continue
        print(f"{name:16s}  closest {ms.get('closest', '?'):>8s}  "
              f"anyhit {ms.get('anyhit', '?'):>8s}  "
              f"interact {ms.get('interact', '?'):>8s}  "
              f"bounce {ms.get('bounce', '?'):>8s}", flush=True)


if __name__ == "__main__":
    main()
