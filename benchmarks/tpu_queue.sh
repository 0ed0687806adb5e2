#!/bin/bash
# Sequential TPU work queue for when the axon tunnel returns after an
# outage (docs/PERF.md "Availability note"). Runs every blocked
# measurement strictly one-at-a-time (concurrent device use corrupts
# numbers — CLAUDE.md hard rule), each step logged + bounded, later
# steps still run if an earlier one fails. Fire with:
#     bash benchmarks/tpu_queue.sh
# Logs land in /tmp/tpuq/NN-name.log; interpret sweep winners by hand.
set -u
cd "$(dirname "$0")/.."
mkdir -p /tmp/tpuq

step() {  # step <num> <name> <timeout_s> <cmd...>
  local num="$1" name="$2" tmo="$3"; shift 3
  local log="/tmp/tpuq/${num}-${name}.log"
  echo "=== [$num] $name ($(date -u +%H:%M:%S)) -> $log"
  # -k: a process stuck in a PJRT C call ignores SIGTERM (docs/PERF.md
  # "availability note") — follow up with SIGKILL so the queue advances
  timeout -k 15 "$tmo" "$@" >"$log" 2>&1
  local rc=$?
  echo "=== [$num] $name done rc=$rc ($(date -u +%H:%M:%S))"
  tail -2 "$log"
}

# 0. Abort everything if the tunnel is still down (fast matmul probe).
if ! timeout -s KILL 180 python -c "
import jax, jax.numpy as jnp
x = jnp.ones((128,128)); (x@x).block_until_ready(); print('TPU OK')
" >/tmp/tpuq/00-probe.log 2>&1; then
  echo "probe failed — tunnel still down"; exit 3
fi
echo "probe ok"

# 0b. Hardware approx-reciprocal error (pins APPROX_RECIP_REL on the
#     real TPU — interpret mode was measured at 2^-8.001; see
#     intersect_kernel.APPROX_RECIP_REL).
step 0b recip-err 600 python benchmarks/measure_recip.py
# 1. Warm bench sanity (first run after the timing-sink change
#    cold-compiles: minutes through the remote-compile tunnel).
step 01 bench64 3200 env BENCH_SPP=64 python bench.py
# 2. Headline at default spp (what the driver captures) — now with ring
#    stealing on by default — then the steal0 A/B (CPU schedule replay
#    predicts ~14% fewer iterations at cornell-256's occupancy 0.863).
step 02 bench256 3200 python bench.py
step 02b bench256-steal0 3200 env TRACER_STEAL_D=0 python bench.py
# 3. Big-scene validation: x6 scores + two-level cull at 2.23M tris
#    (VERDICT #5 done-criterion: hit-for-hit vs the XLA oracle on TPU).
step 03 bigscene-l4 3000 python benchmarks/bigscene_check.py --levels 4
# 4. Refresh all config numbers with the current code (BENCH_ALL.json).
step 04 runall-1234 3600 python benchmarks/run_all.py --configs 1,2,3,4 --timeout 840
step 05 runall-5 1800 python benchmarks/run_all.py --configs 5 --timeout 840
# 5. Per-iteration attribution on the spectrum config: stage sum vs the
#    real pooled loop (pooliter), at the production pool lane count.
step 06 profile-spectrum 2400 env PROFILE_POOL=1 python benchmarks/profile_bounce.py SpectrumSphere 65536
# 6. Spectrum knob sweeps (kernel knobs, then pool combos end-to-end);
#    winners get folded into code defaults by hand afterwards.
step 07 sweep-kernel 7200 python benchmarks/sweep_spectrum.py
step 08 sweep-e2e 7200 python benchmarks/sweep_spectrum.py --e2e
# 7. README artifact for the redesigned prism scene (through-prism
#    dispersion band; see docs/PARITY.md "Prism comparison").
step 09 prism-doc 1200 python benchmarks/render_doc_images.py --spp 2048

echo "queue complete ($(date -u +%H:%M:%S)); logs in /tmp/tpuq/"
