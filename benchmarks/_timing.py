"""Axon-relay-safe timing primitives shared by bench.py and
benchmarks/run_all.py.

The discipline (docs/PERF.md "measurement pitfalls"): the relay caches
executions with identical input buffers and `block_until_ready` through
the tunnel is not always a true barrier, so every timed region must (a)
use a fresh base nonce per invocation, (b) be closed by fetching a value
that depends on the computation to host, and (c) subtract the measured
tunnel roundtrip. Keeping the helpers in ONE module stops the two bench
entry points from drifting apart.
"""

import os
import struct
import time

import numpy as np

# One v5e chip cannot exceed ~5 Grays/s on this workload; anything above
# is a caching/timing artifact and must never reach the driver.
SANITY_CEILING_MRAYS = 5000.0


def fresh_nonce() -> np.uint32:
    """Base nonce from os.urandom so repeated bench invocations never
    replay a relay-cached execution (identical inputs -> cached result)."""
    return np.uint32(struct.unpack("<I", os.urandom(4))[0] | 1)


def reps_chunk(state, spp: int, reps: int):
    """The timed executable both bench entry points share: `reps`
    back-to-back pooled renders inside ONE jit (lax.scan) with per-rep
    nonce perturbation, returning jnp.stack([total_rays, img_mean_sum])
    — scalars that depend on every rep's image, so fetching them to host
    is a true barrier and no rep can be served from the relay's
    identical-input execution cache.

    Call as chunk(seed, nonce0, scene, cam, ambience); divide element 1
    by reps for the mean image value (a cheap render-sanity readout)."""
    import jax
    import jax.numpy as jnp

    from tracer_tpu.engine import integrator

    w, h = state.sub_dims

    @jax.jit
    def chunk(seed, nonce0, scene, cam, ambience):
        def body(carry, k):
            rays_acc, sink = carry
            out = integrator.render_pooled(
                seed, nonce0 + k * np.uint32(spp), scene, cam, ambience,
                w, h, state.transmitter_kind, spp, state.render_mode)
            return (rays_acc + out["rays_traced"].astype(jnp.float32),
                    sink + jnp.mean(out["img"])), None

        carry, _ = jax.lax.scan(
            body, (jnp.float32(0.0), jnp.float32(0.0)),
            jnp.arange(reps, dtype=jnp.uint32))
        return jnp.stack(carry)

    return chunk


def peak_tflops():
    """(peak bf16 TFLOP/s, device_kind) for the device jax selected; peak
    is None when the platform has no published peak in the table (CPU
    runs, unknown TPU generations) — callers omit mfu_pct rather than
    compute it against a guessed chip."""
    import jax

    d = jax.devices()[0]
    if d.platform != "tpu":
        return None, d.device_kind
    kind = d.device_kind.lower()
    # bf16 dense peaks, TFLOP/s per chip (public spec sheets)
    table = {"v5 lite": 197.0, "v5litepod": 197.0, "v5e": 197.0,
             "v5p": 459.0, "v4": 275.0, "v6 lite": 918.0,
             "v6e": 918.0}
    for key, val in table.items():
        if key in kind:
            return val, d.device_kind
    return None, d.device_kind


def analytic_hw_flops_per_ray(scene):
    """Hardware MXU flops per trace query per lane: the K-packed score
    matmul (4 coefficient rows x K_packed contraction x 2 flops/MAC)
    against every padded triangle. bf16x3 packing triples (x6 sextuples)
    the hardware MACs of the logical K=10 product — that emulation cost
    is real MXU work and counts toward bf16-peak MFU. Upper-bound model:
    assumes no chunk culls (exact for single-chunk scenes like
    CornellBox-128pad; see docs/PERF.md "MFU accounting"). Returns
    (flops_per_ray, n_chunks) — callers treat n_chunks > 1 as the
    cull-possible regime where the model is an upper bound."""
    from tracer_tpu.ops import intersect
    from tracer_tpu.ops.pallas.intersect_kernel import _mxu_splits
    if not isinstance(scene.accel, intersect.DenseTris):
        return None, 0
    t_pad = int(scene.accel.coeffs.shape[1])
    n_chunks = int(scene.accel.chunk_bounds.shape[0])
    k_packed = 10 * _mxu_splits(t_pad)
    return t_pad * 4 * k_packed * 2, n_chunks


def mfu_fields(scene, total_rays: float, dt_s: float,
               cull_exempt: bool = False) -> dict:
    """The achieved_tflops/mfu_pct/flops_source fields every BENCH entry
    carries (round-4 VERDICT weak #5). On multi-chunk scenes the no-cull
    model over-counts deleted MXU work, so mfu_pct is only reported
    where the model is (near-)exact: single-chunk scenes, or callers
    passing cull_exempt=True for configs where the measured schedule
    visits every chunk anyway (config 4, per the walk-simulator result
    in docs/PERF.md). Elsewhere achieved_tflops is reported as an upper
    bound with an explicit flops_source tag and no mfu_pct."""
    per_ray, n_chunks = analytic_hw_flops_per_ray(scene)
    if not per_ray or dt_s <= 0:
        return {}
    tflops = total_rays * per_ray / dt_s / 1e12
    peak, kind = peak_tflops()
    exact = n_chunks <= 1 or cull_exempt
    out = dict(achieved_tflops=round(tflops, 3),
               flops_source=("analytic-mxu-model" if exact else
                             "analytic-mxu-model-nocull-upper-bound"),
               device_kind=kind)
    if peak and exact:
        out["mfu_pct"] = round(100.0 * tflops / peak, 2)
    elif not exact:
        out["mfu_note"] = ("cull-dominated config: no-cull model is an "
                           "upper bound; mfu_pct omitted")
    return out


def roundtrip_s() -> float:
    """Measured host<->device dispatch+fetch latency of a trivial op,
    subtracted from timed regions (~30ms through the axon tunnel)."""
    import jax
    import jax.numpy as jnp

    tiny = jax.jit(lambda x: x + 1.0)
    np.asarray(tiny(jnp.float32(0.0)))  # compile + warm
    best = float("inf")
    for k in range(3):
        t0 = time.perf_counter()
        np.asarray(tiny(jnp.float32(k + 1.0)))
        best = min(best, time.perf_counter() - t0)
    return best
