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
