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
