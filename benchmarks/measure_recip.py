"""Measure the relative error of pl.reciprocal(approx=True) on the
current backend (the real TPU when the axon relay is up; interpret-mode
CPU with JAX_PLATFORMS=cpu).

Pins the APPROX_RECIP_REL constant (ops/pallas/intersect_kernel.py) with
a hardware number: interpret mode lowers approx=True as 1/f32(bf16(x))
(~2^-8 band from input rounding); the TPU Mosaic lowering emits the
hardware reciprocal instruction, whose error this script measures
directly. Run it through benchmarks/tpu_queue.sh after a relay outage.

Usage: python benchmarks/measure_recip.py [n]
Prints one JSON line: {"backend", "max_rel", "p999_rel", "log2_max"}.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import _cpu_pin  # noqa: E402

_cpu_pin.maybe_force_from_env()

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402


def _kernel(x_ref, o_ref):
    o_ref[...] = pl.reciprocal(x_ref[...], approx=True)


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1 << 20
    rng = np.random.default_rng(7)
    # span all magnitudes the intersector's determinant takes: exponents
    # uniform in [-20, 20), mantissas uniform, both signs
    x = (rng.uniform(1.0, 2.0, n) * np.exp2(rng.uniform(-20, 20, n))
         * rng.choice([-1.0, 1.0], n)).astype(np.float32)
    xj = jnp.asarray(x).reshape(1, -1)
    interpret = jax.default_backend() != "tpu"
    y = pl.pallas_call(
        _kernel,
        out_shape=jax.ShapeDtypeStruct(xj.shape, jnp.float32),
        interpret=interpret,
    )(xj)
    y = np.asarray(y).ravel()
    exact = 1.0 / x.astype(np.float64)
    rel = np.abs(y.astype(np.float64) - exact) / np.abs(exact)
    out = {
        "backend": jax.default_backend(),
        "interpret": interpret,
        "n": n,
        "max_rel": float(rel.max()),
        "p999_rel": float(np.quantile(rel, 0.999)),
        "log2_max": float(np.log2(rel.max())) if rel.max() > 0 else None,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
