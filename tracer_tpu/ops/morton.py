"""30-bit Morton codes for LBVH construction (replaces bvh.fut:45-73).

Karras's bit-interleave trick ("Thinking Parallel, Part III"), vectorized
over u32 arrays on the VPU.
"""

from __future__ import annotations

import jax.numpy as jnp

N_BITS = 30
COMPONENT_BITS = N_BITS // 3
COMPONENT_MAX = float(2 ** COMPONENT_BITS - 1)


def expand_bits(x):
    """Spread each of the low 10 bits of x two positions apart."""
    x = jnp.asarray(x, jnp.uint32)
    x = (x * jnp.uint32(0x00010001)) & jnp.uint32(0xFF0000FF)
    x = (x * jnp.uint32(0x00000101)) & jnp.uint32(0x0F00F00F)
    x = (x * jnp.uint32(0x00000011)) & jnp.uint32(0xC30C30C3)
    x = (x * jnp.uint32(0x00000005)) & jnp.uint32(0x49249249)
    return x


def morton3d(p):
    """Morton code of points (..., 3) inside the unit cube.

    Components are scaled by 2^10 and clamped to 1023, matching
    morton3D (bvh.fut:67-73); x gets the highest interleave slot.
    """
    q = jnp.minimum(p * (COMPONENT_MAX + 1.0), COMPONENT_MAX)
    q = jnp.maximum(q, 0.0)  # guard negatives from degenerate bounds
    q = jnp.where(jnp.isnan(q), 0.0, q)
    xx = expand_bits(q[..., 0].astype(jnp.uint32))
    yy = expand_bits(q[..., 1].astype(jnp.uint32))
    zz = expand_bits(q[..., 2].astype(jnp.uint32))
    return xx * jnp.uint32(4) + yy * jnp.uint32(2) + zz
