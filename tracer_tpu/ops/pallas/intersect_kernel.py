"""Fused Pallas TPU kernel for the dense ray-triangle intersector.

The XLA formulation (ops/intersect.py) materializes the (4T, N) score
matrix in HBM (537MB for 262k rays x 128 padded triangles) and re-reads
it through the epilogue + reduction — ~8ms per query on a v5e even for
a 44-triangle Cornell box. This kernel keeps everything in VMEM:

  grid = (ray tiles, triangle chunks)
  per step: p = coeffs_chunk (4C,10) @ phi_tile (10,TILE_N) on the MXU,
  Moller epilogue on the VPU, min/argmin over the C (sublane) axis,
  running (best_t, best_i) merge across triangle chunks in the output
  block (revisited per chunk step, classic K-loop accumulation).

HBM traffic drops to phi reads + (TILE_N,) outputs. The same kernel
shape serves any_hit (bool accumulate).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tracer_tpu.ops import shapes

TILE_N = 2048     # rays per tile (lanes)
CHUNK_T = 128     # triangles per chunk (sublanes of the score block)
# VMEM check: p (4C, TILE_N) 4MB + epilogue temps ~6MB + phi/coeffs
# blocks < 1MB stays under the ~16MB/core budget with double buffering.


def _scores(coeffs, phi, tmax):
    """coeffs (4C, 16), phi (16, TILE_N) -> (valid, t) each (C, TILE_N)."""
    c = coeffs.shape[0] // 4
    p = jnp.dot(coeffs, phi, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST)
    a, nt, nu, nv = p[:c], p[c:2 * c], p[2 * c:3 * c], p[3 * c:]
    nondeg = jnp.abs(a) >= shapes.TRI_EPS
    inv_a = jnp.where(nondeg, 1.0, 0.0) / jnp.where(nondeg, a, 1.0)
    t = nt * inv_a
    u = nu * inv_a
    v = -nv * inv_a
    valid = (nondeg & (u >= 0) & (v >= 0) & (u + v <= 1)
             & (t > 0) & (t < tmax))
    return valid, jnp.where(valid, t, jnp.inf)


def _closest_kernel(phi_ref, coeffs_ref, tmax_ref, best_t_ref, best_i_ref):
    ci = pl.program_id(1)
    valid, t = _scores(coeffs_ref[:], phi_ref[:], tmax_ref[:])
    loc_t = jnp.min(t, axis=0)
    loc_i = jnp.argmin(t, axis=0).astype(jnp.int32) + ci * CHUNK_T

    @pl.when(ci == 0)
    def _():
        best_t_ref[:] = loc_t
        best_i_ref[:] = loc_i

    @pl.when(ci != 0)
    def _():
        better = loc_t < best_t_ref[:]
        best_t_ref[:] = jnp.where(better, loc_t, best_t_ref[:])
        best_i_ref[:] = jnp.where(better, loc_i, best_i_ref[:])


def _any_kernel(phi_ref, coeffs_ref, tmax_ref, hit_ref):
    ci = pl.program_id(1)
    valid, _ = _scores(coeffs_ref[:], phi_ref[:], tmax_ref[:])
    loc = jnp.any(valid, axis=0)

    @pl.when(ci == 0)
    def _():
        hit_ref[:] = loc

    @pl.when(ci != 0)
    def _():
        hit_ref[:] = hit_ref[:] | loc


def _pad_inputs(coeffs, phi_t, tmax, n):
    """Pad rays to TILE_N multiple, chunks to CHUNK_T multiple, and the
    feature axis 10 -> 16 (sublane alignment for the MXU operand)."""
    t_pad = coeffs.shape[1]
    n_pad = -(-n // TILE_N) * TILE_N
    t_pad2 = -(-t_pad // CHUNK_T) * CHUNK_T
    coeffs = jnp.pad(coeffs, ((0, 0), (0, t_pad2 - t_pad), (0, 6)))
    # (4, T, 16) -> (T-chunks stay contiguous) (4*T, 16) grouped per chunk:
    # rearrange to (n_chunks, 4*CHUNK_T, 16)
    n_chunks = t_pad2 // CHUNK_T
    coeffs = coeffs.reshape(4, n_chunks, CHUNK_T, 16)
    coeffs = coeffs.transpose(1, 0, 2, 3).reshape(n_chunks * 4 * CHUNK_T, 16)
    phi = jnp.pad(phi_t, ((0, 6), (0, n_pad - n)))
    tmax = jnp.broadcast_to(jnp.asarray(tmax, jnp.float32), (n,))
    tmax = jnp.pad(tmax, (0, n_pad - n))
    return coeffs, phi, tmax, n_pad, n_chunks


def closest_hit_pallas(coeffs, phi_t, tmax, *, interpret: bool = False):
    """coeffs (4, T_pad, 10) from intersect.build_dense, phi_t (10, N),
    tmax scalar or (N,). Returns (best_t (N,), best_i (N,))."""
    n = phi_t.shape[1]
    coeffs2, phi, tmaxv, n_pad, n_chunks = _pad_inputs(coeffs, phi_t, tmax, n)
    grid = (n_pad // TILE_N, n_chunks)
    best_t, best_i = pl.pallas_call(
        _closest_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, TILE_N), lambda ri, ci: (0, ri)),
            pl.BlockSpec((4 * CHUNK_T, 16), lambda ri, ci: (ci, 0)),
            pl.BlockSpec((TILE_N,), lambda ri, ci: (ri,)),
        ],
        out_specs=[
            pl.BlockSpec((TILE_N,), lambda ri, ci: (ri,)),
            pl.BlockSpec((TILE_N,), lambda ri, ci: (ri,)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad,), jnp.float32),
            jax.ShapeDtypeStruct((n_pad,), jnp.int32),
        ],
        interpret=interpret,
    )(phi, coeffs2, tmaxv)
    return best_t[:n], best_i[:n]


def any_hit_pallas(coeffs, phi_t, tmax, *, interpret: bool = False):
    """Shadow-query variant. Returns hit (N,) bool."""
    n = phi_t.shape[1]
    coeffs2, phi, tmaxv, n_pad, n_chunks = _pad_inputs(coeffs, phi_t, tmax, n)
    grid = (n_pad // TILE_N, n_chunks)
    hit = pl.pallas_call(
        _any_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((16, TILE_N), lambda ri, ci: (0, ri)),
            pl.BlockSpec((4 * CHUNK_T, 16), lambda ri, ci: (ci, 0)),
            pl.BlockSpec((TILE_N,), lambda ri, ci: (ri,)),
        ],
        out_specs=pl.BlockSpec((TILE_N,), lambda ri, ci: (ri,)),
        out_shape=jax.ShapeDtypeStruct((n_pad,), jnp.bool_),
        interpret=interpret,
    )(phi, coeffs2, tmaxv)
    return hit[:n]
