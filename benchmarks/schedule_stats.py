#!/usr/bin/env python
"""Predict the spectrum-config kernel-knob sweep on CPU.

The Pallas intersector's cost on an incoherent pool is dominated by how
many (tile, chunk) MXU passes survive the schedule + in-kernel culls,
and the schedule/cull code (_tile_chunk_order, _chunk_cull) is pure XLA
math — it computes identically on CPU. So instead of burning TPU time
searching the TRACER_TILE_N x TRACER_CHUNK_T grid blind, this tool:

  capture: runs a small SpectrumSphere pooled render on CPU under
    jax.disable_jit() with the scene-level query functions wrapped by a
    recorder, dumping every closest/anyhit ray population (the REAL mix
    of primary + bounce + shadow rays the pooled loop produces,
    including its occupancy/refill structure) to an .npz.
  analyze: for each knob combo, rebuilds the chunked accel at that
    TRACER_CHUNK_T, replays every recorded population through the
    actual scheduler, and models the kernel's member-chunk cull
    (numpy mirror of _chunk_cull at upper = tmax) to count surviving
    MXU passes. Reports per-combo MXU element-work + visit overheads.

Caveat: the model culls at upper = tmax (no best-t tightening), so it
UNDERSTATES the win of finer granularity (the real kernel's near-to-far
best-t early-out favors small chunks/tiles even more) and ignores
per-tile fixed overheads (which favor large tiles). It ranks the
MXU-work component exactly; the TPU sweep confirms the overhead tradeoff.

Usage:
  JAX_PLATFORMS=cpu python benchmarks/schedule_stats.py capture \
      [--size 128] [--spp 4] [--out /tmp/sched_pop.npz]
  JAX_PLATFORMS=cpu python benchmarks/schedule_stats.py analyze \
      [--pop /tmp/sched_pop.npz] [--every 2]
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

import _cpu_pin

_cpu_pin.force_cpu(1)

import numpy as np


def _load_scene(name: str):
    from tracer_tpu.utils.objloader import load_obj

    assets = os.environ.get("TRACER_ASSETS", "/root/reference/assets")
    return load_obj(os.path.join(assets, name + ".obj"))


def capture(args):
    import jax

    import tracer_tpu as T
    from tracer_tpu.engine import integrator
    from tracer_tpu.ops import intersect

    tris, tm, mats = _load_scene(args.scene)
    if args.subdiv:
        # the bigscene config's scene (run_all config 6): midpoint-
        # subdivide the largest shipped asset to the streaming regime
        from tracer_tpu.utils import testscenes
        tris, tm = testscenes.subdivide(tris, tm, levels=args.subdiv)
    origin = tuple(float(x) for x in args.origin.split(","))
    s = T.init(0, args.size, args.size, 0, tris, tm, mats,
               cam_origin=origin)
    w, h = s.sub_dims

    pops = []  # (kind, o (3,N), d (3,N), tmax (N,))

    orig_closest, orig_any = intersect.closest_hit, intersect.any_hit

    def rec_closest(dense, tmax, origin, d, **kw):
        tm_ = np.broadcast_to(np.asarray(tmax, np.float32),
                              (np.asarray(d).shape[1],))
        pops.append(("closest", np.asarray(origin), np.asarray(d),
                     np.array(tm_)))
        return orig_closest(dense, tmax, origin, d, **kw)

    def rec_any(dense, tmax, origin, d, **kw):
        tm_ = np.broadcast_to(np.asarray(tmax, np.float32),
                              (np.asarray(d).shape[1],))
        pops.append(("anyhit", np.asarray(origin), np.asarray(d),
                     np.array(tm_)))
        return orig_any(dense, tmax, origin, d, **kw)

    intersect.closest_hit, intersect.any_hit = rec_closest, rec_any
    try:
        with jax.disable_jit():
            out = integrator.render_pooled(
                s.seed, s.nonce, s.scene, s.cam, s.ambience,
                w, h, s.transmitter_kind, args.spp, s.render_mode)
        img_mean = float(np.asarray(out["img"]).mean())
    finally:
        intersect.closest_hit, intersect.any_hit = orig_closest, orig_any

    np.savez_compressed(
        args.out,
        tris=np.asarray(tris, np.float32),
        img_mean=np.float32(img_mean),
        n=np.int32(len(pops)),
        kinds=np.array([p[0] for p in pops]),
        **{f"o{i}": p[1] for i, p in enumerate(pops)},
        **{f"d{i}": p[2] for i, p in enumerate(pops)},
        **{f"t{i}": p[3] for i, p in enumerate(pops)})
    print(f"captured {len(pops)} query populations "
          f"({sum(p[1].shape[1] for p in pops)/1e6:.1f}M rays total), "
          f"img_mean={img_mean:.4f} -> {args.out}")


# ---------------------------------------------------------------- analyze

def _slab_any_per_tile(bounds, o, d, tmax, tile_n):
    """Numpy mirror of intersect_kernel._chunk_cull (upper = tmax),
    reduced to per-tile any-lane: bounds (K, 8), o/d (3, N), tmax (N,)
    -> (K, n_tiles) bool."""
    n = o.shape[1]
    tmin = np.zeros((bounds.shape[0], n), np.float32)
    tmx = np.broadcast_to(tmax[None], tmin.shape).copy()
    from tracer_tpu.ops import shapes
    eps = float(shapes.AABB_EPS)
    for k in range(3):
        par = d[k] == 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / np.where(par, 1.0, d[k])
            t0 = (bounds[:, k, None] - o[k][None]) * inv
            t1 = (bounds[:, 3 + k, None] - o[k][None]) * inv
        lo = np.where(par[None], 0.0, np.minimum(t0, t1))
        hi = np.where(par[None], tmax[None], np.maximum(t0, t1) * (1.0 + eps))
        tmin = np.maximum(tmin, lo)
        tmx = np.minimum(tmx, hi)
    ok = tmx > tmin
    # fully-padded chunks carry inverted inf boxes -> never pass
    empty = bounds[:, 0] > bounds[:, 3]
    ok[empty] = False
    return ok.reshape(bounds.shape[0], -1, tile_n).any(axis=2)


COMBOS = [(ct, tn) for ct in (64, 128, 256, 512)
          for tn in (256, 512, 1024, 2048)]


def _block_candidates(data, idxs, tris):
    """Per-population any-true-Möller-candidate per (64-row block, lane):
    (n_blocks, N) bool each. The morton sort in build_dense is
    chunk-size-independent and padding is a contiguous tail, so every
    combo's chunk j is the union of chunk_t/64 consecutive 64-row blocks
    — one multiplied-space validity pass (no divide, same tests as
    _scores_any) serves all combos."""
    import jax
    import jax.numpy as jnp

    from tracer_tpu.ops import intersect, shapes

    dense = _build_dense_at(tris, 64)
    coeffs = dense.coeffs  # (4, t_pad, 10), padded rows all-zero -> a=0

    eps2 = float(shapes.TRI_EPS) ** 2

    @jax.jit
    def valid_blocks(o, d, tmax):
        phi = intersect.ray_features_t(o, d)
        sc = jnp.einsum("ctk,kn->ctn", coeffs, phi)
        a, nt, nu, nv = sc[0], sc[1], sc[2], sc[3]
        a2 = a * a
        valid = (a2 >= eps2) & (nt * a > 0) & (nt * a < tmax[None] * a2)
        valid &= (nu * a >= 0) & (nv * a <= 0) & ((nu - nv) * a <= a2)
        return valid.reshape(-1, 64, valid.shape[1]).any(axis=1)

    out = {}
    for i in idxs:
        o, d, tmax = data[f"o{i}"], data[f"d{i}"], data[f"t{i}"]
        out[i] = np.asarray(valid_blocks(
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(tmax)))
    return out


def _block_min_t(data, idxs, tris):
    """Exact per-(64-row block, lane) minimum hit t (inf when none) —
    feeds the best-t walk simulator. Same block trick as
    _block_candidates (morton order is chunk-size-independent)."""
    import jax
    import jax.numpy as jnp

    from tracer_tpu.ops import intersect, shapes

    dense = _build_dense_at(tris, 64)
    coeffs = dense.coeffs
    eps = float(shapes.TRI_EPS)

    @jax.jit
    def mins(o, d, tmax):
        phi = intersect.ray_features_t(o, d)
        sc = jnp.einsum("ctk,kn->ctn", coeffs, phi)
        a, nt, nu, nv = sc[0], sc[1], sc[2], sc[3]
        nondeg = jnp.abs(a) >= eps
        t = jnp.where(nondeg, nt / jnp.where(nondeg, a, 1.0), jnp.inf)
        valid = nondeg & (t > 0) & (t < tmax[None])
        valid &= (nu * a >= 0) & (nv * a <= 0) & ((nu - nv) * a <= a * a)
        t = jnp.where(valid, t, jnp.inf)
        return t.reshape(-1, 64, t.shape[1]).min(axis=1)

    return {i: np.asarray(mins(jnp.asarray(data[f"o{i}"]),
                                jnp.asarray(data[f"d{i}"]),
                                jnp.asarray(data[f"t{i}"])))
            for i in idxs}


def _slab_entry_per_lane(bounds, o, d, tmax):
    """(K, N) slab entry distance (+inf where the lane can't reach the
    chunk at tmax) — per-lane version of _slab_any_per_tile."""
    n = o.shape[1]
    tmin = np.zeros((bounds.shape[0], n), np.float32)
    tmx = np.broadcast_to(tmax[None], tmin.shape).copy()
    from tracer_tpu.ops import shapes
    eps = float(shapes.AABB_EPS)
    for k in range(3):
        par = d[k] == 0.0
        with np.errstate(divide="ignore", invalid="ignore"):
            inv = 1.0 / np.where(par, 1.0, d[k])
            t0 = (bounds[:, k, None] - o[k][None]) * inv
            t1 = (bounds[:, 3 + k, None] - o[k][None]) * inv
        lo = np.where(par[None], 0.0, np.minimum(t0, t1))
        hi = np.where(par[None], tmax[None], np.maximum(t0, t1) * (1.0 + eps))
        tmin = np.maximum(tmin, lo)
        tmx = np.minimum(tmx, hi)
    ok = tmx > tmin
    empty = bounds[:, 0] > bounds[:, 3]
    ok[empty] = False
    return np.where(ok, tmin, np.inf)


WALK_POLICIES = ("near", "votes", "mean")


def walk(args):
    """Best-t walk simulator for CLOSEST queries: replays the in-kernel
    near-to-far walk (visit chunk if any lane's slab entry is below its
    tightened min(tmax, best_t); after a visit, best_t absorbs the
    chunk's true per-lane min hit t) under alternative XLA-side
    schedule orderings:
      near  — per-tile min entry distance, ascending (production)
      votes — per-tile count of reachable lanes, descending
      mean  — per-tile mean entry among reachable lanes, ascending
    Reports visited-(chunk, tile) counts and MXU element-work per
    policy; an ordering that tightens best_t sooner visits fewer chunks
    with ZERO kernel changes (the order table is built XLA-side).

    --permute additionally sorts every population by a coherence key
    (the `perm` subcommand's keys) BEFORE tiling: this measures what
    the reachability-only `perm` model cannot — whether coherent tiles
    let the best-t early-out cull far chunks behind near hits (e.g. a
    tile of rays all facing the sphere: the near-surface visit
    tightens every lane's bound at once)."""
    import jax.numpy as jnp

    data = np.load(args.pop, allow_pickle=False)
    tris = jnp.asarray(data["tris"])
    n_pops = int(data["n"])
    kinds = data["kinds"]
    cl = [i for i in range(n_pops) if kinds[i] == "closest"][::args.every]
    keyfn = _PERM_KEYS[args.permute]
    print(f"walk sim on {len(cl)} closest populations; policies: "
          f"{', '.join(WALK_POLICIES)}; permute={args.permute}")
    print("computing exact per-block min hit t...")
    if keyfn is not _PERM_KEYS["prod"]:
        # permute the stored populations in place (block min-t and the
        # walk below both read the permuted order)
        data = dict(data)
        for i in cl:
            pi = np.argsort(keyfn(data[f"o{i}"], data[f"d{i}"]),
                            kind="stable")
            data[f"o{i}"] = data[f"o{i}"][:, pi]
            data[f"d{i}"] = data[f"d{i}"][:, pi]
            data[f"t{i}"] = data[f"t{i}"][pi]
    min_t = _block_min_t(data, cl, tris)

    combos = [tuple(int(x) for x in c.split("/"))
              for c in args.combos.split(",")]
    print(f"{'combo':>12} {'policy':>6} {'visits(k)':>10} "
          f"{'MXU Gelem':>10} {'vs near':>8}")
    for chunk_t, tile_n in combos:
        dense = _build_dense_at(tris, chunk_t)
        bounds = np.asarray(dense.chunk_bounds)
        n_chunks = bounds.shape[0]
        bpc = chunk_t // 64
        stats = {p: [0, 0.0] for p in WALK_POLICIES}
        for i in cl:
            o, d, tmax = data[f"o{i}"], data[f"d{i}"], data[f"t{i}"]
            n = o.shape[1]
            pad = (-n) % tile_n
            if pad:
                o = np.concatenate([o, np.repeat(o[:, -1:], pad, 1)], 1)
                d = np.concatenate([d, np.repeat(d[:, -1:], pad, 1)], 1)
                tmax = np.concatenate([tmax, np.repeat(tmax[-1:], pad)])
            entry = _slab_entry_per_lane(bounds, o, d, tmax)  # (K, Np)
            mt = min_t[i]
            need = n_chunks * bpc
            if need > mt.shape[0]:
                mt = np.concatenate([mt, np.full(
                    (need - mt.shape[0], mt.shape[1]), np.inf,
                    np.float32)], 0)
            cmt = mt[:need].reshape(n_chunks, bpc, -1).min(axis=1)
            if pad:
                cmt = np.concatenate(
                    [cmt, np.repeat(cmt[:, -1:], pad, 1)], 1)
            n_tiles = o.shape[1] // tile_n
            e3 = entry.reshape(n_chunks, n_tiles, tile_n)
            m3 = cmt.reshape(n_chunks, n_tiles, tile_n)
            t3 = tmax.reshape(n_tiles, tile_n)
            reach = np.isfinite(e3)
            keys = {
                "near": np.where(reach, e3, np.inf).min(axis=2),
                "votes": -reach.sum(axis=2).astype(np.float64),
                "mean": np.where(
                    reach.any(axis=2),
                    np.where(reach, e3, 0.0).sum(axis=2)
                    / np.maximum(reach.sum(axis=2), 1), np.inf),
            }
            for pol in WALK_POLICIES:
                order = np.argsort(keys[pol], axis=0, kind="stable")
                for ti in range(n_tiles):
                    upper = t3[ti].copy()
                    for c in order[:, ti]:
                        if not np.isfinite(keys[pol][c, ti]):
                            if pol != "votes":
                                break  # inf key: nothing reachable beyond
                            continue
                        live = e3[c, ti] < upper
                        if live.any():
                            stats[pol][0] += 1
                            stats[pol][1] += chunk_t * tile_n
                            upper = np.minimum(upper, m3[c, ti])
        base = stats["near"][1]
        for pol in WALK_POLICIES:
            v, el = stats[pol]
            print(f"c{chunk_t}/t{tile_n:>5} {pol:>6} {v / 1e3:>10.3f} "
                  f"{el / 1e9:>10.4f} {el / max(base, 1):>8.2f}")


def _key_none(o, d):
    return None


def _key_oct(o, d):
    # 3-bit direction octant (stable sort keeps locality within)
    return ((d[0] >= 0).astype(np.int64) * 4
            + (d[1] >= 0).astype(np.int64) * 2
            + (d[2] >= 0).astype(np.int64))


def _pmorton(x, y, z, bits=10):
    def spread(v):
        v = v.astype(np.uint64)
        v = (v | (v << np.uint64(16))) & np.uint64(0x030000FF)
        v = (v | (v << np.uint64(8))) & np.uint64(0x0300F00F)
        v = (v | (v << np.uint64(4))) & np.uint64(0x030C30C3)
        v = (v | (v << np.uint64(2))) & np.uint64(0x09249249)
        return v
    return (spread(x) << np.uint64(2)) | (spread(y) << np.uint64(1)) \
        | spread(z)


def _pquant(v, lo, hi, bits=10):
    q = np.clip((v - lo) / max(hi - lo, 1e-9), 0.0, 0.999999)
    return (q * (1 << bits)).astype(np.uint64)


def _key_dmorton(o, d):
    return _pmorton(_pquant(d[0], -1, 1), _pquant(d[1], -1, 1),
                    _pquant(d[2], -1, 1))


def _key_odmorton(o, d):
    lo = o.min(axis=1, keepdims=True)
    hi = o.max(axis=1, keepdims=True)
    om = _pmorton(
        _pquant(o[0], lo[0, 0], hi[0, 0], 5),
        _pquant(o[1], lo[1, 0], hi[1, 0], 5),
        _pquant(o[2], lo[2, 0], hi[2, 0], 5))
    dm = _pmorton(_pquant(d[0], -1, 1, 5), _pquant(d[1], -1, 1, 5),
                  _pquant(d[2], -1, 1, 5))
    return (om.astype(np.int64) << 15) | dm.astype(np.int64)


_PERM_KEYS = dict(prod=_key_none, octant=_key_oct, dmorton=_key_dmorton,
                  odmorton=_key_odmorton)


def perm(args):
    """Predict the BOUNDARY-ONLY ray-permutation attack (round-3 VERDICT
    "Next #2a"): at each closest query, sort lanes by a coherence key
    (direction octant / morton-of-direction / origin+direction morton),
    run the scheduler + member culls on the sorted order, and compare
    MXU element-work vs the production (unsorted) order. Lane state
    never moves in the real implementation — only the query inputs are
    permuted and the 5 outputs inverse-permuted — so the win threshold
    is the argsort+13-vector gather cost (~small); a >=25% element-work
    cut is worth an e2e TPU measurement."""
    import jax.numpy as jnp

    from tracer_tpu.ops import intersect
    from tracer_tpu.ops.pallas import intersect_kernel as pk

    data = np.load(args.pop, allow_pickle=False)
    tris = jnp.asarray(data["tris"])
    n_pops = int(data["n"])
    kinds = data["kinds"]
    policies = _PERM_KEYS

    for kind_sel in ("closest", "anyhit"):
        sel = [i for i in range(n_pops)
               if kinds[i] == kind_sel][::args.every]
        chunk_t, tile_n = (int(x) for x in args.combo.split("/"))
        dense = _build_dense_at(tris, chunk_t)
        bounds = np.asarray(dense.chunk_bounds)
        n_chunks = bounds.shape[0]
        g = -(-n_chunks // pk.MAX_SCHED)
        sb = (dense.chunk_bounds if g == 1
              else pk._superchunk_bounds(dense.chunk_bounds, g))
        n_super = np.asarray(sb).shape[0]

        print(f"\n== {kind_sel} ({len(sel)} sampled), combo "
              f"c{chunk_t}/t{tile_n}")
        print(f"{'policy':>9} {'sched/tile':>10} {'MXU Gelem':>10} "
              f"{'visits(k)':>10} {'vs prod':>8}")
        stats = {p: [0, 0, 0.0, 0] for p in policies}
        for i in sel:
            o0, d0, t0 = data[f"o{i}"], data[f"d{i}"], data[f"t{i}"]
            for pol, keyfn in policies.items():
                k = keyfn(o0, d0)
                if k is None:
                    o, d, tmax = o0, d0, t0
                else:
                    pi = np.argsort(k, kind="stable")
                    o, d, tmax = o0[:, pi], d0[:, pi], t0[pi]
                n = o.shape[1]
                pad = (-n) % tile_n
                if pad:
                    o = np.concatenate([o, np.repeat(o[:, -1:], pad, 1)],
                                       1)
                    d = np.concatenate([d, np.repeat(d[:, -1:], pad, 1)],
                                       1)
                    tmax = np.concatenate([tmax,
                                           np.repeat(tmax[-1:], pad)])
                n_tiles = o.shape[1] // tile_n
                phi = np.asarray(intersect.ray_features_t(
                    jnp.asarray(o), jnp.asarray(d)))
                phi16 = np.pad(phi, ((0, 6), (0, 0)))
                order, count = pk._tile_chunk_order(
                    jnp.asarray(phi16), jnp.asarray(tmax),
                    jnp.asarray(sb), n_tiles, tile_n)
                order, count = np.asarray(order), np.asarray(count)
                mem_pass = _slab_any_per_tile(bounds, o, d, tmax, tile_n)
                sched = np.zeros((n_super, n_tiles), bool)
                for ti in range(n_tiles):
                    sched[order[ti, :count[ti]], ti] = True
                sched_mem = np.repeat(sched, g, axis=0)[:n_chunks]
                passes = sched_mem & mem_pass
                stats[pol][0] += int(count.sum())
                stats[pol][1] += int(passes.sum())
                stats[pol][2] += float(passes.sum()) * chunk_t * tile_n
                stats[pol][3] += n_tiles
        base = stats["prod"][2]
        for pol in policies:
            sc, vis, el, nt = stats[pol]
            print(f"{pol:>9} {sc / max(nt, 1):>10.1f} {el / 1e9:>10.2f} "
                  f"{vis / 1e3:>10.1f} {el / max(base, 1):>8.2f}")


def _build_dense_at(tris, chunk_t: int):
    from tracer_tpu.ops import intersect

    prev = os.environ.get("TRACER_CHUNK_T")
    os.environ["TRACER_CHUNK_T"] = str(chunk_t)
    try:
        return intersect.build_dense(tris)
    finally:
        if prev is None:
            del os.environ["TRACER_CHUNK_T"]
        else:
            os.environ["TRACER_CHUNK_T"] = prev


def analyze(args):
    import jax.numpy as jnp

    from tracer_tpu.ops import intersect
    from tracer_tpu.ops.pallas import intersect_kernel as pk

    combos = (COMBOS if args.combos == "all" else
              [tuple(int(x) for x in c.split("/"))
               for c in args.combos.split(",")])
    data = np.load(args.pop, allow_pickle=False)
    tris = jnp.asarray(data["tris"])
    n_pops = int(data["n"])
    kinds = data["kinds"]
    # stride WITHIN each kind: capture alternates closest/anyhit, so a
    # flat stride of 2 would sample one kind only
    by_kind = {k: [i for i in range(n_pops) if kinds[i] == k]
               for k in ("closest", "anyhit")}
    idxs = sorted(i for k in by_kind
                  for i in by_kind[k][::args.every])

    print(f"{n_pops} populations, analyzing {len(idxs)} "
          f"(every {args.every} per kind); combos: chunk_t x tile_n")
    print("computing per-block candidate masks (multiplied-space "
          "Möller, once for all combos)...")
    cand64 = _block_candidates(data, idxs, tris)
    n_blocks64 = next(iter(cand64.values())).shape[0]

    header = (f"{'combo':>16} {'g':>2} {'sched/tile':>10} "
              f"{'MXU Gelem':>10} {'visits(k)':>10} {'empty-vis%':>10} "
              f"{'member-pass%':>12} {'DMA GB':>8}")

    for kind_sel in ("closest", "anyhit"):
        print(f"\n== {kind_sel} queries "
              f"({sum(1 for i in idxs if kinds[i] == kind_sel)} sampled)")
        print(header)
        kind_idxs = [i for i in idxs if kinds[i] == kind_sel]

        for chunk_t, tile_n in combos:
            dense = _build_dense_at(tris, chunk_t)
            bounds = np.asarray(dense.chunk_bounds)
            n_chunks = bounds.shape[0]
            g = -(-n_chunks // pk.MAX_SCHED)
            sb = (dense.chunk_bounds if g == 1
                  else pk._superchunk_bounds(dense.chunk_bounds, g))
            n_super = np.asarray(sb).shape[0]
            blocks_per_chunk = chunk_t // 64

            tot_sched = tot_tiles = tot_members = tot_passes = 0
            tot_empty = 0
            mxu_elems = 0.0
            for i in kind_idxs:
                o, d, tmax = data[f"o{i}"], data[f"d{i}"], data[f"t{i}"]
                n = o.shape[1]
                pad = (-n) % tile_n
                if pad:  # edge-replicate so padding doesn't skew stats
                    o = np.concatenate([o, np.repeat(o[:, -1:], pad, 1)], 1)
                    d = np.concatenate([d, np.repeat(d[:, -1:], pad, 1)], 1)
                    tmax = np.concatenate([tmax, np.repeat(tmax[-1:], pad)])
                n_tiles = o.shape[1] // tile_n

                # scheduler (the real one), superchunk granularity
                phi = np.asarray(intersect.ray_features_t(
                    jnp.asarray(o), jnp.asarray(d)))
                phi16 = np.pad(phi, ((0, 6), (0, 0)))
                order, count = pk._tile_chunk_order(
                    jnp.asarray(phi16), jnp.asarray(tmax), jnp.asarray(sb),
                    n_tiles, tile_n)
                order, count = np.asarray(order), np.asarray(count)

                # member-chunk culls at upper = tmax for every (chunk, tile)
                mem_pass = _slab_any_per_tile(bounds, o, d, tmax, tile_n)

                sched = np.zeros((n_super, n_tiles), bool)
                for ti in range(n_tiles):
                    sched[order[ti, :count[ti]], ti] = True
                # members of scheduled supers that pass their own cull
                sched_mem = np.repeat(sched, g, axis=0)[:n_chunks]
                passes = sched_mem & mem_pass

                # candidate density: does the visited (chunk, tile) hold
                # ANY true Möller candidate? (per-visit any(valid)
                # epilogue-guard ceiling). chunk j of this combo = 64-row
                # blocks [j*bpc, (j+1)*bpc); pad missing tail blocks False
                cb = cand64[i][:, :n]  # (n_blocks64, N) before lane pad
                if pad:
                    cb = np.concatenate(
                        [cb, np.repeat(cb[:, -1:], pad, 1)], 1)
                need = n_chunks * blocks_per_chunk
                if need > n_blocks64:
                    cb = np.concatenate([
                        cb, np.zeros((need - n_blocks64, cb.shape[1]),
                                     bool)], 0)
                cand_chunk = (cb[:need]
                              .reshape(n_chunks, blocks_per_chunk, -1)
                              .any(axis=1)
                              .reshape(n_chunks, n_tiles, tile_n)
                              .any(axis=2))
                tot_empty += int((passes & ~cand_chunk).sum())

                tot_sched += int(count.sum())
                tot_tiles += n_tiles
                tot_members += int(sched_mem.sum())
                tot_passes += int(passes.sum())
                mxu_elems += float(passes.sum()) * chunk_t * tile_n

            name = f"c{chunk_t}/t{tile_n}"
            # member-pass% is only informative at g > 1: at g == 1 the
            # member cull tests the same box at the same bound as the
            # scheduler, so it is 100% by construction
            mp = ("-" if g == 1 else
                  f"{100.0 * tot_passes / max(tot_members, 1):.1f}%")
            # streaming regime: every surviving (chunk, tile) pass DMAs
            # the chunk's packed coefficients through the VMEM scratch
            # (intersect_kernel._closest_kernel_streamed) — per-pass
            # bytes = 16 words x n_pack x 4 rows/tri... i.e. the
            # scratch slot size. Only meaningful when the coefficients
            # are HBM-resident.
            t_pad = n_chunks * chunk_t
            splits = pk._mxu_splits(t_pad)
            chunk_bytes = 16 * len(pk._PACK_LEFT[splits]) * 4 * chunk_t * 2
            streaming = pk._use_streaming(chunk_bytes * n_chunks)
            dma = (f"{tot_passes * chunk_bytes / 1e9:>8.2f}" if streaming
                   else f"{'-':>8}")
            print(f"{name:>16} {g:>2} "
                  f"{tot_sched / max(tot_tiles, 1):>10.1f} "
                  f"{mxu_elems / 1e9:>10.2f} {tot_passes / 1e3:>10.1f} "
                  f"{100.0 * tot_empty / max(tot_passes, 1):>9.1f}% "
                  f"{mp:>12} {dma}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    c = sub.add_parser("capture")
    c.add_argument("--scene", default="SpectrumSphere")
    c.add_argument("--origin", default="0,0.8,1.8",
                   help="camera origin; MirrorBox uses 0,0.8,0.9 "
                        "(run_all config 3)")
    c.add_argument("--size", type=int, default=128)
    c.add_argument("--spp", type=int, default=4)
    c.add_argument("--subdiv", type=int, default=0,
                   help="midpoint-subdivision levels (2 = the bigscene "
                        "config's 139k-tri scene)")
    c.add_argument("--out", default="/tmp/sched_pop.npz")
    a = sub.add_parser("analyze")
    a.add_argument("--pop", default="/tmp/sched_pop.npz")
    a.add_argument("--every", type=int, default=2)
    a.add_argument("--combos", default="all",
                   help="chunk/tile list (e.g. 256/2048) or 'all'")
    w = sub.add_parser("walk")
    w.add_argument("--pop", default="/tmp/sched_pop.npz")
    w.add_argument("--every", type=int, default=4)
    w.add_argument("--combos", default="256/2048,128/512,64/256")
    w.add_argument("--permute", default="prod",
                   choices=sorted(_PERM_KEYS),
                   help="coherence-sort the lanes before tiling (the "
                        "perm subcommand's keys)")
    p = sub.add_parser("perm")
    p.add_argument("--pop", default="/tmp/sched_pop.npz")
    p.add_argument("--every", type=int, default=4)
    p.add_argument("--combo", default="256/2048",
                   help="chunk_t/tile_n (production default)")
    args = ap.parse_args()
    {"capture": capture, "analyze": analyze, "walk": walk,
     "perm": perm}[args.cmd](args)


if __name__ == "__main__":
    main()
