"""Bisect harness for the mirrorbox energy discrepancy (round-3 VERDICT
"Next #1"): tracer_tpu was +5.3% on the green channel vs the independent
numpy transliteration, with a 0.2% same-estimator control — a systematic
divergence on metal paths (material.fut:346-355, integrator.fut:62-69)
whose guilty side was unknown.

Three independent attacks, cheapest first:

  terms   deterministic grid A/B of every metal-lobe formula (Beckmann D,
          G, reflection bsdf/pdf, Fresnel, uber bsdf/pdf, RR throughput)
          between verify/ref_estimator_numpy.py and
          tracer_tpu/ops/materials.py on IDENTICAL (wo, wi) inputs —
          a formula-level misreading shows up as a nonzero max rel diff.

  rr      renders MirrorBox with the oracle twice — once as committed
          (terminate |= ~isfinite(p_term)) and once with the reference's
          exact IEEE comparison semantics (integrator.fut:68-69:
          `terminate = q < p_terminate`; q < NaN and q < -inf are FALSE,
          so the reference CONTINUES those lanes) — and counts how many
          lane-bounces the extra clause kills and how much green energy
          it removes.

  probe   single-material probe scenes (pure metal wall roughness 0 /
          0.3, diffuse control) rendered by both estimators at high spp;
          prints per-channel energy and z statistics per probe so the
          divergent lobe/path-depth is localized.

Run on CPU: `python verify/bisect_mirror.py terms|rr|probe`.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import _cpu_pin  # noqa: E402

_cpu_pin.force_cpu(1)

import numpy as np  # noqa: E402

import verify.ref_estimator_numpy as R  # noqa: E402

F = np.float32
ASSETS = os.environ.get("TRACER_ASSETS", "/root/reference/assets")


# ---------------------------------------------------------------------------
# terms: formula-level grid A/B


class _M:
    """Duck-typed material' for the numpy module functions."""

    def __init__(self, color, roughness, metalness, ref_ix, opacity):
        self.color = F(color)
        self.roughness = F(roughness)
        self.metalness = F(metalness)
        self.ref_ix = F(ref_ix)
        self.opacity = F(opacity)


def _wi_grid(n_ang=24, n_u=64):
    """Deterministic (wo, wi) pairs: wo over incidence angles x sampled
    Beckmann wh over a (u0, u1) grid, wi = reflect(wo, wh) — exactly the
    directions the metal lobe visits."""
    rng = np.random.default_rng(7)
    thetas = np.linspace(0.01, 1.55, n_ang)
    wos, whs = [], []
    for rough in (0.0, 0.1, 0.3):
        alpha = R.beckmann_alpha(F(rough))
        for th in thetas:
            wo = np.array([np.sin(th), 0.0, np.cos(th)], F)
            u0 = rng.random(n_u).astype(F) * F(0.9999)
            u1 = rng.random(n_u).astype(F) * F(0.9999)
            t2 = -alpha * alpha * np.log(1 - u0).astype(F)
            ct = (1.0 / np.sqrt(1 + t2)).astype(F)
            st = np.sqrt(np.maximum(F(0), 1 - ct * ct))
            phi = u1 * 2 * np.pi
            wh = np.stack([st * np.cos(phi), st * np.sin(phi), ct],
                          axis=-1).astype(F)
            wos.append(np.broadcast_to(wo, wh.shape).copy())
            whs.append(wh)
    wo = np.concatenate(wos)
    wh = np.concatenate(whs)
    wi = R.reflect(wo, wh)
    keep = R.same_hemisphere(wo, wi)
    return wo[keep], wi[keep]


def cmd_terms():
    import jax.numpy as jnp
    from tracer_tpu.ops import materials as JM

    wo, wi = _wi_grid()
    n = len(wo)
    print(f"{n} (wo, wi) pairs")
    for rough, metal, ref_ix, opac in [(0.0, 1.0, 50.0, 1.0),
                                       (0.1, 1.0, 8.0, 1.0),
                                       (0.3, 0.5, 1.5, 1.0),
                                       (1.0, 0.0, 1.0, 1.0)]:
        m_np = _M(0.6, rough, metal, ref_ix, opac)
        m_jx = JM.MaterialLanes(
            color=jnp.full((n,), 0.6, jnp.float32),
            roughness=jnp.full((n,), rough, jnp.float32),
            metalness=jnp.full((n,), metal, jnp.float32),
            ref_ix=jnp.full((n,), ref_ix, jnp.float32),
            opacity=jnp.full((n,), opac, jnp.float32))
        wo_j = jnp.asarray(wo.T)   # V3 = (3, N)
        wi_j = jnp.asarray(wi.T)

        pairs = {
            "refl_bsdf": (R.dielectric_reflection_bsdf(wo, wi, m_np),
                          JM.dielectric_reflection_bsdf(wo_j, wi_j, m_jx)),
            "refl_pdf": (R.dielectric_reflection_pdf(wo, wi, m_np),
                         JM.dielectric_reflection_pdf(wo_j, wi_j, m_jx)),
            "fresnel": (R.fresnel_reflectance(wo, m_np),
                        JM.fresnel_reflectance(wo_j, m_jx)),
            "uber_bsdf": (R.uber_bsdf(wo, wi, m_np),
                          JM.uber_bsdf(wo_j, wi_j, m_jx)),
            "uber_pdf": (R.uber_pdf(wo, wi, m_np),
                         JM.uber_pdf(wo_j, wi_j, m_jx)),
        }
        print(f"-- rough={rough} metal={metal} ref_ix={ref_ix}")
        for name, (a, b) in pairs.items():
            a = np.asarray(a, np.float64)
            b = np.asarray(b, np.float64)
            both_fin = np.isfinite(a) & np.isfinite(b)
            fin_mismatch = int((~both_fin & (np.isfinite(a)
                                             != np.isfinite(b))).sum())
            denom = np.maximum(np.abs(a[both_fin]), 1e-6)
            rel = np.abs(a[both_fin] - b[both_fin]) / denom
            print(f"   {name:10s} max_rel={rel.max():.3e} "
                  f"finite_mismatch={fin_mismatch}")


# ---------------------------------------------------------------------------
# rr: the ~isfinite(p_term) clause vs reference IEEE comparison semantics


def _path_trace_flagged(st, ray_o, ray_d, wavelen, tris, mats, lights,
                        ieee_rr, counters):
    """ref_estimator_numpy.path_trace with the RR-termination comparison
    switchable and instrumented.  ieee_rr=True reproduces the reference's
    exact `q < p_terminate` (NaN/-inf compare FALSE -> continue);
    ieee_rr=False is the committed oracle (extra ~isfinite kill)."""
    L = ray_o.shape[0]
    alive = np.ones(L, bool)
    total = np.zeros(L, F)
    fmax = F(np.finfo(np.float32).max)
    for bounce in range(R.PATH_LEN):
        if not alive.any():
            break
        hit, t, pos, normal, mix = R.closest_hit(ray_o, ray_d, fmax, tris)
        miss = alive & ~hit
        total = np.where(miss, total, total)
        act = alive & hit
        st_adv, _ = R.random_unit_exclusive(st)
        st = np.where(act, st_adv, st)
        m = R.MatAtWavelen(mats, mix, wavelen)
        wo = -ray_d
        st_d, direct = R.direct_radiance(st, wo, pos, normal, m, wavelen,
                                         lights, tris)
        st = np.where(act, st_d, st)
        emis = R.spectrum_lookup(wavelen, mats.emission[mix])
        rad = direct + (emis if bounce == 0 else F(0))
        total = np.where(act, total + rad, total)
        st_s, smp = R.sample_dir(st, wo, normal, m)
        st = np.where(act, st_s, st)
        pdf = np.where(smp.kind == R.PDF_DELTA, F(1),
                       np.where(smp.kind == R.PDF_NONZERO, smp.val,
                                F(0))).astype(F)
        cos_fall = np.abs(R.dot(normal, smp.wi))
        with np.errstate(invalid="ignore", divide="ignore",
                         over="ignore"):
            p_term = (1 - smp.bsdf * cos_fall / pdf).astype(F)
        st_t, q = R.random_unit_exclusive(st)
        st = np.where(act, st_t, st)
        base_term = (pdf == 0) | (q < p_term)
        extra = act & (pdf != 0) & ~np.isfinite(p_term) & ~(q < p_term)
        counters["nonfinite_continue"] += int(extra.sum())
        counters["act"] += int(act.sum())
        if ieee_rr:
            terminate = base_term
        else:
            terminate = base_term | ~np.isfinite(p_term)
        alive = act & ~terminate
        o2, d2 = R.mkray_adjust_acne(pos, normal, smp.wi)
        ray_o = np.where(alive[:, None], o2, ray_o)
        ray_d = np.where(alive[:, None], d2, ray_d)
    return st, total


def _render_flagged(seed, w, h, spp, tris, tri_mats, mat_rows, ieee_rr,
                    cam_origin=(0.0, 0.8, 0.9),  # make_golden.py mirrorbox
                    decorrelate=False):
    trs = R.Tris(tris, tri_mats)
    mats = R.Mats(mat_rows)
    lights = R.Lights(tris, tri_mats, mats)
    origin = np.asarray(cam_origin, F)
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    j = jj.ravel().astype(F)
    i_flip = (F(h) - ii.ravel().astype(F) - F(1.0))
    pixel_ix = (ii.ravel() * w + jj.ravel()).astype(np.uint64)
    npix = w * h
    sum_img = np.zeros((npix, 3), np.float64)
    counters = {"nonfinite_continue": 0, "act": 0}
    for f0 in range(0, spp, 16):
        fc = min(16, spp - f0)
        st = np.concatenate([R.stream_states(seed, f0 + k, pixel_ix)
                             for k in range(fc)])
        jL = np.tile(j, fc)
        iL = np.tile(i_flip, fc)
        st, wl, ch = R.sample_camera_wavelength(st)
        o, d = R.sample_camera_ray(st, origin, w, h, jL, iL)
        if decorrelate:
            # break the reference's jitter-reuse quirk: the path reads
            # an INDEPENDENT stream instead of re-reading the camera's
            # jitter/lens draws (camera.fut:86-102 -> integrator.fut:
            # 86-101). The JAX tracer threads the advanced state, which
            # is statistically this decorrelated estimator.
            st = np.concatenate([
                R.stream_states(seed ^ 0x5DEECE66, f0 + k, pixel_ix)
                for k in range(fc)])
        st, total = _path_trace_flagged(st, o, d, wl, trs, mats, lights,
                                        ieee_rr, counters)
        vals = (F(3.0) * total)[:, None] * R.SENSOR_COLOR[ch]
        sum_img += vals.reshape(fc, npix, 3).astype(np.float64).sum(axis=0)
    return sum_img.reshape(h, w, 3) / spp, counters


def cmd_reuse(size=32, spp=512):
    """Measure the jitter-rng-reuse quirk's energy effect on MirrorBox:
    oracle-with-quirk (the committed transliteration = the reference)
    vs oracle-with-decorrelated-path-stream (= what the JAX tracer
    effectively computes). If this reproduces the +5% green test gap,
    the quirk is the root cause and the TRACER must adopt it."""
    from tracer_tpu.utils.objloader import load_obj
    tris, tm, mats = load_obj(os.path.join(ASSETS, "MirrorBox.obj"))
    img_q, _ = _render_flagged(7, size, size, spp, tris, tm, mats,
                               ieee_rr=False, decorrelate=False)
    img_d, _ = _render_flagged(7, size, size, spp, tris, tm, mats,
                               ieee_rr=False, decorrelate=True)
    for cix, name in enumerate("RGB"):
        a = img_q[..., cix].mean()   # with quirk (reference semantics)
        b = img_d[..., cix].mean()   # decorrelated (tracer semantics)
        print(f"  {name}: quirk {a:.5f}  decorrelated {b:.5f}  "
              f"decorr-vs-quirk {(b - a) / max(a, 1e-12) * 100:+.2f}%")


def cmd_rr(size=32, spp=256):
    from tracer_tpu.utils.objloader import load_obj
    tris, tm, mats = load_obj(os.path.join(ASSETS, "MirrorBox.obj"))
    img_orig, c1 = _render_flagged(7, size, size, spp, tris, tm, mats,
                                   ieee_rr=False)
    img_ieee, c2 = _render_flagged(7, size, size, spp, tris, tm, mats,
                                   ieee_rr=True)
    print(f"lane-bounces where the extra ~isfinite clause kills a lane "
          f"the reference continues: {c2['nonfinite_continue']} "
          f"of {c2['act']} active "
          f"({100.0 * c2['nonfinite_continue'] / max(c2['act'], 1):.3f}%)")
    for cix, name in enumerate("RGB"):
        a = img_orig[..., cix].mean()
        b = img_ieee[..., cix].mean()
        print(f"  {name}: committed-oracle {a:.5f}  ieee-rr {b:.5f}  "
              f"rel {(b - a) / max(a, 1e-12) * 100:+.2f}%")


# ---------------------------------------------------------------------------
# chdecor: break the minstd channel<->path-draw correlation only


def cmd_chdecor(size=32, spp=512):
    """The reference's minstd engine makes the sensor-channel draw and
    every downstream path draw deterministic functions of the same lane
    state (an LCG is a bijection), so (channel, path events) are jointly
    lattice-distributed — correlated — while the tracer's counter-PCG
    streams are independent. This renders MirrorBox with the oracle
    twice: committed (channel from the main stream, reference-bitwise)
    vs channel+wavelength read from an INDEPENDENT stream (main stream
    still advanced twice, so all other draws are IDENTICAL). Any energy
    shift is pure channel<->path correlation — the candidate mechanism
    for the green-only +4% (channel-conditioned firefly rates)."""
    from tracer_tpu.utils.objloader import load_obj
    tris, tm, mat_rows = load_obj(os.path.join(ASSETS, "MirrorBox.obj"))
    trs = R.Tris(tris, tm)
    mats = R.Mats(mat_rows)
    lights = R.Lights(tris, tm, mats)
    w = h = size
    origin = np.asarray((0.0, 0.8, 0.9), F)
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    j = jj.ravel().astype(F)
    i_flip = (F(h) - ii.ravel().astype(F) - F(1.0))
    pixel_ix = (ii.ravel() * w + jj.ravel()).astype(np.uint64)
    npix = w * h
    sums = {"committed": np.zeros((npix, 3), np.float64),
            "chdecor": np.zeros((npix, 3), np.float64)}
    for f0 in range(0, spp, 16):
        fc = min(16, spp - f0)
        st0 = np.concatenate([R.stream_states(7, f0 + k, pixel_ix)
                              for k in range(fc)])
        side = np.concatenate([R.stream_states(7 ^ 0x00C0FFEE, f0 + k,
                                               pixel_ix)
                               for k in range(fc)])
        jL = np.tile(j, fc)
        iL = np.tile(i_flip, fc)
        for mode in ("committed", "chdecor"):
            st, wl, ch = R.sample_camera_wavelength(st0)
            if mode == "chdecor":
                _, wl, ch = R.sample_camera_wavelength(side)
            o, d = R.sample_camera_ray(st, origin, w, h, jL, iL)
            st, total = R.path_trace(st, o, d, wl, trs, mats, lights)
            vals = (F(3.0) * total)[:, None] * R.SENSOR_COLOR[ch]
            sums[mode] += vals.reshape(fc, npix, 3).astype(
                np.float64).sum(axis=0)
    for cix, name in enumerate("RGB"):
        a = sums["committed"][:, cix].mean() / spp
        b = sums["chdecor"][:, cix].mean() / spp
        print(f"  {name}: committed {a:.5f}  chdecor {b:.5f}  "
              f"decor-vs-committed {(b - a) / max(a, 1e-12) * 100:+.2f}%")


# ---------------------------------------------------------------------------
# surgery: isolate the guilty material by scene modification A/Bs


def _flat_knots(v):
    return [610.0, v, 550.0, v, 460.0, v, -1.0, 0.0, -1.0, 0.0, -1.0, 0.0]


SURGERY = {
    # MirrorBox tri materials: 5 = shortBox metal (Kd .9/.6/.1 r.1 ni8),
    # 6 = tallBox diffuse white, 7 = light (Ke 30/25/22), 8 = the 12-tri
    # mirror ROOM (rough 0, ni 50). Walls 0-4 have no triangles.
    "base": lambda m: m,
    "metal5_diffuse": lambda m: _setm(m, 5, rough=1.0, metal=0.0, ni=1.0),
    "mirror_diffuse": lambda m: _setm(m, 8, rough=1.0, metal=0.0, ni=1.0,
                                      kd=_flat_knots(0.73)),
    "light_flat": lambda m: _setm(m, 7, ke=_flat_knots(25.0)),
    "metal5_flat": lambda m: _setm(m, 5, kd=_flat_knots(0.6)),
    "mirror_rough": lambda m: _setm(m, 8, rough=0.3),
}


def _setm(mats, ix, rough=None, metal=None, ni=None, kd=None, ke=None):
    m = mats.copy()
    if rough is not None:
        m[ix, 12] = rough
    if metal is not None:
        m[ix, 13] = metal
    if ni is not None:
        m[ix, 14] = ni
    if kd is not None:
        m[ix, 0:12] = kd
    if ke is not None:
        m[ix, 16:28] = ke
    return m


def cmd_surgery(size=32, spp=256, variants=None):
    import tracer_tpu as T

    from tracer_tpu.utils.objloader import load_obj
    tris, tm, mats0 = load_obj(os.path.join(ASSETS, "MirrorBox.obj"))
    origin = (0.0, 0.8, 0.9)
    for name in (variants or SURGERY):
        mats = SURGERY[name](mats0)
        mean_r, _, _ = R.render(7, size, size, spp, tris, tm, mats,
                                cam_origin=origin)
        s = T.init(0, size, size, 0, tris, tm, mats, cam_origin=origin)
        mean_j = np.asarray(T.sample_n_frames(s, spp))
        rels = [(mean_j[..., c].mean() - mean_r[..., c].mean())
                / max(mean_r[..., c].mean(), 1e-9) * 100 for c in range(3)]
        print(f"{name:16s} refRGB=({mean_r[..., 0].mean():.4f},"
              f"{mean_r[..., 1].mean():.4f},{mean_r[..., 2].mean():.4f}) "
              f"jax-vs-ref R{rels[0]:+.2f}% G{rels[1]:+.2f}% "
              f"B{rels[2]:+.2f}%", flush=True)


# ---------------------------------------------------------------------------
# depth: per-bounce energy + survival profiles on the real MirrorBox


def _oracle_depth(seed, w, h, spp, tris, tri_mats, mat_rows,
                  cam_origin=(0.0, 0.8, 0.9)):
    """Oracle render that records, per bounce: processed-hit lane count
    and per-channel energy contribution (3 * rad * sensor_color)."""
    trs = R.Tris(tris, tri_mats)
    mats = R.Mats(mat_rows)
    lights = R.Lights(tris, tri_mats, mats)
    origin = np.asarray(cam_origin, F)
    jj, ii = np.meshgrid(np.arange(w), np.arange(h))
    j = jj.ravel().astype(F)
    i_flip = (F(h) - ii.ravel().astype(F) - F(1.0))
    pixel_ix = (ii.ravel() * w + jj.ravel()).astype(np.uint64)
    n_eng = np.zeros((R.PATH_LEN, 3), np.float64)
    n_hit = np.zeros(R.PATH_LEN, np.int64)
    n_lanes = 0
    for f0 in range(0, spp, 16):
        fc = min(16, spp - f0)
        st = np.concatenate([R.stream_states(seed, f0 + k, pixel_ix)
                             for k in range(fc)])
        jL = np.tile(j, fc)
        iL = np.tile(i_flip, fc)
        st, wl, ch = R.sample_camera_wavelength(st)
        ray_o, ray_d = R.sample_camera_ray(st, origin, w, h, jL, iL)
        L = ray_o.shape[0]
        n_lanes += L
        sc = R.SENSOR_COLOR[ch]  # (L, 3)
        alive = np.ones(L, bool)
        fmax = F(np.finfo(np.float32).max)
        for bounce in range(R.PATH_LEN):
            if not alive.any():
                break
            hit, t, pos, normal, mix = R.closest_hit(ray_o, ray_d, fmax,
                                                     trs)
            act = alive & hit
            n_hit[bounce] += int(act.sum())
            st_adv, _ = R.random_unit_exclusive(st)
            st = np.where(act, st_adv, st)
            m = R.MatAtWavelen(mats, mix, wl)
            wo = -ray_d
            st_d, direct = R.direct_radiance(st, wo, pos, normal, m, wl,
                                             lights, trs)
            st = np.where(act, st_d, st)
            emis = R.spectrum_lookup(wl, mats.emission[mix])
            rad = np.where(act, direct + (emis if bounce == 0 else F(0)),
                           F(0))
            n_eng[bounce] += ((F(3.0) * rad)[:, None] * sc).sum(axis=0)
            st_s, smp = R.sample_dir(st, wo, normal, m)
            st = np.where(act, st_s, st)
            pdf = np.where(smp.kind == R.PDF_DELTA, F(1),
                           np.where(smp.kind == R.PDF_NONZERO, smp.val,
                                    F(0))).astype(F)
            cos_fall = np.abs(R.dot(normal, smp.wi))
            with np.errstate(invalid="ignore", divide="ignore",
                             over="ignore"):
                p_term = (1 - smp.bsdf * cos_fall / pdf).astype(F)
            st_t, q = R.random_unit_exclusive(st)
            st = np.where(act, st_t, st)
            terminate = (pdf == 0) | (q < p_term) | ~np.isfinite(p_term)
            alive = act & ~terminate
            o2, d2 = R.mkray_adjust_acne(pos, normal, smp.wi)
            ray_o = np.where(alive[:, None], o2, ray_o)
            ray_d = np.where(alive[:, None], d2, ray_d)
    return n_eng / (n_lanes / 3.0), n_hit / (n_lanes / 1.0)


def _jax_depth(seed, size, spp, obj, cam_origin=(0.0, 0.8, 0.9)):
    import jax.numpy as jnp

    import tracer_tpu as T
    from tracer_tpu.engine import integrator

    from tracer_tpu.utils.objloader import load_obj
    tris, tm, mats = load_obj(obj)
    s = T.init(seed, size, size, 0, tris, tm, mats, cam_origin=cam_origin)
    w, h = s.sub_dims
    n_eng = np.zeros((integrator.PATH_LEN, 3), np.float64)
    n_hit = np.zeros(integrator.PATH_LEN, np.int64)
    n_lanes = 0
    import jax

    @jax.jit
    def frame(nonce):
        fs = integrator.sample_pixels(
            jnp.uint32(seed), nonce, s.scene, s.cam, s.ambience, w, h,
            s.transmitter_kind)
        sc = jnp.take(s.cam.conf.sensor_color, fs.channel, axis=0)  # (N,3)
        rad = fs.path.radiance                      # (K, N)
        eng = (3.0 * rad)[:, :, None] * sc[None]    # (K, N, 3)
        hitk = jnp.isfinite(fs.path.distance)
        return eng.sum(axis=1), hitk.sum(axis=1)

    for f in range(spp):
        eng, hitk = frame(jnp.uint32(f))
        n_eng += np.asarray(eng, np.float64)
        n_hit += np.asarray(hitk, np.int64)
        n_lanes += w * h
    return n_eng / (n_lanes / 3.0), n_hit / (n_lanes / 1.0)


def cmd_depth(size=32, spp=256):
    obj = os.path.join(ASSETS, "MirrorBox.obj")
    from tracer_tpu.utils.objloader import load_obj
    tris, tm, mats = load_obj(obj)
    eng_r, hit_r = _oracle_depth(7, size, size, spp, tris, tm, mats)
    eng_j, hit_j = _jax_depth(0, size, spp, obj)
    print(f"{'bounce':>6} {'hit_ref':>9} {'hit_jax':>9} {'G_ref':>10} "
          f"{'G_jax':>10} {'dG%':>7}")
    for k in range(eng_r.shape[0]):
        if hit_r[k] == 0 and hit_j[k] == 0:
            break
        dg = ((eng_j[k, 1] - eng_r[k, 1])
              / max(abs(eng_r[k, 1]), 1e-9) * 100)
        print(f"{k:>6} {hit_r[k]:>9.4f} {hit_j[k]:>9.4f} "
              f"{eng_r[k, 1]:>10.5f} {eng_j[k, 1]:>10.5f} {dg:>+6.1f}%")
    for c, name in enumerate("RGB"):
        a, b = eng_r[:, c].sum(), eng_j[:, c].sum()
        print(f"total {name}: ref {a:.5f} jax {b:.5f} "
              f"rel {(b - a) / max(a, 1e-9) * 100:+.2f}%")


# ---------------------------------------------------------------------------
# probe: single-material scenes through both full estimators


def _probe_scene(kind):
    """(tris, tri_mats, mats, cam_origin). Camera looks down -z
    (pitch = yaw = 0, the estimators' fixed probe camera)."""
    from tracer_tpu.utils.testscenes import mat_row, quad

    tris, tm = [], []

    def add(ts, m):
        tris.extend(ts)
        tm.extend([m] * len(ts))

    if kind in ("metal0", "metal03"):
        rough = 0.0 if kind == "metal0" else 0.3
        mats = np.stack([
            mat_row(kd=(0.9, 0.9, 0.9), roughness=rough, metalness=1.0,
                    ref_ix=50.0),
            mat_row(ke=(20.0, 20.0, 20.0)),
        ])
        # metal wall at z=-1 filling the view; light behind the camera
        # at z=+3 facing the wall (normal -z), visible via the reflection.
        add(quad([-4, -4, -1], [4, -4, -1], [4, 4, -1], [-4, 4, -1]), 0)
        add(quad([-1.2, 0.3, 3], [-1.2, 2.0, 3], [1.2, 2.0, 3],
                 [1.2, 0.3, 3]), 1)
        return (np.asarray(tris, F), np.asarray(tm, np.uint32), mats,
                (0.0, 0.8, 2.0))
    if kind in ("chain0", "chain03"):
        rough = 0.0 if kind == "chain0" else 0.3
        mats = np.stack([
            mat_row(kd=(0.9, 0.9, 0.9), roughness=rough, metalness=1.0,
                    ref_ix=50.0),                       # mirror wall
            mat_row(kd=(0.7, 0.7, 0.7)),                # diffuse floor
            mat_row(ke=(15.0, 15.0, 15.0)),             # ceiling light
        ])
        add(quad([-4, -1, -1], [4, -1, -1], [4, 5, -1], [-4, 5, -1]), 0)
        add(quad([-4, -1, 4], [4, -1, 4], [4, -1, -1], [-4, -1, -1]), 1)
        # ceiling light wound like cornell_like's (normal -y, downward)
        add(quad([-1, 3.5, 2.5], [-1, 3.5, 0.5], [1, 3.5, 0.5],
                 [1, 3.5, 2.5]), 2)
        return (np.asarray(tris, F), np.asarray(tm, np.uint32), mats,
                (0.0, 0.8, 2.0))
    if kind == "diffuse":
        mats = np.stack([
            mat_row(kd=(0.7, 0.7, 0.7)),
            mat_row(ke=(15.0, 15.0, 15.0)),
        ])
        add(quad([-4, -4, -1], [4, -4, -1], [4, 4, -1], [-4, 4, -1]), 0)
        add(quad([-1, 3.5, 2.5], [-1, 3.5, 0.5], [1, 3.5, 0.5],
                 [1, 3.5, 2.5]), 1)
        return (np.asarray(tris, F), np.asarray(tm, np.uint32), mats,
                (0.0, 0.8, 2.0))
    raise ValueError(kind)


def cmd_probe(size=24, ref_spp=1024, jax_spp=1024,
              kinds=("diffuse", "metal0", "metal03", "chain0", "chain03")):
    from verify.compare import zstats

    for kind in kinds:
        tris, tm, mats = _probe_scene(kind)[:3]
        origin = _probe_scene(kind)[3]
        mean_r, var_r, _ = R.render(7, size, size, ref_spp, tris, tm,
                                    mats, cam_origin=origin)

        import tracer_tpu as T
        s = T.init(0, size, size, 0, tris, tm, mats, cam_origin=origin)
        mean_j = np.asarray(T.sample_n_frames(s, jax_spp))
        st = zstats(mean_r, var_r, ref_spp, mean_j, jax_spp)
        rel = ", ".join(f"{v * 100:+.2f}%" for v in st["rel_energy"])
        print(f"{kind:8s} ref(G)={mean_r[..., 1].mean():.5f} "
              f"jax(G)={mean_j[..., 1].mean():.5f} "
              f"rel_energy=[{rel}] median|z|={st['median_abs']:.3f} "
              f"frac>5={st['frac_gt5'] * 100:.2f}%")


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("cmd", choices=["terms", "rr", "probe", "depth",
                                    "reuse", "surgery", "chdecor"])
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--kinds", default=None)
    a = ap.parse_args()
    if a.cmd == "terms":
        cmd_terms()
    elif a.cmd == "rr":
        cmd_rr(size=a.size or 32, spp=a.spp or 256)
    elif a.cmd == "depth":
        cmd_depth(size=a.size or 32, spp=a.spp or 256)
    elif a.cmd == "reuse":
        cmd_reuse(size=a.size or 32, spp=a.spp or 512)
    elif a.cmd == "surgery":
        cmd_surgery(size=a.size or 32, spp=a.spp or 256,
                    variants=a.kinds.split(",") if a.kinds else None)
    elif a.cmd == "chdecor":
        cmd_chdecor(size=a.size or 32, spp=a.spp or 512)
    else:
        kw = {}
        if a.size:
            kw["size"] = a.size
        if a.spp:
            kw["ref_spp"] = kw["jax_spp"] = a.spp
        if a.kinds:
            kw["kinds"] = tuple(a.kinds.split(","))
        cmd_probe(**kw)
