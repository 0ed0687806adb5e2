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
                    cam_origin=(0.0, 0.8, 0.9)):  # make_golden.py mirrorbox
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
        st, total = _path_trace_flagged(st, o, d, wl, trs, mats, lights,
                                        ieee_rr, counters)
        vals = (F(3.0) * total)[:, None] * R.SENSOR_COLOR[ch]
        sum_img += vals.reshape(fc, npix, 3).astype(np.float64).sum(axis=0)
    return sum_img.reshape(h, w, 3) / spp, counters


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
    ap.add_argument("cmd", choices=["terms", "rr", "probe"])
    ap.add_argument("--size", type=int, default=None)
    ap.add_argument("--spp", type=int, default=None)
    ap.add_argument("--kinds", default=None)
    a = ap.parse_args()
    if a.cmd == "terms":
        cmd_terms()
    elif a.cmd == "rr":
        cmd_rr(size=a.size or 32, spp=a.spp or 256)
    else:
        kw = {}
        if a.size:
            kw["size"] = a.size
        if a.spp:
            kw["ref_spp"] = kw["jax_spp"] = a.spp
        if a.kinds:
            kw["kinds"] = tuple(a.kinds.split(","))
        cmd_probe(**kw)
