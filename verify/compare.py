"""Statistical comparison of tracer_tpu against the independent numpy
transliteration of the reference estimator (ref_estimator_numpy.py).

Both renderers estimate the same quantity — the per-pixel expected
sensor response of the reference estimator (integrator.fut:78-103) —
with independent RNGs, so their sample means must agree within combined
Monte-Carlo standard error.  The per-(pixel, channel) z-score

    z = (mean_jax - mean_ref) / sqrt(var * (1/n_ref + 1/n_jax))

(var = the reference side's per-sample variance, the same population
variance both sides draw from) is ~N(0, 1) under the null "same
estimator".  A systematic estimator divergence — wrong MIS weight
(direct.fut:118-121), lost emission term (integrator.fut:44-49), a
misread RR contract (integrator.fut:64-72), wrong lobe pdf
(material.fut:357-370) — biases z across whole pixel populations and
blows up chi2/dof; Monte-Carlo noise does not.

Used two ways:
  - tests/test_ref_estimator.py compares a committed golden npz
    (generated once by `python verify/ref_estimator_numpy.py`) against
    a fresh tracer_tpu render.
  - `python verify/compare.py` regenerates both sides and prints the
    full statistics table.
"""

from __future__ import annotations

import numpy as np


def zstats(mean_ref, var_ref, n_ref, mean_jax, n_jax, eps=1e-12):
    """z-score statistics between the reference-estimator mean image and
    a tracer_tpu mean image of the same scene/size.

    Returns a dict with:
      chi2_dof   mean z^2 over valid pixel-channels (~1.0 under null)
      median_abs median |z| (~0.674 under null, robust to fireflies)
      frac_gt5   fraction of |z| > 5 (should be ~0 under null)
      max_abs    max |z|
      rel_energy per-channel relative difference of the global mean
      n_valid    number of pixel-channels compared
    """
    mean_ref = np.asarray(mean_ref, np.float64)
    mean_jax = np.asarray(mean_jax, np.float64)
    var = np.asarray(var_ref, np.float64)
    se = np.sqrt(np.maximum(var, 0.0) * (1.0 / n_ref + 1.0 / n_jax))
    diff = mean_jax - mean_ref
    # pixel-channels that are deterministically zero on both sides
    # (never-lit geometry) carry no information; everything else with
    # zero sample variance but nonzero diff is itself a divergence, so
    # give it a tiny se and let it register as a huge z.
    valid = ~((se < eps) & (np.abs(diff) < eps))
    z = np.where(valid, diff / np.maximum(se, eps), 0.0)
    zv = z[valid]
    if zv.size == 0:  # fully deterministic-and-equal images
        zv = np.zeros(1)
    ref_e = mean_ref.reshape(-1, mean_ref.shape[-1]).mean(axis=0)
    jax_e = mean_jax.reshape(-1, mean_jax.shape[-1]).mean(axis=0)
    return dict(
        chi2_dof=float(np.mean(zv ** 2)),
        median_abs=float(np.median(np.abs(zv))),
        frac_gt5=float(np.mean(np.abs(zv) > 5.0)),
        max_abs=float(np.max(np.abs(zv))),
        rel_energy=((jax_e - ref_e) / np.maximum(np.abs(ref_e), eps)),
        n_valid=int(zv.size),
    )


def render_tracer(size, spp, seed=0, obj=None, conf=0,
                  cam_origin=(0.0, 0.8, 1.8)):
    """Render the same scene with tracer_tpu (mean image, (h, w, 3)).
    `obj` is an OBJ path or "proc:<fn>" naming a
    tracer_tpu.utils.testscenes constructor (e.g. the prism scene)."""
    import os
    import sys
    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import tracer_tpu as T
    obj = obj or os.path.join(
        os.environ.get("TRACER_ASSETS", "/root/reference/assets"),
        "CornellBox-Original.obj")
    if obj.startswith("proc:"):
        from tracer_tpu.utils import testscenes
        tris, tm, mats = getattr(testscenes, obj[5:])()
    else:
        from tracer_tpu.utils.objloader import load_obj
        tris, tm, mats = load_obj(obj)
    s = T.init(seed, size, size, conf, tris, tm, mats,
               cam_origin=cam_origin)
    return np.asarray(T.sample_n_frames(s, spp))


if __name__ == "__main__":
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--ref-spp", type=int, default=512)
    ap.add_argument("--jax-spp", type=int, default=256)
    ap.add_argument("--ref-npz", default=None,
                    help="reuse a saved ref_estimator_numpy npz")
    args = ap.parse_args()

    if args.ref_npz:
        d = np.load(args.ref_npz)
        mean_ref, var_ref, n_ref = d["mean"], d["var"], int(d["spp"])
    else:
        from verify.ref_estimator_numpy import render as ref_render
        from tracer_tpu.utils.objloader import load_obj
        import os
        tris, tm, mats = load_obj(os.path.join(
            os.environ.get("TRACER_ASSETS", "/root/reference/assets"),
            "CornellBox-Original.obj"))
        mean_ref, var_ref, n_ref = ref_render(
            0, args.size, args.size, args.ref_spp, tris, tm, mats)

    mean_jax = render_tracer(args.size, args.jax_spp)
    st = zstats(mean_ref, var_ref, n_ref, mean_jax, args.jax_spp)
    for k, v in st.items():
        print(f"{k:>12}: {v}")
