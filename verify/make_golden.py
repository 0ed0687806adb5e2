"""Regenerate the independent numpy-estimator goldens in tests/goldens/
used by tests/test_ref_estimator.py.

Each golden is two renders of the same scene by
verify/ref_estimator_numpy.py: the 512-spp golden (seed 0: mean +
per-sample variance, the z-score denominator) and a 256-spp
same-estimator CONTROL probe (seed 7: mean only) whose z-stats against
the golden calibrate the heavy-tailed Monte-Carlo null that the tracer
must match.

Scenes (each pins a different part of the estimator):
  cornell    64x64  CornellBox-Original — diffuse + NEE/MIS + RR
             (integrator.fut:27-76, direct.fut:63-122), ~13 min
  mirrorbox  32x32  MirrorBox — metal/mirror lobes + deep specular
             paths (material.fut:346-355), ~6 min
  prism      32x32  procedural glass prism — refraction + the ref_ix
             dispersion hack + caustics (material.fut:38-41, :166-183),
             ~5 min

    python -m verify.make_golden [--scenes cornell,mirrorbox,prism]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

ASSETS = os.environ.get("TRACER_ASSETS", "/root/reference/assets")

# name -> (obj path | "proc:<testscenes fn>", cam_origin, size, spp,
#          spp_ctrl, golden filename)
SCENES = {
    "cornell": (os.path.join(ASSETS, "CornellBox-Original.obj"),
                (0.0, 0.8, 1.8), 64, 512, 256, "ref_numpy_cornell64.npz"),
    "mirrorbox": (os.path.join(ASSETS, "MirrorBox.obj"),
                  (0.0, 0.8, 0.9), 32, 512, 256,
                  "ref_numpy_mirrorbox32.npz"),
    "prism": ("proc:prism_scene", (0.0, 0.9, 2.6), 32, 512, 256,
              "ref_numpy_prism32.npz"),
}
SEED, SEED_CTRL = 0, 7


def load_scene(spec):
    if spec.startswith("proc:"):
        from tracer_tpu.utils import testscenes
        return getattr(testscenes, spec[5:])()
    from tracer_tpu.utils.objloader import load_obj
    return load_obj(spec)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scenes", default="cornell,mirrorbox,prism")
    ap.add_argument("--outdir", default=os.path.join(ROOT, "tests",
                                                     "goldens"))
    ap.add_argument("--engine", choices=["minstd", "pcg"],
                    default="minstd",
                    help="RNG engine: minstd = bitwise reference "
                         "(cpprandom); pcg = the tracer's counter-PCG "
                         "ported into the oracle (verify/bisect_mirror."
                         "_pcg_patch) — isolates estimator semantics "
                         "from engine-induced bias (docs/PARITY.md "
                         "'mirrorbox investigation')")
    args = ap.parse_args()

    from verify.ref_estimator_numpy import render
    if args.engine == "pcg":
        from verify.bisect_mirror import _pcg_patch
        _pcg_patch()

    for name in args.scenes.split(","):
        spec, origin, size, spp, spp_ctrl, fname = SCENES[name]
        tris, tm, mats = load_scene(spec)
        out = os.path.join(args.outdir, fname)
        t0 = time.time()
        mean, var, _ = render(SEED, size, size, spp, tris, tm, mats,
                              cam_origin=origin)
        mean_c, _, _ = render(SEED_CTRL, size, size, spp_ctrl, tris, tm,
                              mats, cam_origin=origin)
        np.savez_compressed(
            out, mean=mean.astype(np.float32), var=var.astype(np.float32),
            spp=spp, mean_ctrl=mean_c.astype(np.float32),
            spp_ctrl=spp_ctrl, seed=SEED, seed_ctrl=SEED_CTRL, size=size,
            origin=np.asarray(origin, np.float32),
            engine=np.str_(args.engine))
        print(f"{name}: wrote {out} in {time.time() - t0:.0f}s",
              flush=True)


if __name__ == "__main__":
    main()
