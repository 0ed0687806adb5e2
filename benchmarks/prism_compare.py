"""Structural dispersion comparison against the reference's committed
golden image (reference README.org:8, prism-dispersion.png).

The reference scene behind that image was never committed (assets/ has
only the Cornell/Mirror/Spectrum boxes), so a pixel RMSE is impossible;
what IS comparable is the physical signature of spectral dispersion:
per-channel intensity centroids monotonically ordered R -> G -> B along
one dispersion axis, because the refractive index falls with wavelength
(material.fut:38-41 dispersion hack; ops/materials.py equivalent).

Two statistics, for the two image kinds:

* band_stats — saturated-caustic centroids over the FLOOR band, for the
  reference's own converged image (76,700 accumulated frames):
    |R->B|: centroid displacement, as a fraction of image width
    t_G:    the G centroid's projection onto the R->B axis
            (0 < t_G < 1 means spectral ordering holds)
  Reference golden (this tool on /root/reference/prism-dispersion.png,
  caustic band = saturated bright floor pixels, HUD/red-wall excluded):
  |R->B| = 0.046 of width, t_G = 0.41 -> ordered R -> G -> B.
  (A unidirectional path tracer converges a floor caustic ~1000x too
  slowly for a committed golden render to use this statistic — at 512
  spp ours is still isolated fireflies.)

* dispersion_stats — per-channel ROW centroids of the light's image
  seen THROUGH the prism (testscenes.prism_scene): a deterministic
  specular path, converged at tens of spp, red above blue with ~1.5px
  R->B separation at 128^2 (same physics, fast-converging estimator).

Usage:
  python benchmarks/prism_compare.py <image.png|render.npz> [...]
  (.png uses band_stats on the floor band; .npz/.npy uses
  dispersion_stats on the through-prism band region)
"""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def band_stats(img, floor_from=0.55, x_from=0.0, sat_min=0.35,
               bright_min=0.15):
    """Dispersion statistics over the caustic band of an RGB image.

    img: (h, w, 3) float array (any scale).
    Returns dict with per-channel centroids, |R->B| as a width fraction,
    and t_G (G projected on the R->B axis)."""
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    mx = img.max(-1)
    mn = img.min(-1)
    sat = (mx - mn) / (mx + 1e-6)
    scale = np.quantile(mx, 0.99) + 1e-6
    mask = (sat > sat_min) & (mx > bright_min * scale)
    mask[:int(floor_from * h)] = False
    mask[:, :int(x_from * w)] = False
    ys, xs = np.nonzero(mask)
    if len(xs) < 16:
        return None
    sub = img[mask]
    cent = {}
    for c, name in enumerate("RGB"):
        wgt = sub[:, c] / (sub[:, c].sum() + 1e-12)
        cent[name] = np.array([(xs * wgt).sum(), (ys * wgt).sum()])
    d = cent["B"] - cent["R"]
    norm2 = float(d @ d)
    t_g = float((cent["G"] - cent["R"]) @ d / norm2) if norm2 > 0 else np.nan
    return {
        "n_pixels": int(len(xs)),
        "centroids": {k: v.tolist() for k, v in cent.items()},
        "rb_frac": float(np.hypot(*d)) / w,
        "t_g": t_g,
        "ordered": bool(0.0 < t_g < 1.0),
    }


def dispersion_stats(img, rows=None, cols=None, clip_q=0.999):
    """Per-channel row centroids of the through-prism dispersion band
    (testscenes.prism_scene geometry).

    img: (h, w, 3) float array. rows/cols: fractional (lo, hi) screen
    region of the band (defaults to testscenes.PRISM_BAND_ROWS/COLS).
    Intensities are clipped at the clip_q quantile inside the region so
    a single firefly cannot drag a centroid, and each channel's region
    median is subtracted as diffuse background (the band is 10-100x
    brighter than the wall glow behind it).

    Returns per-channel centroids (in rows), the R->B separation as a
    fraction of image height, and `ordered` (R above G above B — the
    dispersion hack's n falls with wavelength, so blue deviates most
    and lands lowest)."""
    if rows is None or cols is None:
        from tracer_tpu.utils import testscenes
        rows = rows or testscenes.PRISM_BAND_ROWS
        cols = cols or testscenes.PRISM_BAND_COLS
    img = np.asarray(img, np.float32)
    h, w, _ = img.shape
    r0, r1 = int(rows[0] * h), int(rows[1] * h)
    c0, c1 = int(cols[0] * w), int(cols[1] * w)
    sub = img[r0:r1, c0:c1]
    sub = np.minimum(sub, np.quantile(sub, clip_q))
    sub = np.maximum(sub - np.median(sub, axis=(0, 1)), 0.0)
    ys = np.arange(r0, r1, dtype=np.float64)
    cent = {}
    for c, name in enumerate("RGB"):
        wgt = sub[..., c].sum(axis=1)
        tot = wgt.sum()
        if tot <= 0:
            return None
        cent[name] = float((ys * wgt).sum() / tot)
    return {
        "centroids": cent,
        "rb_rows": cent["B"] - cent["R"],
        "rb_frac": (cent["B"] - cent["R"]) / h,
        "ordered": bool(cent["R"] < cent["G"] < cent["B"]),
    }


def load(path):
    if path.endswith(".npz"):
        return np.load(path)["img"].astype(np.float32)
    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def main():
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("images", nargs="+")
    ap.add_argument("--floor", action="store_true",
                    help="force the floor-caustic statistic (band_stats);"
                         " needs a converged caustic, e.g. the"
                         " reference's 76,700-frame screenshot")
    ap.add_argument("--band", action="store_true",
                    help="force the through-prism band statistic"
                         " (dispersion_stats); for renders of"
                         " testscenes.prism_scene at any spp")
    args = ap.parse_args()
    for path in args.images:
        img = load(path)
        # provenance default: the reference screenshot is the only image
        # with a converged floor caustic; every render of OUR prism
        # scene (npz golden or regenerated docs png) uses the
        # fast-converging through-prism band
        floor = args.floor or (not args.band and "reference" in path)
        if floor:
            x_from = 0.45 if "reference" in path else 0.0
            st = band_stats(img, x_from=x_from)
            if st is None:
                print(f"{path}: no caustic band found")
                continue
            print(f"{path}: n={st['n_pixels']} |R->B|={st['rb_frac']:.3f}w "
                  f"t_G={st['t_g']:.2f} ordered={st['ordered']}")
        else:
            st = dispersion_stats(img)
            if st is None:
                print(f"{path}: no through-prism band energy")
                continue
            c = st["centroids"]
            print(f"{path}: rows R={c['R']:.2f} G={c['G']:.2f} "
                  f"B={c['B']:.2f} |R->B|={st['rb_frac']:.4f}h "
                  f"ordered={st['ordered']}")


if __name__ == "__main__":
    main()
