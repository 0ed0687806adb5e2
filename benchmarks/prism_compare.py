"""Structural dispersion comparison against the reference's committed
golden image (reference README.org:8, prism-dispersion.png).

The reference scene behind that image was never committed (assets/ has
only the Cornell/Mirror/Spectrum boxes), so a pixel RMSE is impossible;
what IS comparable is the physical signature of spectral dispersion: in
a caustic/transmission region, the per-channel intensity centroids must
be monotonically ordered R -> G -> B along one dispersion axis, because
the refractive index falls with wavelength (material.fut:38-41
dispersion hack; ops/materials.py equivalent).

This tool computes that statistic for any image:
  - |R->B|: centroid displacement, as a fraction of image width
  - t_G:    the G centroid's projection onto the R->B axis
            (0 < t_G < 1 means spectral ordering holds)

Reference golden (this tool run on /root/reference/prism-dispersion.png,
caustic band = saturated bright floor pixels, HUD/red-wall excluded):
  |R->B| = 0.046 of width, t_G = 0.41 -> ordered R -> G -> B.

Usage:
  python benchmarks/prism_compare.py <image.png|render.npz> [...]
"""

import sys

import numpy as np


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


def load(path):
    if path.endswith(".npz"):
        return np.load(path)["img"].astype(np.float32)
    from PIL import Image
    return np.asarray(Image.open(path).convert("RGB"), np.float32) / 255.0


def main():
    for path in sys.argv[1:]:
        img = load(path)
        # reference screenshot: exclude its red left wall like the
        # recorded golden numbers; renders of our prism scene view the
        # whole floor
        x_from = 0.45 if path.endswith(".png") and "reference" in path else 0.0
        st = band_stats(img, x_from=x_from)
        if st is None:
            print(f"{path}: no caustic band found")
            continue
        print(f"{path}: n={st['n_pixels']} |R->B|={st['rb_frac']:.3f}w "
              f"t_G={st['t_g']:.2f} ordered={st['ordered']}")


if __name__ == "__main__":
    main()
