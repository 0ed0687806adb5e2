"""Procedural test scenes (standalone — no asset files needed).

Used by tests and the driver entry when the reference assets are not
present. The cornell_like scene mimics the classic Cornell box layout
(colored side walls, white box interior, ceiling area light, one block)
with the loader's 28-float material rows.
"""

from __future__ import annotations

import numpy as np

RED_WAVELEN, GREEN_WAVELEN, BLUE_WAVELEN = 610.0, 550.0, 460.0


def _rgb_knots(r, g, b):
    return [RED_WAVELEN, r, GREEN_WAVELEN, g, BLUE_WAVELEN, b,
            -1.0, 0.0, -1.0, 0.0, -1.0, 0.0]


def mat_row(kd=(0, 0, 0), ke=(0, 0, 0), roughness=1.0, metalness=0.0,
            ref_ix=1.0, opacity=1.0) -> np.ndarray:
    row = (_rgb_knots(*kd) + [roughness, metalness, ref_ix, opacity]
           + _rgb_knots(*ke))
    return np.asarray(row, np.float32)


def quad(a, b, c, d):
    """Two triangles for the quad a-b-c-d (fan split, like the loader)."""
    return [[a, b, c], [a, c, d]]


def cornell_like():
    """(tris (T,3,3), tri_mats (T,), mats (M,28)) for a cornell-style box:
    x in [-1,1], y in [0,2], z in [-1,1], camera looks down -z."""
    white, red, green = (0.73, 0.71, 0.68), (0.63, 0.065, 0.05), (0.14, 0.45, 0.09)
    mats = np.stack([
        mat_row(kd=white),                       # 0 floor/ceiling/back
        mat_row(kd=red),                         # 1 left wall
        mat_row(kd=green),                       # 2 right wall
        mat_row(kd=white),                       # 3 block
        mat_row(ke=(27.0, 22.0, 14.0)),          # 4 light
    ])
    tris, tm = [], []

    def add(ts, m):
        tris.extend(ts)
        tm.extend([m] * len(ts))

    add(quad([-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1]), 0)    # floor
    add(quad([-1, 2, 1], [-1, 2, -1], [1, 2, -1], [1, 2, 1]), 0)    # ceiling
    add(quad([-1, 0, -1], [1, 0, -1], [1, 2, -1], [-1, 2, -1]), 0)  # back
    add(quad([-1, 0, 1], [-1, 0, -1], [-1, 2, -1], [-1, 2, 1]), 1)  # left
    add(quad([1, 0, -1], [1, 0, 1], [1, 2, 1], [1, 2, -1]), 2)      # right
    # block
    x0, x1, y1, z0, z1 = -0.45, 0.15, 1.1, -0.5, 0.1
    add(quad([x0, 0, z1], [x1, 0, z1], [x1, y1, z1], [x0, y1, z1]), 3)
    add(quad([x1, 0, z0], [x0, 0, z0], [x0, y1, z0], [x1, y1, z0]), 3)
    add(quad([x0, 0, z0], [x0, 0, z1], [x0, y1, z1], [x0, y1, z0]), 3)
    add(quad([x1, 0, z1], [x1, 0, z0], [x1, y1, z0], [x1, y1, z1]), 3)
    add(quad([x0, y1, z1], [x1, y1, z1], [x1, y1, z0], [x0, y1, z0]), 3)
    # ceiling light (slightly below the ceiling, facing down)
    add(quad([-0.24, 1.98, 0.16], [-0.24, 1.98, -0.22],
             [0.23, 1.98, -0.22], [0.23, 1.98, 0.16]), 4)

    return (np.asarray(tris, np.float32), np.asarray(tm, np.uint32), mats)


# Through-prism dispersion band: fractional (row, col) screen region at
# the stock camera (origin (0, 0.9, 2.6), conf 0) where the refracted
# image of the ceiling strip lands. Derived from the 2D cross-section
# trace used to place the light (see prism_scene) and confirmed by
# render: per-channel row centroids at 128x128 are R 57.8, G 58.6,
# B 59.2 (R above B, ~1.4px apart). The rows window is tight around the
# band — the band's position is a deterministic function of the fixed
# geometry, and a loose window lets caustic fireflies dilute the
# centroid separation.
PRISM_BAND_ROWS = (0.43, 0.505)
PRISM_BAND_COLS = (0.36, 0.64)


def prism_scene():
    """Glass-prism dispersion scene in the spirit of the reference's
    golden prism-dispersion.png (README.org:8): a ceiling strip light
    seen THROUGH a triangular glass prism; the wavelength-dependent
    refractive index (material.fut:38-41 dispersion hack) fans the hero
    wavelengths so the light's refracted image is a rainbow band, red
    above blue.

    Design notes (2D cross-section trace, this repo's history): the
    prism is extruded along x with an apex-DOWN cross-section in (y, z)
    so camera rays (origin (0, 0.9, 2.6), looking -z) enter the lower
    front face near minimum deviation and exit up-back toward the
    ceiling; a strip at z ~ -0.6 intercepts the exit fan where
    d(exit)/d(entry) is flat, which amplifies the per-wavelength row
    separation to ~1.5px at 128^2 (R->B) across a ~35px-wide band. A
    floor caustic exists too but converges ~1000x slower (the reference
    accumulated 76,700 frames for its golden image) — the through-prism
    band is the statistic a committed golden can pin."""
    white, red = (0.73, 0.71, 0.68), (0.63, 0.065, 0.05)
    mats = np.stack([
        mat_row(kd=white),                                    # 0 walls
        mat_row(kd=red),                                      # 1 left wall
        # glass: pure specular transmission with the stock dispersion
        # slope; n = 1.5 keeps the exit below total internal reflection
        mat_row(kd=(0, 0, 0), roughness=0.0, metalness=0.0,
                ref_ix=1.5, opacity=0.0),                     # 2 prism
        mat_row(ke=(60.0, 60.0, 60.0)),                       # 3 strip light
    ])
    tris, tm = [], []

    def add(ts, m):
        tris.extend(ts)
        tm.extend([m] * len(ts))

    add(quad([-1, 0, 1], [1, 0, 1], [1, 0, -1], [-1, 0, -1]), 0)    # floor
    add(quad([-1, 2, 1], [-1, 2, -1], [1, 2, -1], [1, 2, 1]), 0)    # ceiling
    add(quad([-1, 0, -1], [1, 0, -1], [1, 2, -1], [-1, 2, -1]), 0)  # back
    add(quad([-1, 0, 1], [-1, 0, -1], [-1, 2, -1], [-1, 2, 1]), 1)  # left
    add(quad([1, 0, -1], [1, 0, 1], [1, 2, 1], [1, 2, -1]), 0)      # right

    # triangular prism: apex-DOWN cross-section in (y, z), extruded
    # along x; the camera below looks up through the apex wedge
    ap = [0.95, 0.0]                 # apex (y, z)
    bf = [1.55, 0.33]                # base corner, front (+z)
    br = [1.55, -0.33]               # base corner, rear (-z)
    x0, x1 = -0.7, 0.7
    p = lambda v, x: [x, v[0], v[1]]
    add([[p(ap, x0), p(bf, x0), p(br, x0)]], 2)                    # cap x0
    add([[p(ap, x1), p(br, x1), p(bf, x1)]], 2)                    # cap x1
    add(quad(p(ap, x0), p(ap, x1), p(bf, x1), p(bf, x0)), 2)       # front
    add(quad(p(ap, x1), p(ap, x0), p(br, x0), p(br, x1)), 2)       # rear
    add(quad(p(bf, x0), p(bf, x1), p(br, x1), p(br, x0)), 2)       # base
    # ceiling strip light placed where the near-minimum-deviation exit
    # fan crosses the ceiling (2D trace: z = -0.6 maximizes separation)
    add(quad([-0.8, 1.99, -0.55], [-0.8, 1.99, -0.65],
             [0.8, 1.99, -0.65], [0.8, 1.99, -0.55]), 3)

    return (np.asarray(tris, np.float32), np.asarray(tm, np.uint32), mats)


def single_triangle(mat=None):
    """Minimal scene: one triangle at z=-2 facing +z."""
    if mat is None:
        mat = mat_row(kd=(0.8, 0.8, 0.8))
    tris = np.asarray([[[-1, -1, -2], [1, -1, -2], [0, 1, -2]]], np.float32)
    return tris, np.zeros((1,), np.uint32), mat[None]


def subdivide(tris, tri_mats, levels: int = 1):
    """Midpoint 1->4 triangle subdivision (levels times): same surface,
    4^levels the triangle count. Big-scene stress helper — turns the
    8716-face SpectrumSphereHigh into a 139k-face scene at levels=2."""
    tris = np.asarray(tris, np.float32).reshape(-1, 3, 3)
    tm = np.asarray(tri_mats)
    for _ in range(levels):
        a, b, c = tris[:, 0], tris[:, 1], tris[:, 2]
        ab, bc, ca = (a + b) * 0.5, (b + c) * 0.5, (c + a) * 0.5
        tris = np.concatenate([
            np.stack([a, ab, ca], axis=1),
            np.stack([ab, b, bc], axis=1),
            np.stack([ca, bc, c], axis=1),
            np.stack([ab, bc, ca], axis=1)], axis=0)
        tm = np.concatenate([tm, tm, tm, tm], axis=0)
    return tris, tm
