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


def prism_scene():
    """Glass-prism dispersion scene in the spirit of the reference's
    golden prism-dispersion.png (README.org:8): a bright narrow strip
    light shines through a triangular glass prism onto the floor; the
    wavelength-dependent refractive index (material.fut:38-41 dispersion
    hack) fans the hero wavelengths into a rainbow caustic."""
    white, red = (0.73, 0.71, 0.68), (0.63, 0.065, 0.05)
    mats = np.stack([
        mat_row(kd=white),                                    # 0 walls
        mat_row(kd=red),                                      # 1 left wall
        # glass: pure specular transmission, strong dispersion
        mat_row(kd=(0, 0, 0), roughness=0.0, metalness=0.0,
                ref_ix=1.6, opacity=0.0),                     # 2 prism
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

    # triangular prism: apex-up cross-section in xy, extruded along z
    a0, a1 = [-0.35, 0.7, 0], [0.35, 0.7, 0]   # base corners (x, y)
    ap = [0.0, 1.35, 0]                        # apex
    z0, z1 = -0.35, 0.35
    p = lambda v, z: [v[0], v[1], z]
    add([[p(a0, z0), p(a1, z0), p(ap, z0)]], 2)                    # cap z0
    add([[p(a1, z1), p(a0, z1), p(ap, z1)]], 2)                    # cap z1
    add(quad(p(a0, z0), p(a0, z1), p(ap, z1), p(ap, z0)), 2)       # left face
    add(quad(p(a1, z1), p(a1, z0), p(ap, z0), p(ap, z1)), 2)       # right face
    add(quad(p(a0, z1), p(a0, z0), p(a1, z0), p(a1, z1)), 2)       # bottom

    # narrow bright strip light high on the left, aimed across the prism
    add(quad([-0.95, 1.9, -0.1], [-0.95, 1.9, 0.1],
             [-0.75, 1.98, 0.1], [-0.75, 1.98, -0.1]), 3)

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
