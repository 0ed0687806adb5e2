"""OBJ/MTL asset loader (host side; replaces the ljus Rust crate).

Produces the exact buffer layout the engine's init consumes — the same
ABI the reference loader feeds Futhark (ljus/src/lib.rs:11-32):
    tris     f32 (T, 3, 3)   vertex positions per triangle
    tri_mats u32 (T,)        material index per triangle
    mats     f32 (M, 28)     12 color knots | Pr Pm Ni Tf | 12 emission knots

Custom MTL extensions (ljus/src/lib.rs:57-89):
    Sp  spectral color: up to 6 (wavelength, intensity) pairs
    Em  spectral emission, same encoding
    Pr  roughness (default 1.0)     Pm  metalness (default 0.0)
    Tf  opacity (default 1.0)       Ni  refractive index (default 1.0)
Fallback when Sp/Em are absent: RGB Kd/Ke mapped to knots at
610/550/460 nm (ljus/src/lib.rs:7-9, :57-70).

A native C++ implementation with identical output lives in
tracer_tpu/native/; this Python version is the reference/fallback and the
one used in tests.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field

import numpy as np

RED_WAVELEN = 610.0
GREEN_WAVELEN = 550.0
BLUE_WAVELEN = 460.0


@dataclass
class _Mtl:
    name: str
    kd: tuple = (0.0, 0.0, 0.0)
    ke: tuple = (0.0, 0.0, 0.0)
    ni: float = 1.0
    extras: dict = field(default_factory=dict)  # Sp/Em/Pr/Pm/Tf raw strings


def _parse_floats(s: str):
    return [float(t) for t in s.split()]


def parse_mtl(path: str) -> list[_Mtl]:
    """Parse a .mtl file keeping material declaration order (which defines
    the material indices, as in tobj)."""
    mats: list[_Mtl] = []
    cur: _Mtl | None = None
    with open(path, "r") as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split(None, 1)
            tag = parts[0]
            rest = parts[1].strip() if len(parts) > 1 else ""
            if tag == "newmtl":
                cur = _Mtl(name=rest)
                mats.append(cur)
            elif cur is None:
                continue
            elif tag == "Kd":
                cur.kd = tuple(_parse_floats(rest)[:3])
            elif tag == "Ke":
                cur.ke = tuple(_parse_floats(rest)[:3])
            elif tag == "Ni":
                cur.ni = _parse_floats(rest)[0]
            elif tag in ("Sp", "Em", "Pr", "Pm", "Tf"):
                cur.extras[tag] = rest
    return mats


def _spectrum12(raw: str | None, rgb_fallback) -> list[float]:
    """Encode a spectrum as 12 floats: Sp/Em pairs padded with (-1, 0), or
    the RGB fallback at the three reference wavelengths."""
    if raw is not None:
        vals = _parse_floats(raw)
        out = (vals + [-1.0, 0.0] * 6)[:12]
        return out
    r, g, b = rgb_fallback
    return [RED_WAVELEN, r, GREEN_WAVELEN, g, BLUE_WAVELEN, b,
            -1.0, 0.0, -1.0, 0.0, -1.0, 0.0]


def _mat_row(m: _Mtl) -> np.ndarray:
    color = _spectrum12(m.extras.get("Sp"), m.kd)
    emission = _spectrum12(m.extras.get("Em"), m.ke)
    roughness = (float(m.extras["Pr"]) if "Pr" in m.extras else 1.0)
    metalness = (float(m.extras["Pm"]) if "Pm" in m.extras else 0.0)
    opacity = (float(_parse_floats(m.extras["Tf"])[0])
               if "Tf" in m.extras else 1.0)
    row = color + [roughness, metalness, m.ni, opacity] + emission
    return np.asarray(row, np.float32)


def load_obj(path: str, verbose: bool = False, backend: str = "auto"):
    """Load an OBJ with its MTL. Returns (tris (T,3,3) f32,
    tri_mats (T,) u32, mats (M,28) f32).

    backend: "auto" prefers the native C++ loader (tracer_tpu/native)
    and falls back to this Python implementation; "python" / "native"
    force one."""
    if backend in ("auto", "native"):
        try:
            from tracer_tpu.utils import native
            if native.available():
                tris, tri_mats, mats = native.load_obj(path)
                if verbose:
                    print(f"no of triangles: {tris.shape[0]}")
                return tris, tri_mats, mats
        except Exception:
            if backend == "native":
                raise
    return _load_obj_py(path, verbose)


def _load_obj_py(path: str, verbose: bool = False):
    """Pure-Python OBJ/MTL parser (reference implementation)."""
    vertices: list[list[float]] = []
    tris: list[list[list[float]]] = []
    tri_mats: list[int] = []
    mtls: list[_Mtl] = []
    mat_index: dict[str, int] = {}
    cur_mat: int | None = None
    base = os.path.dirname(os.path.abspath(path))

    with open(path, "r") as f:
        for raw in f:
            line = raw.split("#", 1)[0].strip()
            if not line:
                continue
            parts = line.split(None, 1)
            tag = parts[0]
            rest = parts[1].strip() if len(parts) > 1 else ""
            if tag == "v":
                vertices.append(_parse_floats(rest)[:3])
            elif tag == "mtllib":
                mtls = parse_mtl(os.path.join(base, rest))
                mat_index = {m.name: i for i, m in enumerate(mtls)}
            elif tag == "usemtl":
                if rest not in mat_index:
                    raise ValueError(f"unknown material {rest!r} in {path}")
                cur_mat = mat_index[rest]
            elif tag == "f":
                idxs = []
                for tok in rest.split():
                    vi = tok.split("/")[0]
                    i = int(vi)
                    idxs.append(i - 1 if i > 0 else len(vertices) + i)
                if cur_mat is None:
                    raise ValueError(f"face without material in {path}")
                # fan triangulation of polygons (quads in the stock scenes)
                for k in range(1, len(idxs) - 1):
                    tris.append([vertices[idxs[0]], vertices[idxs[k]],
                                 vertices[idxs[k + 1]]])
                    tri_mats.append(cur_mat)

    tris_np = np.asarray(tris, np.float32).reshape(-1, 3, 3)
    tri_mats_np = np.asarray(tri_mats, np.uint32)
    mats_np = (np.stack([_mat_row(m) for m in mtls])
               if mtls else np.zeros((0, 28), np.float32))
    if verbose:
        print(f"no of triangles: {tris_np.shape[0]}")
    return tris_np, tri_mats_np, mats_np
