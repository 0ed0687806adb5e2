"""OBJ/MTL loader: Python parser semantics + native C++ parity."""

import os

import numpy as np
import pytest

from tracer_tpu.utils import native
from tracer_tpu.utils.objloader import _load_obj_py, load_obj

ASSETS = os.environ.get("TRACER_ASSETS", "/root/reference/assets")
SCENES = ["CornellBox-Original", "MirrorBox", "SpectrumSphere",
          "SpectrumSphereHigh"]

needs_assets = pytest.mark.skipif(
    not os.path.isdir(ASSETS), reason="reference assets not mounted")


def write_tiny_scene(tmp_path):
    (tmp_path / "s.mtl").write_text("""
newmtl red
  Kd 0.8 0.1 0.2
  Ni 1.4
  Pr 0.3
  Pm 0.6
  Tf 0.5
newmtl glow
  Kd 0 0 0
  Ke 2 3 4
newmtl spectral
  Sp 500 1.0 600 0.5
  Em 450 2.0
""")
    (tmp_path / "s.obj").write_text("""
mtllib s.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
usemtl red
f 1 2 3 4
usemtl glow
f -4 -3 -2
usemtl spectral
f 1 2 4
""")
    return str(tmp_path / "s.obj")


@pytest.mark.smoke
def test_python_loader_tiny(tmp_path):
    tris, tm, mats = _load_obj_py(write_tiny_scene(tmp_path))
    assert tris.shape == (4, 3, 3)  # quad -> 2 tris + 2 single tris
    assert tm.tolist() == [0, 0, 1, 2]
    assert mats.shape == (3, 28)
    # red: RGB fallback knots
    assert mats[0, 0:6].tolist() == [610.0, np.float32(0.8), 550.0,
                                     np.float32(0.1), 460.0, np.float32(0.2)]
    assert np.allclose(mats[0, 12:16], [0.3, 0.6, 1.4, 0.5])
    # glow: Ke fallback emission
    assert np.allclose(mats[1, 16:22], [610, 2, 550, 3, 460, 4])
    # spectral: Sp/Em pairs padded with (-1, 0)
    assert np.allclose(mats[2, 0:6], [500, 1.0, 600, 0.5, -1, 0])
    assert np.allclose(mats[2, 16:20], [450, 2.0, -1, 0])


def test_negative_and_positive_indices_equal(tmp_path):
    p = write_tiny_scene(tmp_path)
    tris, _, _ = _load_obj_py(p)
    # f -4 -3 -2 over the same 4 verts == f 1 2 3
    assert np.allclose(tris[2], tris[0])


@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.smoke
def test_native_matches_python_tiny(tmp_path):
    p = write_tiny_scene(tmp_path)
    pt, pm, pmat = _load_obj_py(p)
    nt, nm, nmat = native.load_obj(p)
    np.testing.assert_array_equal(pt, nt)
    np.testing.assert_array_equal(pm, nm)
    np.testing.assert_array_equal(pmat, nmat)


@needs_assets
@pytest.mark.skipif(not native.available(), reason="no native toolchain")
@pytest.mark.parametrize("scene", SCENES)
def test_native_matches_python_reference_assets(scene):
    path = os.path.join(ASSETS, scene + ".obj")
    pt, pm, pmat = _load_obj_py(path)
    nt, nm, nmat = native.load_obj(path)
    np.testing.assert_array_equal(pt, nt)
    np.testing.assert_array_equal(pm, nm)
    np.testing.assert_array_equal(pmat, nmat)


@needs_assets
def test_reference_scene_sizes():
    """Triangle counts for the stock scenes (BASELINE.md)."""
    sizes = {}
    for scene in SCENES:
        tris, _, _ = load_obj(os.path.join(ASSETS, scene + ".obj"))
        sizes[scene] = tris.shape[0]
    assert sizes["SpectrumSphere"] == 2188
    assert sizes["SpectrumSphereHigh"] == 8716
    assert sizes["CornellBox-Original"] == 44   # 22 quad-ish faces -> tris
    assert sizes["MirrorBox"] == 38


def test_native_pcd_writer(tmp_path):
    if not native.available():
        pytest.skip("no native toolchain")
    pts = np.arange(32, dtype=np.float32).reshape(8, 4)
    p = str(tmp_path / "n.pcd")
    native.write_pcd(p, pts)
    lines = open(p).read().splitlines()
    assert lines[2] == "FIELDS x y z intensity"
    assert lines[9] == "POINTS 8"
    assert len(lines) == 11 + 8
