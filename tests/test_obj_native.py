"""Native (C++) vs Python OBJ parser parity (bhrt_obj_* in bhrt_native.cpp).

The native path is the cyTriMesh.h:263+ counterpart for the geometry hot
loop; it must be BIT-IDENTICAL to the Python parser on every field,
including index-form edge cases (v | v/t | v//n | v/t/n, negative indices,
quads via fan triangulation, usemtl slots by first use, mtllib paths with
spaces)."""

import os

import numpy as np
import pytest

from bhraytracer_tpu.native import have_native
from bhraytracer_tpu.scene.obj_loader import load_obj

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

TRICKY = """# tricky obj
mtllib my materials.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vt 0 0
vt 1 0
vt 1 1
vn 0 0 1
usemtl matA
f 1/1 2/2 3/3 4/1
f -1 -2 -3
usemtl matB
f 1//1 2//1 3//1
usemtl matA
f 1/1/1 2/2/1 5/3/1
"""

MTL = """newmtl matA
Kd 0.5 0.25 0.125
Ns 12.5
newmtl matB
Kd 0.1 0.9 0.1
illum 3
"""


@pytest.fixture
def assets(gen_assets_root):
    return gen_assets_root


def _assert_same(a, b):
    for f in ("verts", "faces", "normals", "face_normals", "uvs",
              "face_uvs", "face_mtl"):
        np.testing.assert_array_equal(getattr(a, f), getattr(b, f),
                                      err_msg=f)
    assert a.mtl_names == b.mtl_names
    # obj_materials holds numpy fields; MTL parsing is shared code, so name
    # identity pins that the mtllib list crossed the ABI intact.
    assert ([m["name"] for m in a.obj_materials]
            == [m["name"] for m in b.obj_materials])


@pytest.mark.skipif(not have_native(), reason="no native lib")
def test_tricky_forms_native_matches_python(tmp_path):
    p = tmp_path / "tricky.obj"
    p.write_text(TRICKY)
    (tmp_path / "my materials.mtl").write_text(MTL)
    nat = load_obj(str(p), native=True)
    py = load_obj(str(p), native=False)
    _assert_same(nat, py)
    assert py.mtl_names == ["matA", "matB"]
    assert py.faces.shape[0] == 5  # quad fans into 2 tris + 3 single tris
    assert [m["name"] for m in py.obj_materials] == ["matA", "matB"]
    # usemtl slots by first use: A, A, B, A.
    np.testing.assert_array_equal(py.face_mtl, [0, 0, 0, 1, 0])


@pytest.mark.skipif(not have_native(), reason="no native lib")
def test_generated_assets_native_matches_python(assets):
    import glob

    objs = sorted(glob.glob(os.path.join(assets, "Resource", "**", "*.obj"),
                            recursive=True))
    assert len(objs) >= 10
    for path in objs:
        _assert_same(load_obj(path, native=True), load_obj(path, native=False))


def test_malformed_face_raises(tmp_path):
    """A bad face index must RAISE (Python parser semantics) — the native
    parser flags the error and defers to Python rather than silently
    dropping the corner."""
    p = tmp_path / "bad.obj"
    p.write_text("v 0 0 0\nv 1 0 0\nv 0 1 0\nf 1 x 3\n")
    with pytest.raises(ValueError):
        load_obj(str(p))
