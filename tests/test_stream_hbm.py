"""Grouped HBM stream kernel (big-mesh path) vs the XLA reference traversal.

Runs interpreted on CPU (conftest). Uses the 1,408-face teapot with GROUP
shrunk to 256 so the group sweep/culling logic is exercised on many groups;
hbm routing itself is forced by calling the kernels directly (the real gate
needs >8,192 faces — covered by the 112K-face bench leg on hardware).

Same seam tolerance as test_stream.py: affine-barycentric edge rounding can
swap equal-t seam faces.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bhraytracer_tpu.ops.linalg import BIG
from bhraytracer_tpu.ops import pallas_stream_hbm as H
from bhraytracer_tpu.ops.trace import MESH_SHADOW_BIAS, bvh_anyhit, bvh_closest

from tests.test_stream import mesh_pack, _rays  # noqa: F401 (fixture reuse)


@pytest.fixture(autouse=True)
def small_groups():
    old = H.GROUP
    H.set_group_faces(256)
    yield
    H.set_group_faces(old)


@pytest.mark.parametrize("side", ["front", "both"])
def test_hbm_closest_matches_xla(mesh_pack, side):  # noqa: F811
    o, d = _rays(mesh_pack, 2048, 11)
    n = o.shape[0]
    ti = jnp.full((n,), BIG)
    t0, f0, fr0 = bvh_closest(mesh_pack, 0, o, d, side, ti)
    t1, f1, fr1 = H.stream_closest_hbm(mesh_pack, o, d, side, ti)
    t0, f0, fr0 = np.asarray(t0), np.asarray(f0), np.asarray(fr0)
    t1, f1, fr1 = np.asarray(t1), np.asarray(f1), np.asarray(fr1)
    hit0 = t0 < BIG
    hit1 = t1 < BIG
    assert hit0.sum() > 200
    assert (hit0 != hit1).mean() < 0.005
    both = hit0 & hit1
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)
    face_match = f1[both] == f0[both]
    assert face_match.mean() > 0.99
    if not face_match.all():
        np.testing.assert_allclose(t1[both][~face_match],
                                   t0[both][~face_match],
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(fr1[both][face_match],
                                  fr0[both][face_match])


def test_hbm_matches_flat_stream_sorted(mesh_pack):  # noqa: F811
    """On coherence-SORTED rays (the router's contract) the grouped kernel
    must agree with the flat stream kernel everywhere (same tie family)."""
    from bhraytracer_tpu.ops.compact import inverse_permutation
    from bhraytracer_tpu.ops.pallas_bvh import _coherence_order
    from bhraytracer_tpu.ops.pallas_stream import stream_closest

    o, d = _rays(mesh_pack, 2048, 12)
    ti = jnp.full((o.shape[0],), BIG)
    order = _coherence_order(mesh_pack, 0, o, d, ti)
    os_, ds_ = o[order], d[order]
    t0, f0, _ = stream_closest(mesh_pack, os_, ds_, "front", ti)
    t1, f1, _ = H.stream_closest_hbm(mesh_pack, os_, ds_, "front", ti)
    np.testing.assert_allclose(np.asarray(t1), np.asarray(t0),
                               rtol=1e-5, atol=1e-6)
    assert (np.asarray(f1) == np.asarray(f0)).mean() > 0.995
    assert inverse_permutation(order).shape == order.shape


def test_hbm_anyhit_matches_xla(mesh_pack):  # noqa: F811
    o, d = _rays(mesh_pack, 2048, 13)
    tm = jnp.full((o.shape[0],), 1.0)
    a0 = np.asarray(bvh_anyhit(mesh_pack, 0, o, d, MESH_SHADOW_BIAS, tm))
    a1 = np.asarray(H.stream_anyhit_hbm(mesh_pack, o, d,
                                        MESH_SHADOW_BIAS, tm))
    assert a0.sum() > 100
    assert (a0 != a1).mean() < 0.005


def test_hbm_analytic_fold(mesh_pack):  # noqa: F811
    """Sphere folded into the kernel: analytic winners carry the packet
    face coding and beat farther mesh hits."""
    from bhraytracer_tpu.ops.pallas_trace import instance_table

    itm = jnp.broadcast_to(jnp.eye(3, dtype=jnp.float32) / 0.4, (1, 3, 3))
    pos = jnp.asarray([[0.0, 0.0, 4.0]], jnp.float32)
    sph_tab = instance_table(itm, pos)
    n = 512
    o = jnp.tile(jnp.asarray([[0.0, 0.0, 8.0]], jnp.float32), (n, 1))
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (n, 1))
    t, face, front = H.stream_closest_hbm(
        mesh_pack, o, d, "front", jnp.full((n,), BIG), sph_tab=sph_tab)
    t = np.asarray(t)
    face = np.asarray(face)
    # The sphere at z=4 (radius .4) is hit at t ~ 3.6 before any teapot
    # face; face code -(2 + inst*4 + kind*2 + front) with kind=0 inst=0
    # front=1 -> -3, so face >> 1 (arithmetic) = -2 <= -2.
    assert (np.abs(t - 3.6) < 1e-3).all()
    assert (face <= -2).all()


def test_hbm_treelet_pack_unpadding():
    """_unpadded_faces reconstructs the contiguous global face table from a
    treelet pack (global face row == table row)."""
    import os
    import subprocess
    import sys

    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene
    from bhraytracer_tpu.scene.obj_loader import load_obj

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    hires = os.path.join(repo, "assets", "Resource", "Data",
                         "teapot_hires.obj")
    if not os.path.exists(hires):
        subprocess.run([sys.executable,
                        os.path.join(repo, "tools", "gen_assets.py"),
                        os.path.join(repo, "assets"), "--big"], check=True)
    sd = D.SceneDesc()
    sd.materials.append(D.MaterialDesc(name="m"))
    sd.meshes.append(load_obj(hires))
    sd.nodes.append(D.NodeDesc(kind="mesh", name="t",
                               transform=D.Transform(), material=0, mesh=0))
    pack = compile_scene(sd)
    assert pack.treelets, "hires mesh should build treelets"
    assert H.stream_hbm_traversable(pack)
    raw = np.asarray(H._unpadded_faces(pack))
    assert raw.shape[0] == pack.face_inst.shape[0]
    # Spot-check rows against the per-treelet blocks + ranges.
    t_c = len(pack.treelets)
    fb = pack.pallas_faces.shape[0] // t_c
    f3 = np.asarray(pack.pallas_faces).reshape(t_c, fb, -1)
    for t_i, (fs, fe) in list(enumerate(pack.treelets))[:3]:
        np.testing.assert_array_equal(raw[fs:fe], f3[t_i, : fe - fs])
