"""Pallas fused trace kernels vs the jnp reference path (interpreter mode on
CPU; the same kernels compile on TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.ops import trace as T


@pytest.fixture(scope="module")
def scene():
    from __graft_entry__ import _tiny_scene

    pack, cam = _tiny_scene()
    return pack


@pytest.fixture
def rays(rng):
    n = 700  # deliberately not a multiple of the 1024-ray block
    o = jnp.asarray(rng.normal(size=(n, 3)) * 4 + [0, -6, 3], jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    return o, d


@pytest.mark.parametrize("side", ["front", "back", "both"])
def test_closest_matches_jnp(scene, rays, side):
    o, d = rays
    T.set_pallas_mode("off")
    ref = T.trace_closest(scene, o, d, side)
    T.set_pallas_mode("on")
    try:
        out = T.trace_closest(scene, o, d, side)
    finally:
        T.set_pallas_mode("auto")
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), rtol=1e-5, atol=1e-5)
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(out.kind)[hit], np.asarray(ref.kind)[hit])
    np.testing.assert_array_equal(np.asarray(out.inst)[hit], np.asarray(ref.inst)[hit])
    np.testing.assert_array_equal(np.asarray(out.front)[hit], np.asarray(ref.front)[hit])


@pytest.mark.parametrize("bug", [False, True])
def test_shadow_matches_jnp(scene, rays, bug):
    o, d = rays
    t_max = jnp.asarray(np.random.default_rng(0).uniform(0.5, 10.0, o.shape[0]), jnp.float32)
    T.set_pallas_mode("off")
    ref = T.trace_shadow(scene, o, d, t_max, 1e-5, plane_extent_bug=bug)
    T.set_pallas_mode("on")
    try:
        out = T.trace_shadow(scene, o, d, t_max, 1e-5, plane_extent_bug=bug)
    finally:
        T.set_pallas_mode("auto")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


@pytest.fixture(scope="module")
def mesh_scene(tmp_path_factory):
    import os
    import subprocess
    import sys

    from bhraytracer_tpu.scene.xml_loader import load_scene

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tmp_path_factory.mktemp("pallas_assets")
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "gen_assets.py"), str(root)],
        check=True, capture_output=True,
    )
    scene = root / "s.xml"
    scene.write_text("""
<xml>
  <scene>
    <object type="obj" name="Resource/Data/teapot.obj" material="m">
      <scale value="0.3"/>
    </object>
    <material type="blinn" name="m"><diffuse value="0.8"/></material>
    <light type="point" name="l"><intensity value="10"/><position z="8"/></light>
  </scene>
  <camera><position y="-10" z="4"/><target z="1"/><up z="1"/>
    <width value="32"/><height value="24"/></camera>
</xml>""")
    pack, _ = load_scene(str(scene), resource_root=str(root))
    return pack


@pytest.mark.parametrize("side", ["front", "both"])
def test_bvh_packet_matches_jnp(mesh_scene, rng, side):
    o = jnp.asarray(rng.normal(size=(600, 3)) * 4 + [0, -6, 2], jnp.float32)
    d = jnp.asarray(rng.normal(size=(600, 3)), jnp.float32)
    T.set_pallas_mode("off")
    ref = T.trace_closest(mesh_scene, o, d, side)
    T.set_pallas_mode("on")
    try:
        out = T.trace_closest(mesh_scene, o, d, side)
    finally:
        T.set_pallas_mode("auto")
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), rtol=1e-4, atol=1e-5)
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(out.face)[hit], np.asarray(ref.face)[hit])
    np.testing.assert_array_equal(np.asarray(out.front)[hit], np.asarray(ref.front)[hit])


def test_bvh_packet_shadow_matches_jnp(mesh_scene, rng):
    o = jnp.asarray(rng.normal(size=(600, 3)) * 3 + [0, -4, 1], jnp.float32)
    d = jnp.asarray(rng.normal(size=(600, 3)), jnp.float32)
    tm = jnp.asarray(np.random.default_rng(1).uniform(0.5, 20.0, 600), jnp.float32)
    T.set_pallas_mode("off")
    ref = T.trace_shadow(mesh_scene, o, d, tm, 1e-5)
    T.set_pallas_mode("on")
    try:
        out = T.trace_shadow(mesh_scene, o, d, tm, 1e-5)
    finally:
        T.set_pallas_mode("auto")
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_two_instances_share_mesh(tmp_path, rng):
    """Two instances of one mesh with different transforms: closest hits
    must respect each instance's frame (pallas and jnp paths agree)."""
    import os
    import subprocess
    import sys

    from bhraytracer_tpu.scene.xml_loader import load_scene

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = tmp_path / "a"
    subprocess.run(
        [sys.executable, os.path.join(repo, "tools", "gen_assets.py"), str(root)],
        check=True, capture_output=True,
    )
    scene = tmp_path / "two.xml"
    scene.write_text("""
<xml><scene>
  <object type="obj" name="Resource/Data/teapot.obj" material="m">
    <scale value="0.2"/><translate x="-3"/>
  </object>
  <object type="obj" name="Resource/Data/teapot.obj" material="m">
    <scale value="0.3"/><translate x="3"/>
  </object>
  <material type="blinn" name="m"><diffuse value="0.8"/></material>
  <light type="point" name="l"><intensity value="10"/><position z="8"/></light>
</scene>
<camera><position y="-10" z="3"/><target z="1"/><up z="1"/>
  <width value="32"/><height value="24"/></camera></xml>""")
    pack, _ = load_scene(str(scene), resource_root=str(root))
    assert pack.n_msh == 2

    o = jnp.asarray(rng.normal(size=(400, 3)) * 5 + [0, -8, 2], jnp.float32)
    d = jnp.asarray(rng.normal(size=(400, 3)), jnp.float32)
    T.set_pallas_mode("off")
    ref = T.trace_closest(pack, o, d, "front")
    T.set_pallas_mode("on")
    try:
        out = T.trace_closest(pack, o, d, "front")
    finally:
        T.set_pallas_mode("auto")
    np.testing.assert_allclose(np.asarray(out.t), np.asarray(ref.t), rtol=1e-4, atol=1e-5)
    hit = np.asarray(ref.hit)
    np.testing.assert_array_equal(np.asarray(out.inst)[hit], np.asarray(ref.inst)[hit])


def test_vmem_gate():
    from bhraytracer_tpu.ops.pallas_bvh import VMEM_BUDGET, fits_vmem

    class P:
        pass

    p = P()
    p.pallas_nodes = np.zeros((100, 16), np.float32)
    p.pallas_faces = np.zeros((200, 16), np.float32)
    assert fits_vmem(p)
    p.pallas_faces = np.zeros((VMEM_BUDGET // (128 * 4) + 1, 16), np.float32)
    assert not fits_vmem(p)
