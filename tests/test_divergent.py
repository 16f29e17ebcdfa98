"""Divergent (per-row SMEM-stack) BVH kernel vs the XLA reference traversal.

Runs interpreted on CPU (conftest); the kernels compile on TPU only.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bhraytracer_tpu.ops.linalg import BIG
from bhraytracer_tpu.ops.pallas_bvh_divergent import (
    bvh_anyhit_divergent,
    bvh_closest_divergent,
    divergent_traversable,
)
from bhraytracer_tpu.ops.trace import MESH_SHADOW_BIAS, bvh_anyhit, bvh_closest


@pytest.fixture(scope="module")
def mesh_pack(gen_assets_root):
    import os

    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene
    from bhraytracer_tpu.scene.obj_loader import load_obj

    teapot = os.path.join(gen_assets_root, "Resource", "Data", "teapot.obj")
    sd = D.SceneDesc()
    sd.materials.append(D.MaterialDesc(name="m"))
    sd.meshes.append(load_obj(teapot))
    sd.nodes.append(D.NodeDesc(kind="mesh", name="t", transform=D.Transform(),
                               material=0, mesh=0))
    return compile_scene(sd)


def _rays(pack, n, seed):
    """Fully-incoherent rays: scattered origins, random targets in the box
    (the GI/TIR population this kernel exists for)."""
    rng = np.random.default_rng(seed)
    bmin = np.asarray(pack.bvh_bmin[0])
    bmax = np.asarray(pack.bvh_bmax[0])
    o = jnp.asarray(rng.uniform(bmin - 3, bmax + 3, (n, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(bmin, bmax, (n, 3)), jnp.float32)
    return o, target - o


def test_gate(mesh_pack):
    assert divergent_traversable(mesh_pack)


@pytest.mark.parametrize("side", ["front", "both"])
def test_divergent_closest_matches_xla(mesh_pack, side):
    o, d = _rays(mesh_pack, 1024, 1)
    ti = jnp.full((o.shape[0],), BIG)
    t0, f0, fr0 = bvh_closest(mesh_pack, 0, o, d, side, ti)
    t1, f1, fr1 = bvh_closest_divergent(mesh_pack, 0, o, d, side, ti)
    hit = np.asarray(t0) < BIG
    assert hit.sum() > 100  # the comparison must exercise real hits
    # rtol 1e-4: separately-compiled programs differ in FMA contraction.
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t0)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(f1)[hit], np.asarray(f0)[hit])
    np.testing.assert_array_equal(np.asarray(fr1)[hit], np.asarray(fr0)[hit])
    assert (np.asarray(t1)[~hit] >= BIG).all()


def test_divergent_closest_unsorted(mesh_pack):
    """reorder=False path (raw tile grouping) must agree too."""
    o, d = _rays(mesh_pack, 640, 4)
    ti = jnp.full((o.shape[0],), BIG)
    t0, f0, _ = bvh_closest(mesh_pack, 0, o, d, "front", ti)
    t1, f1, _ = bvh_closest_divergent(mesh_pack, 0, o, d, "front", ti,
                                      reorder=False)
    hit = np.asarray(t0) < BIG
    assert hit.sum() > 50
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t0)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(f1)[hit], np.asarray(f0)[hit])


def test_divergent_anyhit_matches_xla(mesh_pack):
    o, d = _rays(mesh_pack, 1024, 2)
    tm = jnp.full((o.shape[0],), 1.0)
    a0 = bvh_anyhit(mesh_pack, 0, o, d, MESH_SHADOW_BIAS, tm)
    a1 = bvh_anyhit_divergent(mesh_pack, 0, o, d, MESH_SHADOW_BIAS, tm)
    assert int(np.asarray(a0).sum()) > 50
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))


SCENE = """
<xml>
  <scene>
    <background r="0.1" g="0.1" b="0.2"/>
    <object type="obj" name="Resource/Data/teapot.obj" material="red">
      <scale value="0.3"/>
    </object>
    <object type="sphere" name="ball" material="red">
      <translate x="2" y="1" z="1"/>
    </object>
    <object type="plane" name="ground" material="white">
      <scale value="30"/>
    </object>
    <material type="blinn" name="red">
      <diffuse r="0.8" g="0.2" b="0.2"/>
      <specular value="0.5"/>
      <glossiness value="20"/>
    </material>
    <material type="blinn" name="white">
      <diffuse value="0.9"/>
    </material>
    <light type="point" name="sun">
      <intensity value="80"/>
      <position x="6" y="-6" z="8"/>
    </light>
  </scene>
  <camera>
    <position x="0" y="-10" z="5"/>
    <target x="0" y="0" z="1.5"/>
    <up x="0" y="0" z="1"/>
    <fov value="40"/>
    <width value="48"/>
    <height value="36"/>
  </camera>
</xml>
"""


def test_divergent_render_routing(gen_assets_root, tmp_path):
    """Full render with divergent routing on matches the packet-kernel
    render (traversal swap only; shading identical)."""
    import os

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_image
    from bhraytracer_tpu.ops import trace as T
    from bhraytracer_tpu.scene.xml_loader import load_scene

    scene = tmp_path / "scene.xml"
    scene.write_text(SCENE)
    pack, cam = load_scene(str(scene), resource_root=gen_assets_root)
    cfg = RenderConfig(spp=1, gi_bounces=1, extra_refr_levels=0,
                       chunk_rays=2048, use_gamma=False,
                       texture_sample_count=1)
    img_off = render_image(pack, cam, cfg, seed=0)
    T.set_divergent_mode("on")
    try:
        img_on = render_image(pack, cam, cfg, seed=0)
    finally:
        T.set_divergent_mode("off")
    np.testing.assert_allclose(np.asarray(img_on), np.asarray(img_off),
                               rtol=1e-3, atol=2e-3)


def test_divergent_t_init_pruning(mesh_pack):
    """Lanes seeded with a nearer analytic hit must keep it."""
    o, d = _rays(mesh_pack, 512, 3)
    ti_open = jnp.full((o.shape[0],), BIG)
    t_open, _, _ = bvh_closest_divergent(mesh_pack, 0, o, d, "front", ti_open)
    seed = jnp.where(jnp.arange(o.shape[0]) % 2 == 0, 1e-3, BIG)
    t_seeded, _, _ = bvh_closest_divergent(mesh_pack, 0, o, d, "front",
                                           jnp.asarray(seed, jnp.float32))
    even = np.arange(o.shape[0]) % 2 == 0
    assert (np.asarray(t_seeded)[even] <= 1e-3 + 1e-9).all()
    np.testing.assert_allclose(np.asarray(t_seeded)[~even],
                               np.asarray(t_open)[~even], rtol=1e-5)
