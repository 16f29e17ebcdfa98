"""Lane-for-lane parity of the wavefront integrator against an independent
numpy oracle (tests/_oracle.py).

This is the "per-bounce allclose against a trusted reference implementation"
net from SURVEY.md §4, made well-defined by sharing RNG streams (SURVEY §7
hard part 1): the oracle re-implements intersection + Blinn shading +
refraction + combine semantics in plain numpy with no code shared with the
renderer, consuming the same threefry uniform tables.

Scenes are analytic-only; glossy-refraction scenes restrict chains to <= 3
trips (glass spheres/panes enter+exit) because the wavefront's TIR-tail
recompaction reshapes glossy RNG tables past trip 3 (documented in
_oracle.py).
"""

import textwrap

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import trace_radiance
from bhraytracer_tpu.ops.camera import camera_basis, from_scene_camera, gen_rays
from bhraytracer_tpu.scene.xml_loader import load_scene

from tests._oracle import Oracle, oracle_camera_rays

SCENE = textwrap.dedent(
    """
    <xml>
      <scene>
        <background r="0.1" g="0.2" b="0.3"/>
        <environment r="0.15" g="0.12" b="0.2"/>
        <object type="sphere" name="ball" material="red">
          <scale value="1.5"/>
          <translate x="-1.6" y="0" z="1.5"/>
        </object>
        <object type="sphere" name="glass" material="glass">
          <scale value="1.2"/>
          <translate x="1.6" y="-1" z="1.2"/>
        </object>
        <object type="plane" name="ground" material="white">
          <scale value="20"/>
        </object>
        <material type="blinn" name="red">
          <diffuse r="0.8" g="0.2" b="0.2"/>
          <specular value="0.5"/>
          <glossiness value="20"/>
        </material>
        <material type="blinn" name="glass">
          <diffuse value="0"/>
          <specular value="0.05"/>
          <glossiness value="30"/>
          <refraction index="1.52" value="0.95"/>
          <absorption r="0.05" g="0.01" b="0.01"/>
        </material>
        <material type="blinn" name="white">
          <diffuse value="0.9"/>
          <specular value="0"/>
        </material>
        <light type="ambient" name="amb">
          <intensity value="0.05"/>
        </light>
        <light type="direct" name="sun">
          <intensity value="0.4"/>
          <direction x="1" y="1" z="-1.5"/>
        </light>
        <light type="point" name="bulb">
          <intensity value="60"/>
          <position x="4" y="-4" z="8"/>
          <size value="0.6"/>
        </light>
      </scene>
      <camera>
        <position x="0" y="-8" z="3"/>
        <target x="0" y="0" z="1"/>
        <up x="0" y="0" z="1"/>
        <fov value="45"/>
        <width value="16"/>
        <height value="12"/>
      </camera>
    </xml>
    """
)


@pytest.fixture(scope="module")
def scene(tmp_path_factory):
    p = tmp_path_factory.mktemp("oracle") / "scene.xml"
    p.write_text(SCENE)
    return load_scene(str(p))


def _render_lanes(pack, cam, cfg, seed=0):
    """One chunk through the monolithic path, mirroring _render_chunk's key
    discipline, plus the matching oracle render."""
    width, height = cam.width, cam.height
    n = width * height
    idx = np.arange(n)
    px = jnp.asarray(idx % width, jnp.int32)
    py = jnp.asarray(idx // width, jnp.int32)
    key = jax.random.PRNGKey(seed)

    cam_p = from_scene_camera(cam)
    u = jax.random.uniform(jax.random.fold_in(key, 0), (n, 2))
    o, d = gen_rays(cam_p, width, height, px, py, u)
    _, dd_x, dd_y = camera_basis(cam_p, width, height)
    bg_uv = jnp.stack([px / width, py / height, jnp.zeros(n)], -1)
    rad, z0, _drops = trace_radiance(pack, cfg, o, d, bg_uv,
                                     jax.random.fold_in(key, 1), dd_x, dd_y)

    orc = Oracle(pack, cfg, jax.random.fold_in(key, 1))
    o_np, d_np = oracle_camera_rays(cam, width, height, idx % width,
                                    idx // width, key)
    np.testing.assert_allclose(o_np, np.asarray(o), rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(d_np, np.asarray(d), rtol=1e-4, atol=1e-5)
    rad_o = orc.radiance(o_np, d_np)
    return np.asarray(rad), rad_o


def test_wavefront_matches_oracle(scene):
    pack, cam = scene
    cfg = RenderConfig(spp=1, gi_bounces=2, extra_refr_levels=1, tir_bounces=6,
                       chunk_rays=cam.width * cam.height, texture_sample_count=1)
    rad, rad_o = _render_lanes(pack, cam, cfg)
    # float32 wavefront vs float64 oracle across ~10 shading ops per level.
    mism = np.abs(rad - rad_o).max()
    assert mism < 5e-3, (
        f"max lane mismatch {mism}; worst lane "
        f"{np.unravel_index(np.argmax(np.abs(rad - rad_o).sum(1)), (rad.shape[0],))}"
    )
    # and the scene is non-trivial: hits, shadows, refraction all present
    assert rad_o.max() > 0.2
    assert (rad_o.sum(1) > 0).mean() > 0.9


def test_oracle_seed_variation(scene):
    """A second seed exercises different light/lobe selections."""
    pack, cam = scene
    cfg = RenderConfig(spp=1, gi_bounces=2, extra_refr_levels=1, tir_bounces=6,
                       chunk_rays=cam.width * cam.height, texture_sample_count=1)
    rad, rad_o = _render_lanes(pack, cam, cfg, seed=7)
    assert np.abs(rad - rad_o).max() < 5e-3
