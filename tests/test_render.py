import os
import textwrap

import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import image_to_u8, render_image
from bhraytracer_tpu.scene.xml_loader import load_scene

SIMPLE_SCENE = textwrap.dedent(
    """
    <xml>
      <scene>
        <background r="0.1" g="0.2" b="0.3"/>
        <object type="sphere" name="ball" material="red">
          <scale value="1.5"/>
          <translate x="0" y="0" z="1.5"/>
        </object>
        <object type="plane" name="ground" material="white">
          <scale value="20"/>
        </object>
        <light type="point" name="sun">
          <intensity value="60"/>
          <position x="4" y="-4" z="8"/>
        </light>
      </scene>
      <camera>
        <position x="0" y="-8" z="3"/>
        <target x="0" y="0" z="1"/>
        <up x="0" y="0" z="1"/>
        <fov value="40"/>
        <width value="48"/>
        <height value="36"/>
      </camera>
    </xml>
    """
)


@pytest.fixture
def simple_scene(tmp_path):
    p = tmp_path / "scene.xml"
    p.write_text(
        SIMPLE_SCENE.replace(
            "</scene>",
            """
        <material type="blinn" name="red">
          <diffuse r="0.8" g="0.2" b="0.2"/>
          <specular value="0.5"/>
          <glossiness value="20"/>
        </material>
        <material type="blinn" name="white">
          <diffuse value="0.9"/>
          <specular value="0"/>
        </material>
      </scene>""",
        )
    )
    return str(p)


def test_render_smoke(simple_scene):
    pack, cam = load_scene(simple_scene)
    cfg = RenderConfig(spp=2, gi_bounces=1, extra_refr_levels=0, chunk_rays=2048,
                       texture_sample_count=1)
    img = render_image(pack, cam, cfg, seed=0)
    assert img.shape == (36, 48, 3)
    assert np.isfinite(img).all()
    assert img.max() > 0.05  # something got lit
    u8 = image_to_u8(img)
    assert u8.dtype == np.uint8


def test_render_chunk_under_128_lanes(simple_scene):
    """refr_cap must clamp to the lane count: chunks smaller than the 128-slot
    minimum (e.g. dryrun_multichip's 16 lanes/device) once crashed with a
    broadcast-shape error in the compacted refraction selection."""
    import jax
    import jax.numpy as jnp

    from bhraytracer_tpu.models.pathtracer import _render_chunk
    from bhraytracer_tpu.ops.camera import from_scene_camera

    pack, cam = load_scene(simple_scene)
    cfg = RenderConfig(spp=1, gi_bounces=1, extra_refr_levels=0, tir_bounces=2,
                       chunk_rays=16, texture_sample_count=1)
    n = 16
    idx = np.linspace(0, cam.width * cam.height - 1, n).astype(np.int64)
    px = jnp.asarray(idx % cam.width, np.int32)
    py = jnp.asarray(idx // cam.width, np.int32)
    rad, _, _ = _render_chunk(pack, cfg, from_scene_camera(cam), cam.width,
                           cam.height, px, py, jax.random.PRNGKey(0))
    assert rad.shape == (n, 3)
    assert np.isfinite(np.asarray(rad)).all()


def test_background_on_miss(simple_scene):
    pack, cam = load_scene(simple_scene)
    cfg = RenderConfig(spp=1, gi_bounces=0, extra_refr_levels=0, chunk_rays=2048,
                       use_gamma=False, texture_sample_count=1)
    img = render_image(pack, cam, cfg, seed=0)
    # Top corners see only background.
    np.testing.assert_allclose(img[0, 0], [0.1, 0.2, 0.3], atol=1e-5)
    np.testing.assert_allclose(img[0, -1], [0.1, 0.2, 0.3], atol=1e-5)


def test_shadow_occlusion(simple_scene):
    """The sphere occludes the light for ground points behind it
    (GenLight::Shadow semantics, GenLight.cpp:10-13)."""
    import jax.numpy as jnp

    from bhraytracer_tpu.ops.trace import trace_shadow

    pack, cam = load_scene(simple_scene)
    light = np.array([4.0, -4.0, 8.0])
    # Shadow point: light->sphere-center line extended to the ground plane.
    p_shadow = np.array([-0.923, 0.923, 0.0])
    p_lit = np.array([3.0, -3.0, 0.0])
    o = jnp.asarray(np.stack([p_shadow, p_lit]), jnp.float32)
    d = jnp.asarray(np.stack([light - p_shadow, light - p_lit]), jnp.float32)
    occ = np.asarray(trace_shadow(pack, o, d, 1.0, 1e-5))
    assert bool(occ[0]) and not bool(occ[1])


def test_shadow_darkens_ground(simple_scene):
    """Image-level: the ground region contains a clearly darker shadow."""
    pack, cam = load_scene(simple_scene)
    cfg = RenderConfig(spp=4, gi_bounces=0, extra_refr_levels=0, chunk_rays=4096,
                       use_gamma=False, texture_sample_count=1)
    img = render_image(pack, cam, cfg, seed=1)
    h = img.shape[0]
    ground = img[int(h * 0.62):, :, :].mean(axis=2)  # below the sphere
    assert ground.min() < 0.5 * np.median(ground), (ground.min(), np.median(ground))


def test_render_proj2_lowres(reference_dir):
    """End-to-end on a real reference scene (3 nested spheres, 3 lights)."""
    path = os.path.join(reference_dir, "Resource", "Data", "proj2.xml")
    pack, cam = load_scene(path, resource_root=reference_dir)
    cam.width, cam.height = 64, 48
    cfg = RenderConfig(spp=2, gi_bounces=1, extra_refr_levels=0, chunk_rays=4096,
                       texture_sample_count=1)
    img = render_image(pack, cam, cfg, seed=0)
    assert np.isfinite(img).all()
    assert img.std() > 0.01


def test_dof_blurs_offfocus_sharpens_focus(simple_scene):
    """cfg.use_dof: thin-lens eye jitter (viewport.cpp:238-243). The sphere
    sits ~8.2 units away; with focaldist at the sphere and a wide aperture,
    the sphere's silhouette stays sharp while the far ground blurs —
    measured as mean |horizontal gradient| over the lower (ground) rows."""
    pack, cam = load_scene(simple_scene)
    cam.focaldist = 8.2
    cam.dof = 0.4
    cfg0 = RenderConfig(spp=8, gi_bounces=0, extra_refr_levels=0,
                        chunk_rays=2048, texture_sample_count=1)
    cfg1 = RenderConfig(spp=8, gi_bounces=0, extra_refr_levels=0,
                        chunk_rays=2048, texture_sample_count=1, use_dof=True)
    pin = render_image(pack, cam, cfg0, seed=0)
    dof = render_image(pack, cam, cfg1, seed=0)
    assert np.isfinite(dof).all()

    def edge_energy(img, rows):
        g = np.abs(np.diff(img[rows], axis=1)).mean()
        return float(g)

    # Sphere silhouette rows (middle) keep most of their edge energy;
    # the shadow/ground contact region keeps less under defocus.
    mid = slice(10, 22)
    sharp_ratio = edge_energy(dof, mid) / max(edge_energy(pin, mid), 1e-9)
    assert sharp_ratio > 0.55, sharp_ratio
    # And the lens jitter must actually change the image.
    assert np.abs(dof - pin).max() > 0.01
