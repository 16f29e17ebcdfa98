"""Fused shade-setup kernel (ops/pallas_shade.py) vs the XLA shading path.

_shade_level routes resolve + Fresnel + light sampling + BRDF + GI through
one Pallas kernel when pallas mode is on and the scene qualifies (no
textures / photon map). Same RNG stream, same semantics — the whole
LevelRecord and the children must match the XLA path closely (identical
math, different fusion; transcendental reassociation only).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models import pathtracer as PT
from bhraytracer_tpu.ops import trace as T
from bhraytracer_tpu.scene import desc as D
from bhraytracer_tpu.scene.compile import compile_scene
from tests.test_treelet_stream import _grid_sphere_mesh


@pytest.fixture(scope="module")
def pack():
    """Spheres + planes + a mesh + glass + all three light kinds."""
    sd = D.SceneDesc()
    red = D.MaterialDesc(name="red")
    red.diffuse = D.TexturedColorDesc(color=np.array([0.8, 0.2, 0.2]))
    red.specular = D.TexturedColorDesc(color=np.array([0.5, 0.5, 0.5]))
    red.glossiness = 20.0
    glass = D.MaterialDesc(name="glass")
    glass.diffuse = D.TexturedColorDesc(color=np.zeros(3))
    glass.specular = D.TexturedColorDesc(color=np.array([0.1, 0.1, 0.1]))
    glass.glossiness = 100.0
    glass.refraction = D.TexturedColorDesc(color=np.array([0.9, 0.9, 0.9]))
    glass.ior = 1.52
    glass.absorption = np.array([0.1, 0.05, 0.0])
    white = D.MaterialDesc(name="white")
    white.diffuse = D.TexturedColorDesc(color=np.array([0.9, 0.9, 0.9]))
    white.specular = D.TexturedColorDesc(color=np.zeros(3))
    sd.materials += [red, glass, white]

    t1 = D.Transform()
    t1.scale(1.5, 1.2, 1.5)
    t1.translate(np.array([-2.5, 0.0, 1.5]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="s1", transform=t1,
                               material=0))
    t2 = D.Transform()
    t2.translate(np.array([2.5, 0.0, 1.0]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="s2", transform=t2,
                               material=1))
    t3 = D.Transform()
    t3.scale(20.0, 20.0, 20.0)
    sd.nodes.append(D.NodeDesc(kind="plane", name="ground", transform=t3,
                               material=2))
    sd.meshes.append(_grid_sphere_mesh(nu=12, nv=6, r=1.0))
    tm = D.Transform()
    tm.translate(np.array([0.0, 2.0, 1.0]))
    sd.nodes.append(D.NodeDesc(kind="mesh", name="m", transform=tm,
                               material=0, mesh=0))

    sd.lights.append(D.LightDesc(kind="ambient",
                                 intensity=np.full(3, 0.05)))
    sd.lights.append(D.LightDesc(
        kind="direct", intensity=np.full(3, 0.3),
        direction=np.array([1.0, 0.5, -1.0]) / np.linalg.norm([1, 0.5, -1])))
    sd.lights.append(D.LightDesc(
        kind="point", intensity=np.full(3, 50.0),
        position=np.array([4.0, -4.0, 8.0]), size=0.5))
    sd.background = D.TexturedColorDesc(color=np.array([0.1, 0.2, 0.3]))
    sd.environment = D.TexturedColorDesc(color=np.array([0.2, 0.2, 0.2]))
    return compile_scene(sd)


@pytest.fixture
def tasks(rng):
    n = 640
    o = rng.normal(size=(n, 3)) * 2 + [0, -9, 3]
    aim = rng.normal(size=(n, 3)) * np.array([3.0, 2.0, 1.5])
    d = aim - o
    active = rng.uniform(size=n) > 0.1
    return PT.Tasks(o=jnp.asarray(o, jnp.float32),
                    d=jnp.asarray(d, jnp.float32),
                    active=jnp.asarray(active),
                    bounce=jnp.full((n,), 16, jnp.int32))


def _run_level(pack, tasks, mode):
    cfg = RenderConfig(spp=1, gi_bounces=2, extra_refr_levels=1,
                       tir_bounces=8, texture_sample_count=1,
                       chunk_rays=tasks.o.shape[0])
    key = jax.random.PRNGKey(7)
    T.set_pallas_mode(mode)
    try:
        rec, children, surf = PT._shade_level(
            pack, cfg, tasks, 0, key, jnp.zeros(3), jnp.zeros(3))
        rec = jax.tree.map(np.asarray, rec)
        children = jax.tree.map(np.asarray, children)
        surf = jax.tree.map(np.asarray, surf)
    finally:
        T.set_pallas_mode("auto")
    return rec, children, surf


def test_fused_level_matches_xla(pack, tasks):
    rec_x, ch_x, surf_x = _run_level(pack, tasks, "off")
    rec_f, ch_f, surf_f = _run_level(pack, tasks, "on")

    hit = rec_x.hit & rec_x.active
    assert hit.sum() > 200  # the rays genuinely exercise the scene

    # hit parity on ACTIVE lanes only: inactive lanes ride packet tiles on
    # canonical miss rays whose 1e8-scale f32 leaf tests may differ between
    # the packet kernel and XLA's per-lane descent — semantically masked
    # everywhere (every consumer gates on active & hit).
    act = np.asarray(rec_x.active)
    np.testing.assert_array_equal(rec_f.hit[act], rec_x.hit[act])
    np.testing.assert_array_equal(surf_f.mtl[hit], surf_x.mtl[hit])
    np.testing.assert_allclose(surf_f.p[hit], surf_x.p[hit],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(surf_f.n[hit], surf_x.n[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(surf_f.z[hit], surf_x.z[hit],
                               rtol=1e-4, atol=1e-5)
    # Radiance pieces: pow()/sampler transcendentals reassociate, so allow
    # a few ulps more; mismatched lobe/light choices would blow far past it.
    np.testing.assert_allclose(rec_f.direct[hit], rec_x.direct[hit],
                               rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(rec_f.gi_albedo[hit], rec_x.gi_albedo[hit],
                               rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(rec_f.gi_env[hit], rec_x.gi_env[hit],
                               rtol=1e-3, atol=1e-5)
    # Refraction bookkeeping: identical discrete outcomes.
    np.testing.assert_array_equal(rec_f.refr_sel, rec_x.refr_sel)
    np.testing.assert_array_equal(rec_f.refr_valid, rec_x.refr_valid)
    np.testing.assert_array_equal(rec_f.refr_has_child, rec_x.refr_has_child)
    np.testing.assert_allclose(rec_f.refr_mult, rec_x.refr_mult,
                               rtol=1e-3, atol=1e-5)
    assert int(rec_f.segs) == int(rec_x.segs)
    # Children rays (GI + refraction) drive the next level: same lanes, same
    # geometry.
    np.testing.assert_array_equal(ch_f.active, ch_x.active)
    live = np.asarray(ch_x.active)
    np.testing.assert_allclose(ch_f.o[live], ch_x.o[live],
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(ch_f.d[live], ch_x.d[live],
                               rtol=1e-3, atol=1e-4)


def test_fused_radiance_matches_xla(pack, tasks):
    cfg = RenderConfig(spp=1, gi_bounces=2, extra_refr_levels=1,
                       tir_bounces=8, texture_sample_count=1,
                       chunk_rays=tasks.o.shape[0])
    key = jax.random.PRNGKey(3)
    n = tasks.o.shape[0]
    bg_uv = jnp.zeros((n, 2))

    def run(mode):
        T.set_pallas_mode(mode)
        try:
            rad, z, st = PT.trace_radiance(pack, cfg, tasks.o, tasks.d,
                                           bg_uv, key, jnp.zeros(3),
                                           jnp.zeros(3))
            return np.asarray(rad), np.asarray(z)
        finally:
            T.set_pallas_mode("auto")

    rad_x, z_x = run("off")
    rad_f, z_f = run("on")
    np.testing.assert_allclose(rad_f, rad_x, rtol=5e-3, atol=5e-4)
    np.testing.assert_allclose(z_f, z_x, rtol=1e-4, atol=1e-4)
