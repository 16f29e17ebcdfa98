"""Shading-semantics parity tests: hand-computed values from the reference
formulas (MtlBlinn.cpp / lights.h / scene.h), evaluated through the public
integrator pieces on controlled setups."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.models.pathtracer import (
    _clamp_white,
    _fetch_mtl,
    _select_light,
)
from bhraytracer_tpu.ops.texturing import environment_uvw, tile_clamp, texture_eval


def _pack_with_lights(grays):
    """Minimal pack stub for light selection (sorted ascending upstream)."""
    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene

    sd = D.SceneDesc()
    for i, g in enumerate(grays):
        sd.lights.append(D.LightDesc(kind="point", name=f"l{i}",
                                     intensity=np.full(3, g)))
    return compile_scene(sd)


def test_light_selection_walk():
    """MtlBlinn.cpp:309-315: pick the FIRST light (ascending order) whose
    individual share p_i = I_i/total satisfies u <= p_i, else the last.
    NOT a CDF walk — a light with share 0.5 absorbs every u <= 0.5."""
    pack = _pack_with_lights([1.0, 2.0, 7.0])  # shares 0.1, 0.2, 0.7
    u = jnp.asarray([0.05, 0.1, 0.15, 0.2, 0.25, 0.69, 0.71, 0.99])
    idx = np.asarray(_select_light(pack, u))
    #   u=0.05 -> light0 (0.05<=0.1); u=0.1 -> light0; u=0.15 -> light1;
    #   u=0.2 -> light1; u=0.25 -> light2 (0.25<=0.7); u=0.69 -> light2;
    #   u=0.71 -> none matches -> last; u=0.99 -> last.
    np.testing.assert_array_equal(idx, [0, 0, 1, 1, 2, 2, 2, 2])


def test_fresnel_specular_fold():
    """Schlick fold (MtlBlinn.cpp:107-114): newSpec = clamp(spec + F*refr),
    F = R0 + (1-R0)(1-cos)^5, R0 = ((1-ior)/(1+ior))^2."""
    ior = 1.5
    cos_phi = 0.3
    spec = np.array([0.4, 0.4, 0.9])
    refr = np.array([0.9, 0.9, 0.9])
    r0 = ((1 - ior) / (1 + ior)) ** 2
    f = r0 + (1 - r0) * (1 - cos_phi) ** 5
    expect = np.minimum(spec + f * refr, 1.0)
    got = np.asarray(_clamp_white(jnp.asarray(spec + f * refr)))
    np.testing.assert_allclose(got, expect, rtol=1e-6)
    # and the refraction branch weight is (1-F)*refr
    assert 0 < f < 1


def test_tile_clamp_matches_reference():
    """Texture::TileClamp (scene.h:344-354): frac with negative wrap."""
    u = jnp.asarray([[0.25, 1.25, -0.25], [2.0, -2.75, 0.0]])
    got = np.asarray(tile_clamp(u))
    np.testing.assert_allclose(got, [[0.25, 0.25, 0.75], [0.0, 0.25, 0.0]], atol=1e-6)


def test_checker_quadrants():
    """TextureChecker::Sample (Texture.cpp:127-136)."""
    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene

    sd = D.SceneDesc()
    sd.textures.append(D.TextureDesc(kind="checker", name="checkerboard",
                                     color1=np.array([1.0, 0, 0]),
                                     color2=np.array([0, 1.0, 0])))
    pack = compile_scene(sd)
    uv = jnp.asarray([
        [0.25, 0.25, 0], [0.75, 0.25, 0], [0.25, 0.75, 0], [0.75, 0.75, 0],
        [0.5, 0.5, 0],  # boundary: both <= 0.5 -> color1
    ])
    tid = jnp.zeros(5, jnp.int32)
    got = np.asarray(texture_eval(pack, tid, uv))
    np.testing.assert_allclose(
        got,
        [[1, 0, 0], [0, 1, 0], [0, 1, 0], [1, 0, 0], [1, 0, 0]],
        atol=1e-6,
    )


def test_environment_mapping_formula():
    """SampleEnvironment (scene.h:414-420): uvw = (.5,.5,0) + z*(x*(.5,.5,0)
    + y*(-.5,.5,0)), z = asin(-dz)/pi + .5, x/y = dx,dy/(|dx|+|dy|)."""
    d = np.array([[0.6, -0.8, 0.0], [0.0, 1.0, 0.0]])
    uvw, valid = environment_uvw(jnp.asarray(d))
    uvw = np.asarray(uvw)
    for i in range(2):
        dx, dy, dz = d[i]
        z = np.arcsin(-dz) / np.pi + 0.5
        x = dx / (abs(dx) + abs(dy))
        y = dy / (abs(dx) + abs(dy))
        expect = np.array([0.5, 0.5, 0.0]) + z * (
            x * np.array([0.5, 0.5, 0.0]) + y * np.array([-0.5, 0.5, 0.0])
        )
        np.testing.assert_allclose(uvw[i], expect, atol=1e-5)
    assert bool(np.asarray(valid).all())
    # Degenerate dir (0,0,1): reference would produce NaN -> invalid here.
    _, v2 = environment_uvw(jnp.asarray([[0.0, 0.0, 1.0]]))
    assert not bool(np.asarray(v2)[0])


def test_point_light_inverse_square():
    """PointLight::Illuminate (PointLight.cpp:7-18): intensity / r^2 with r
    to the light CENTER, visibility from one shadow ray with t_max = 1."""
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import _illuminate
    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene

    sd = D.SceneDesc()
    sd.lights.append(D.LightDesc(kind="point", intensity=np.full(3, 12.0),
                                 position=np.array([0.0, 0.0, 4.0])))
    pack = compile_scene(sd)
    cfg = RenderConfig()
    p = jnp.asarray([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])  # r = 3, 2
    u = jnp.full((2, 2), 0.5)
    lidx = jnp.zeros(2, jnp.int32)
    irr, _n_shadow = _illuminate(pack, cfg, lidx, p, u, jnp.ones(2, bool))
    irr = np.asarray(irr)
    np.testing.assert_allclose(irr[0], 12.0 / 9.0, rtol=1e-5)
    np.testing.assert_allclose(irr[1], 12.0 / 4.0, rtol=1e-5)


def test_beer_lambert_uses_reference_e():
    """Absorption factor e^(-a z) with EulerN = 2.7182818 (MtlBlinn.cpp:11,
    529-533) — we use exp(); difference from the truncated constant is below
    float precision at scene scales."""
    a, z = 0.7, 2.3
    ref = 2.7182818 ** (-a * z)
    ours = float(jnp.exp(jnp.asarray(-a * z)))
    assert abs(ref - ours) < 2e-7
