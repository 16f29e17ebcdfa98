"""Gradient checks: reverse-mode vs central finite differences.

The integrator freezes discrete choices (hit ids, lobe/light selection) and
differentiates the continuous remainder — the standard hit-ID-frozen
estimator. With a fixed RNG key the render is a deterministic function of
the parameters, so FD is well-defined as long as the perturbation doesn't
flip a discrete choice (tolerances and eps are chosen accordingly).
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import _render_chunk
from bhraytracer_tpu.ops.camera import CameraParams


@pytest.fixture(scope="module")
def setup():
    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene

    sd = D.SceneDesc()
    red = D.MaterialDesc(name="red")
    red.diffuse = D.TexturedColorDesc(color=np.array([0.7, 0.3, 0.2]))
    red.specular = D.TexturedColorDesc(color=np.array([0.4, 0.4, 0.4]))
    red.glossiness = 20.0
    white = D.MaterialDesc(name="white")
    white.diffuse = D.TexturedColorDesc(color=np.array([0.8, 0.8, 0.8]))
    white.specular = D.TexturedColorDesc(color=np.zeros(3))
    sd.materials += [red, white]

    t1 = D.Transform()
    t1.scale(1.5, 1.5, 1.5)
    t1.translate(np.array([0.0, 0.0, 1.5]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="s", transform=t1, material=0))
    t2 = D.Transform()
    t2.scale(20.0, 20.0, 20.0)
    sd.nodes.append(D.NodeDesc(kind="plane", name="g", transform=t2, material=1))
    sd.lights.append(
        D.LightDesc(kind="point", intensity=np.full(3, 40.0),
                    position=np.array([4.0, -4.0, 8.0]))
    )
    sd.background = D.TexturedColorDesc(color=np.array([0.1, 0.1, 0.1]))
    sd.environment = D.TexturedColorDesc(color=np.array([0.3, 0.3, 0.3]))

    cam = D.Camera()
    cam.pos = np.array([0.0, -8.0, 3.0])
    d = np.array([0.0, 8.0, -2.0])
    cam.dir = d / np.linalg.norm(d)
    x = np.cross(cam.dir, np.array([0.0, 0.0, 1.0]))
    up = np.cross(x, cam.dir)
    cam.up = up / np.linalg.norm(up)
    cam.width, cam.height = 24, 18

    pack = compile_scene(sd)
    cfg = RenderConfig(
        spp=1, gi_bounces=1, extra_refr_levels=0, tir_bounces=2,
        chunk_rays=432, texture_sample_count=1, differentiable=True,
    )
    cam_p = CameraParams(
        pos=jnp.asarray(cam.pos, jnp.float32),
        dir=jnp.asarray(cam.dir, jnp.float32),
        up=jnp.asarray(cam.up, jnp.float32),
        fov=jnp.float32(40.0),
        focaldist=jnp.float32(1.0),
    )
    n = cam.width * cam.height
    idx = np.arange(n)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)
    key = jax.random.PRNGKey(7)

    return pack, cfg, cam_p, cam, px, py, key


def _loss_fn(setup_t, param_name):
    pack, cfg, cam_p, cam, px, py, key = setup_t

    def loss(val):
        if param_name.startswith("cam_"):
            cp = cam_p._replace(**{param_name[4:]: val})
            pk = pack
        else:
            pk = dataclasses.replace(pack, **{param_name: val})
            cp = cam_p
        rad, _, _ = _render_chunk(pk, cfg, cp, cam.width, cam.height, px, py, key)
        return jnp.mean(rad)

    return loss


@pytest.mark.parametrize(
    "param,eps,tol",
    [
        ("mtl_diffuse", 1e-3, 0.08),
        ("light_intensity", 1e-2, 0.08),
        ("cam_pos", 1e-3, 0.15),
    ],
)
def test_grad_matches_fd(setup, param, eps, tol):
    pack, cfg, cam_p, cam, px, py, key = setup
    base = getattr(cam_p, param[4:]) if param.startswith("cam_") else getattr(pack, param)
    loss = _loss_fn(setup, param)
    g = jax.grad(loss)(base)
    g = np.asarray(g)

    flat = np.asarray(base).ravel()
    # Probe the few largest-|grad| coordinates.
    order = np.argsort(-np.abs(g.ravel()))[:3]
    for i in order:
        if abs(g.ravel()[i]) < 1e-6:
            continue
        dv = np.zeros_like(flat)
        dv[i] = eps
        lp = float(loss(jnp.asarray((flat + dv).reshape(np.asarray(base).shape))))
        lm = float(loss(jnp.asarray((flat - dv).reshape(np.asarray(base).shape))))
        fd = (lp - lm) / (2 * eps)
        an = g.ravel()[i]
        assert abs(fd - an) <= tol * max(abs(fd), abs(an), 1e-4), (
            param, i, fd, an,
        )


def test_grad_nonzero_and_finite(setup):
    pack, cfg, cam_p, cam, px, py, key = setup
    for param in ["mtl_diffuse", "mtl_specular", "light_intensity", "cam_pos"]:
        base = getattr(cam_p, param[4:]) if param.startswith("cam_") else getattr(pack, param)
        g = np.asarray(jax.grad(_loss_fn(setup, param))(base))
        assert np.isfinite(g).all(), param
        assert np.abs(g).max() > 1e-8, param


