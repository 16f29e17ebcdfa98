"""Mesh-geometry and texture-table gradients (split from
test_gradients.py so each module's reverse-mode FD compiles live in
their own process/worker — one worker accumulating ALL gradient-test
compiles crossed the XLA:CPU EH-frame crash threshold at the atlas
param; see tests/conftest.py)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import _render_chunk
from bhraytracer_tpu.ops.camera import CameraParams



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




# ---------------------------------------------------------------------------
# geometry + texture gradients (VERDICT r1 #7)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def setup_mesh():
    """Scene with a camera-facing textured quad mesh and a checker plane —
    exercises pack.verts (barycentric path in resolve_hit) and the texture
    tables (checker colors + float atlas) as gradient targets."""
    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene

    sd = D.SceneDesc()
    # 4x4 file texture (mid-gray with structure so bilinear weights vary).
    img = (np.arange(48).reshape(4, 4, 3) * 4 + 80).astype(np.uint8)
    sd.textures.append(D.TextureDesc(kind="file", name="img", image=img))
    sd.textures.append(D.TextureDesc(
        kind="checker", name="chk",
        color1=np.array([0.2, 0.2, 0.2]), color2=np.array([0.8, 0.8, 0.8])))
    sd.texmaps.append(D.TextureMapDesc(texture=0))
    sd.texmaps.append(D.TextureMapDesc(texture=1))

    quad_m = D.MaterialDesc(name="quad")
    quad_m.diffuse = D.TexturedColorDesc(color=np.array([1.0, 1.0, 1.0]), texmap=0)
    quad_m.specular = D.TexturedColorDesc(color=np.array([0.2, 0.2, 0.2]))
    quad_m.glossiness = 20.0
    floor_m = D.MaterialDesc(name="floor")
    floor_m.diffuse = D.TexturedColorDesc(color=np.array([1.0, 1.0, 1.0]), texmap=1)
    floor_m.specular = D.TexturedColorDesc(color=np.zeros(3))
    sd.materials += [quad_m, floor_m]

    verts = np.array([[-1.0, 2.0, 0.5], [1.0, 2.0, 0.5],
                      [1.0, 2.0, 2.5], [-1.0, 2.0, 2.5]], np.float32)
    faces = np.array([[0, 1, 2], [0, 2, 3]], np.int32)
    normals = np.tile(np.array([[0.0, -1.0, 0.0]], np.float32), (4, 1))
    uvs = np.array([[0.1, 0.1, 0], [0.9, 0.1, 0],
                    [0.9, 0.9, 0], [0.1, 0.9, 0]], np.float32)
    sd.meshes.append(D.MeshDesc(
        name="quad", verts=verts, faces=faces, normals=normals,
        face_normals=faces.copy(), uvs=uvs, face_uvs=faces.copy(),
        face_mtl=np.full(2, -1, np.int32)))
    sd.nodes.append(D.NodeDesc(kind="mesh", name="quad", transform=D.Transform(),
                               material=0, mesh=0))
    t2 = D.Transform(); t2.scale(20.0, 20.0, 20.0)
    sd.nodes.append(D.NodeDesc(kind="plane", name="g", transform=t2, material=1))
    sd.lights.append(D.LightDesc(kind="point", intensity=np.full(3, 40.0),
                                 position=np.array([4.0, -4.0, 8.0])))
    sd.background = D.TexturedColorDesc(color=np.array([0.1, 0.1, 0.1]))
    sd.environment = D.TexturedColorDesc(color=np.array([0.3, 0.3, 0.3]))

    cam = D.Camera()
    cam.pos = np.array([0.0, -8.0, 3.0])
    d = np.array([0.0, 8.0, -2.0]); cam.dir = d / np.linalg.norm(d)
    x = np.cross(cam.dir, np.array([0.0, 0.0, 1.0]))
    up = np.cross(x, cam.dir); cam.up = up / np.linalg.norm(up)
    cam.width, cam.height = 24, 18

    pack = compile_scene(sd)
    # Promote the atlas to float32 (0..255 scale) so texel gradients flow.
    pack = dataclasses.replace(pack, atlas=jnp.asarray(pack.atlas, jnp.float32))
    cfg = RenderConfig(
        spp=1, gi_bounces=1, extra_refr_levels=0, tir_bounces=2,
        chunk_rays=432, texture_sample_count=1, differentiable=True,
    )
    cam_p = CameraParams(
        pos=jnp.asarray(cam.pos, jnp.float32),
        dir=jnp.asarray(cam.dir, jnp.float32),
        up=jnp.asarray(cam.up, jnp.float32),
        fov=jnp.float32(40.0), focaldist=jnp.float32(1.0),
    )
    n = cam.width * cam.height
    idx = np.arange(n)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)
    key = jax.random.PRNGKey(7)
    return pack, cfg, cam_p, cam, px, py, key


@pytest.mark.parametrize(
    "param,eps,tol",
    [
        ("verts", 2e-3, 0.15),
        ("tex_c1", 1e-3, 0.08),
        ("atlas", 0.5, 0.08),  # uint8 0..255 scale
    ],
)
def test_mesh_texture_grads_match_fd(setup_mesh, param, eps, tol):
    pack, cfg, cam_p, cam, px, py, key = setup_mesh
    base = getattr(pack, param)
    loss = _loss_fn(setup_mesh, param)
    g = np.asarray(jax.grad(loss)(base))
    assert np.isfinite(g).all(), param
    assert np.abs(g).max() > 1e-8, param

    flat = np.asarray(base, np.float64).ravel()
    order = np.argsort(-np.abs(g.ravel()))[:3]
    for i in order:
        if abs(g.ravel()[i]) < 1e-6:
            continue
        dv = np.zeros_like(flat)
        dv[i] = eps
        shape = np.asarray(base).shape
        lp = float(loss(jnp.asarray((flat + dv).reshape(shape), jnp.float32)))
        lm = float(loss(jnp.asarray((flat - dv).reshape(shape), jnp.float32)))
        fd = (lp - lm) / (2 * eps)
        an = g.ravel()[i]
        assert abs(fd - an) <= tol * max(abs(fd), abs(an), 1e-4), (param, i, fd, an)


def test_trainable_params_roundtrip(setup_mesh):
    """verts/textures enter and leave the train pytree intact."""
    from bhraytracer_tpu.parallel.sharding import _apply_params, trainable_params

    pack, cfg, cam_p, cam, px, py, key = setup_mesh
    params = trainable_params(pack, cam_p, include_geometry=True,
                              include_textures=True)
    assert {"verts", "tex_c1", "tex_c2", "atlas"} <= set(params)
    pk, cm = _apply_params(pack, cam_p, jax.tree.map(lambda x: x + 0.0, params))
    assert pk.verts.shape == pack.verts.shape
    assert pk.atlas.dtype == jnp.float32


def test_inverse_render_step_256(setup_mesh):
    """One value_and_grad + SGD step at 256x256 (65536 lanes) through the
    monolithic differentiable path with per-level remat (BASELINE config 5 /
    VERDICT r1 #7: the FD toys ran at 432 lanes; remat makes 256x256 fit)."""
    from bhraytracer_tpu.parallel.sharding import _apply_params, trainable_params

    pack, cfg, cam_p, cam, _, _, key = setup_mesh
    w = h = 256
    n = w * h
    idx = np.arange(n)
    px = jnp.asarray(idx % w, jnp.int32)
    py = jnp.asarray(idx // w, jnp.int32)

    params = trainable_params(pack, cam_p, include_geometry=True)
    target_pack = dataclasses.replace(
        pack, mtl_diffuse=pack.mtl_diffuse * 0.7)
    target, _, _ = _render_chunk(target_pack, cfg, cam_p, w, h, px, py, key)
    target = jax.lax.stop_gradient(target)

    def loss_fn(p):
        pk, cm = _apply_params(pack, cam_p, p)
        rad, _, _ = _render_chunk(pk, cfg, cm, w, h, px, py, key)
        return jnp.mean((rad - target) ** 2)

    l0, grads = jax.value_and_grad(loss_fn)(params)
    flat = jax.tree.leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in flat)
    assert float(jnp.abs(grads["mtl_diffuse"]).max()) > 0
    # Backtracking step along the perturbed parameter only: the full tree
    # mixes scales (camera basis vectors, raw vertices) whose gradients
    # dwarf the diffuse-table surface, so even tiny full-tree steps
    # overshoot; the descent check belongs on the parameter the target
    # actually moved.
    l1 = None
    for lr in (0.05, 0.01, 0.002):
        new_params = dict(params,
                          mtl_diffuse=params["mtl_diffuse"]
                          - lr * grads["mtl_diffuse"])
        l1 = float(loss_fn(new_params))
        if l1 < float(l0):
            break
    assert l1 < float(l0), (l1, float(l0))
