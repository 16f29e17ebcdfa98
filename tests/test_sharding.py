"""Multi-device tests on the 8-device virtual CPU mesh.

The sharded render runs under jax.shard_map (NOT plain jit+GSPMD): each
device executes the whole trace on its lane shard, so Pallas kernels run
per-device on local shapes, and each device's RNG key is folded with its
global lane offset. A distributed render is therefore NOT bit-identical to
a single-chip render — it is the same estimator with decorrelated streams —
and the tests below check exactly that structure.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import _render_chunk
from bhraytracer_tpu.ops.camera import from_scene_camera
from bhraytracer_tpu.parallel import sharding as S
from bhraytracer_tpu.parallel.sharding import (
    make_mesh,
    render_radiance_sharded,
    train_step_sharded,
    trainable_params,
)


@pytest.fixture(scope="module")
def scene():
    from __graft_entry__ import _tiny_scene

    pack, cam = _tiny_scene()
    cfg = RenderConfig(
        spp=1, gi_bounces=1, extra_refr_levels=0, tir_bounces=2,
        chunk_rays=512, texture_sample_count=1, differentiable=True,
    )
    return pack, cam, cfg, from_scene_camera(cam)


def _lanes(cam, n):
    idx = np.linspace(0, cam.width * cam.height - 1, n).astype(np.int64)
    return (jnp.asarray(idx % cam.width, jnp.int32),
            jnp.asarray(idx // cam.width, jnp.int32))


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_statistics_match_single(scene):
    """Same estimator, different streams: the sharded image must agree with
    the single-device image to within ordinary sampling noise (yardstick:
    the single-device render under a different seed), and must be
    deterministic call-to-call."""
    pack, cam, cfg, cam_p = scene
    mesh = make_mesh(8)
    px, py = _lanes(cam, 512)
    key = jax.random.PRNGKey(3)

    rad_sh = np.asarray(render_radiance_sharded(
        pack, cfg, cam_p, cam.width, cam.height, px, py, key, mesh))
    rad_sh2 = np.asarray(render_radiance_sharded(
        pack, cfg, cam_p, cam.width, cam.height, px, py, key, mesh))
    np.testing.assert_array_equal(rad_sh, rad_sh2)  # deterministic

    rad_1, _, _ = _render_chunk(pack, cfg, cam_p, cam.width, cam.height,
                                px, py, key)
    rad_1b, _, _ = _render_chunk(pack, cfg, cam_p, cam.width, cam.height,
                                 px, py, jax.random.PRNGKey(99))
    rad_1, rad_1b = np.asarray(rad_1), np.asarray(rad_1b)
    noise = abs(rad_1.mean() - rad_1b.mean())
    assert abs(rad_sh.mean() - rad_1.mean()) <= 4.0 * noise + 0.02, (
        rad_sh.mean(), rad_1.mean(), noise)


def test_sharded_streams_decorrelated(scene):
    """Every shard gets IDENTICAL pixels: without the global-lane-offset key
    fold, all 8 devices would draw the same uniforms and produce identical
    radiance shards. Assert the shards differ pairwise."""
    pack, cam, cfg, cam_p = scene
    mesh = make_mesh(8)
    px0, py0 = _lanes(cam, 64)
    px = jnp.tile(px0, 8)
    py = jnp.tile(py0, 8)
    key = jax.random.PRNGKey(5)

    rad = np.asarray(render_radiance_sharded(
        pack, cfg, cam_p, cam.width, cam.height, px, py, key, mesh))
    shards = rad.reshape(8, 64, 3)
    for i in range(1, 8):
        assert not np.array_equal(shards[0], shards[i]), (
            f"shard {i} repeats shard 0's stream")


def test_shard_map_body_sees_local_shapes(scene, monkeypatch):
    """Structural guard against the GSPMD-replication failure mode: the
    trace body (and therefore every Pallas kernel inside it) must be traced
    with the 64-lane LOCAL shard, not the 512-lane global array."""
    pack, cam, cfg, cam_p = scene
    mesh = make_mesh(8)
    px, py = _lanes(cam, 512)
    seen = []
    real = S._render_chunk

    def spy(pack_, cfg_, cam_, w, h, px_, py_, key_, pmap=None):
        seen.append(px_.shape)
        return real(pack_, cfg_, cam_, w, h, px_, py_, key_, pmap=pmap)

    monkeypatch.setattr(S, "_render_chunk", spy)
    render_radiance_sharded(pack, cfg, cam_p, cam.width, cam.height,
                            px, py, jax.random.PRNGKey(7), mesh)
    assert seen and all(s == (64,) for s in seen), seen


def test_sharded_render_with_pallas_kernels(scene):
    """Pallas trace kernels inside the shard_map body (interpret mode here)
    must agree with the XLA path under the SAME shard keying."""
    from bhraytracer_tpu.ops import trace as T

    pack, cam, cfg, cam_p = scene
    cfg = dataclasses.replace(cfg, differentiable=False)
    mesh = make_mesh(8)
    px, py = _lanes(cam, 512)
    key = jax.random.PRNGKey(3)

    T.set_pallas_mode("on")
    try:
        rad_kernel = render_radiance_sharded(
            pack, cfg, cam_p, cam.width, cam.height, px, py, key, mesh)
    finally:
        T.set_pallas_mode("off")
    try:
        rad_xla = render_radiance_sharded(
            pack, cfg, cam_p, cam.width, cam.height, px, py, key, mesh)
    finally:
        T.set_pallas_mode("auto")
    np.testing.assert_allclose(
        np.asarray(rad_kernel), np.asarray(rad_xla), rtol=2e-4, atol=2e-5)


def test_train_step_reduces_loss(scene):
    """Inverse rendering: a few SGD steps on sharded lanes must reduce the
    loss toward a darker target (grads psum'd over the dp axis)."""
    pack, cam, cfg, cam_p = scene
    mesh = make_mesh(8)
    px, py = _lanes(cam, 512)
    key = jax.random.PRNGKey(4)

    target, _, _ = _render_chunk(pack, cfg, cam_p, cam.width, cam.height, px, py, key)
    target = target * 0.5  # pretend the scene should be half as bright

    params = trainable_params(pack, cam_p)
    losses = []
    for i in range(5):
        params, _, loss = train_step_sharded(
            params, None, pack, cfg, cam_p, cam.width, cam.height,
            px, py, target, key, mesh, lr=0.05,
        )
        losses.append(float(loss))
    assert losses[-1] < losses[0] * 0.9, losses
    assert np.isfinite(losses).all()
