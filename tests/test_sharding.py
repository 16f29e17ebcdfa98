"""Multi-device tests on the 8-device virtual CPU mesh."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import _render_chunk
from bhraytracer_tpu.ops.camera import from_scene_camera
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


def test_mesh_has_8_devices():
    assert len(jax.devices()) == 8


def test_sharded_render_matches_single(scene):
    pack, cam, cfg, cam_p = scene
    mesh = make_mesh(8)
    n = 512
    idx = np.linspace(0, cam.width * cam.height - 1, n).astype(np.int64)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)
    key = jax.random.PRNGKey(3)

    rad_sharded = render_radiance_sharded(
        pack, cfg, cam_p, cam.width, cam.height, px, py, key, mesh
    )
    rad_single, _, _ = _render_chunk(pack, cfg, cam_p, cam.width, cam.height, px, py, key)
    np.testing.assert_allclose(
        np.asarray(rad_sharded), np.asarray(rad_single), rtol=2e-4, atol=2e-5
    )


def test_sharded_render_with_pallas_kernels(scene):
    """dp-sharded lanes composed with the Pallas trace/shade kernels
    (interpret mode here; validates the GSPMD composition of the sharded
    render with kernel-bearing programs, not Mosaic partitioning)."""
    from bhraytracer_tpu.ops import trace as T

    pack, cam, cfg, cam_p = scene
    cfg = dataclasses.replace(cfg, differentiable=False)
    mesh = make_mesh(8)
    n = 512
    idx = np.linspace(0, cam.width * cam.height - 1, n).astype(np.int64)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)
    key = jax.random.PRNGKey(3)

    T.set_pallas_mode("on")
    try:
        rad_sharded = render_radiance_sharded(
            pack, cfg, cam_p, cam.width, cam.height, px, py, key, mesh
        )
        rad_single, _, _ = _render_chunk(
            pack, cfg, cam_p, cam.width, cam.height, px, py, key)
    finally:
        T.set_pallas_mode("auto")
    np.testing.assert_allclose(
        np.asarray(rad_sharded), np.asarray(rad_single), rtol=2e-4, atol=2e-5
    )


def test_train_step_reduces_loss(scene):
    """Inverse rendering: a few SGD steps on sharded lanes must reduce the
    loss toward a darker target (grads psum'd over the dp axis)."""
    pack, cam, cfg, cam_p = scene
    mesh = make_mesh(8)
    n = 512
    # Spread lanes over the whole image (the first rows are all background,
    # which would give legitimately zero parameter gradients).
    idx = np.linspace(0, cam.width * cam.height - 1, n).astype(np.int64)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)
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
