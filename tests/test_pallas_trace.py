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
