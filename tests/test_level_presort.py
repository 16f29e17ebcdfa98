"""cfg.level_presort parity: the once-per-level coherence presort is a pure
reordering — per-lane uniforms travel with their task and the child
compactions partition over the ORIGINAL lane order, so slot-positional RNG
pairing (glossy refraction included) matches the non-presorted path
exactly. Stats and z are pinned EQUAL; radiance may shift only by XLA
fusion-boundary rounding (ulp-level, same standard as test_fused_levels)."""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import render_chunk_staged_at
from bhraytracer_tpu.ops.camera import from_scene_camera


def _run(pack, cam, cfg, n):
    cam_p = from_scene_camera(cam)
    acc0 = jnp.zeros((n, 3))
    zb0 = jnp.full((n,), 1e30)
    st0 = jnp.zeros((4,), jnp.int32)
    rad, z, st = render_chunk_staged_at(
        pack, cfg, cam_p, cam.width, cam.height, n, jnp.int32(0),
        jax.random.PRNGKey(7), jnp.int32(3), None, acc0, zb0, True,
        st_prev=st0)
    return np.asarray(rad), np.asarray(z), np.asarray(st.vec)


def _load(gen_assets_root, degloss: bool):
    import warnings

    from bhraytracer_tpu.scene.xml_loader import load_scene

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pack, cam = load_scene(
            "/root/reference/BHRayTracer/Resource/Data/"
            "proj12_backfaceTest.xml", resource_root=gen_assets_root)
    if degloss:
        # Pull every glossiness to 20 (<= 50 -> rgloss == 0): the chain
        # draws no glossy-refraction uniforms, so ANY chain-lane ordering
        # is bit-exact.
        pack = dataclasses.replace(
            pack, mtl_gloss=jnp.minimum(pack.mtl_gloss, 20.0))
    cam.width, cam.height = 64, 48
    return pack, cam


BASE = dict(spp=1, gi_bounces=2, extra_refr_levels=1, tir_bounces=6,
            chunk_rays=1536, texture_sample_count=1, refr_capacity=0.25)


def _assert_same(r0, z0, st0, r1, z1, st1):
    # Same RNG pairing, same per-lane math: stats and z must be EQUAL.
    # Radiance may shift by XLA fusion-boundary rounding only (the presort
    # changes program structure, so fusions differ — same standard as
    # test_fused_levels).
    np.testing.assert_array_equal(st0, st1)
    np.testing.assert_array_equal(z0, z1)
    np.testing.assert_allclose(r0, r1, rtol=1e-5, atol=1e-5)
    exact = np.mean(r0 == r1)
    assert exact > 0.99, f"only {exact:.3f} of radiance values bit-equal"


def test_presort_bit_exact_without_glossy_refraction(gen_assets_root):
    pack, cam = _load(gen_assets_root, degloss=True)
    n = BASE["chunk_rays"]
    r0, z0, st0 = _run(pack, cam, RenderConfig(**BASE), n)
    r1, z1, st1 = _run(pack, cam,
                       RenderConfig(**BASE, level_presort=True), n)
    _assert_same(r0, z0, st0, r1, z1, st1)


def test_presort_bit_exact_with_glossy_refraction(gen_assets_root):
    # Glossiness 200000 -> the chain draws slot-keyed glossy-refraction
    # uniforms; the original-order child partition keeps the pairing, so
    # even this path is bit-exact.
    pack, cam = _load(gen_assets_root, degloss=False)
    n = BASE["chunk_rays"]
    r0, z0, st0 = _run(pack, cam, RenderConfig(**BASE), n)
    r1, z1, st1 = _run(pack, cam,
                       RenderConfig(**BASE, level_presort=True), n)
    _assert_same(r0, z0, st0, r1, z1, st1)
