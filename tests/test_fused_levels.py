"""cfg.fused_levels parity: the one-program chunk path must reproduce the
staged per-level path. This is the configuration bench.py's headline runs
(one fused 480K-lane program per pass on TPU), so it needs a standing
correctness pin, not just the round-3 sweep's eyeballing."""

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


def test_fused_matches_staged(gen_assets_root):
    import warnings

    from bhraytracer_tpu.scene.xml_loader import load_scene

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pack, cam = load_scene(
            "/root/reference/BHRayTracer/Resource/Data/"
            "proj12_backfaceTest.xml", resource_root=gen_assets_root)
    cam.width, cam.height = 64, 48
    n = 1536
    base = dict(spp=1, gi_bounces=2, extra_refr_levels=1, tir_bounces=6,
                chunk_rays=n, texture_sample_count=1, refr_capacity=0.25)
    # fused_levels=None now auto-selects fused; pin the staged leg.
    r_s, z_s, st_s = _run(pack, cam, RenderConfig(**base, fused_levels=False), n)
    r_f, z_f, st_f = _run(pack, cam,
                          RenderConfig(**base, fused_levels=True), n)
    # Same RNG chain, same math: stats (drops + segments) must be equal;
    # radiance may shift by XLA fusion-boundary rounding only.
    np.testing.assert_array_equal(st_s, st_f)
    np.testing.assert_array_equal(z_s, z_f)
    np.testing.assert_allclose(r_s, r_f, rtol=1e-5, atol=1e-5)
    exact = np.mean(r_s == r_f)
    assert exact > 0.99, f"only {exact:.3f} of radiance values bit-equal"
