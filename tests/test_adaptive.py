"""Adaptive sampling + per-pixel sample-count tracking (RenderImage
sample-count buffer parity, scene.h:532-536, 605-626)."""

import numpy as np

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import render_image


def _scene():
    import bench as B
    from bhraytracer_tpu.scene.compile import compile_scene

    sd = B._tiny_scene_desc()
    return compile_scene(sd), sd.camera


def test_sample_counts_and_adaptive_pass():
    pack, cam = _scene()
    cam.width, cam.height = 64, 48
    base = dict(spp=2, gi_bounces=1, extra_refr_levels=0, tir_bounces=4,
                chunk_rays=1024, texture_sample_count=1, use_gamma=False)
    cfg0 = RenderConfig(**base)
    img0, aux0 = render_image(pack, cam, cfg0, seed=0, return_aux=True)
    assert (aux0["sample_count"] == 2).all()

    cfg1 = RenderConfig(**base, adaptive_spp=3, adaptive_fraction=0.25)
    img1, aux1 = render_image(pack, cam, cfg1, seed=0, return_aux=True)
    sc = aux1["sample_count"]
    total = sc.size
    k_sel = max(1, int(total * 0.25))
    assert (sc == 5).sum() == k_sel
    assert ((sc == 2) | (sc == 5)).all()
    # Selected pixels are the contrast-heavy ones; the base image is
    # untouched elsewhere.
    np.testing.assert_allclose(img1[sc == 2], img0[sc == 2], rtol=1e-6)
    assert np.isfinite(img1).all()

    # More samples on the noisy pixels must not increase the error vs a
    # high-spp reference (statistical, but 3 extra on top of 2 at fixed
    # seed is a wide margin).
    ref = render_image(pack, cam, RenderConfig(**{**base, "spp": 32}), seed=7)
    mse0 = float(np.mean((img0 - ref) ** 2))
    mse1 = float(np.mean((img1 - ref) ** 2))
    assert mse1 < mse0


def test_adaptive_deterministic():
    pack, cam = _scene()
    cam.width, cam.height = 32, 24
    cfg = RenderConfig(spp=1, gi_bounces=1, extra_refr_levels=0,
                       tir_bounces=4, chunk_rays=512,
                       texture_sample_count=1, use_gamma=False,
                       adaptive_spp=2, adaptive_fraction=0.2)
    a = render_image(pack, cam, cfg, seed=3)
    b = render_image(pack, cam, cfg, seed=3)
    np.testing.assert_array_equal(a, b)
