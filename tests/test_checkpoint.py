"""Checkpoint/resume: a killed render continues where it stopped and the
final image matches an uninterrupted render exactly."""

import numpy as np

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import render_image
from bhraytracer_tpu.utils.checkpoint import (
    load_render_state,
    load_train_state,
    save_train_state,
)


def test_render_resume_exact(tmp_path):
    from __graft_entry__ import _tiny_scene

    pack, cam = _tiny_scene()
    cfg = RenderConfig(spp=1, gi_bounces=1, extra_refr_levels=0, tir_bounces=2,
                       chunk_rays=1024, texture_sample_count=1)
    ckpt = str(tmp_path / "ck")

    full = render_image(pack, cam, cfg, seed=5)

    # "Kill" after the first chunk: simulate by pre-seeding the checkpoint
    # from a partial run (render once with checkpointing, then wipe the
    # done-flags of later chunks and resume).
    img1 = render_image(pack, cam, cfg, seed=5, checkpoint_dir=ckpt)
    np.testing.assert_allclose(img1, full, atol=1e-6)

    state = load_render_state(ckpt, cfg, cam.width, cam.height, 5)
    assert state is not None
    accum, zbuf, done = state
    assert done.all()

    # Invalidate the second half and resume: result must still match.
    done[len(done) // 2:] = False
    accum_bad = accum.copy()
    from bhraytracer_tpu.utils.checkpoint import save_render_state

    save_render_state(ckpt, accum_bad, zbuf, done, cfg, cam.width, cam.height, 5)
    img2 = render_image(pack, cam, cfg, seed=5, checkpoint_dir=ckpt)
    np.testing.assert_allclose(img2, full, atol=1e-6)


def test_render_checkpoint_config_mismatch(tmp_path):
    from __graft_entry__ import _tiny_scene

    pack, cam = _tiny_scene()
    cfg1 = RenderConfig(spp=1, gi_bounces=1, extra_refr_levels=0, tir_bounces=2,
                        chunk_rays=1024, texture_sample_count=1)
    ckpt = str(tmp_path / "ck")
    render_image(pack, cam, cfg1, seed=5, checkpoint_dir=ckpt)
    # Different seed -> stale checkpoint must be ignored, not resumed.
    assert load_render_state(ckpt, cfg1, cam.width, cam.height, 6) is None


def test_train_state_roundtrip(tmp_path, rng):
    import jax.numpy as jnp

    state = {
        "w": jnp.asarray(rng.normal(size=(4, 3)).astype(np.float32)),
        "step": jnp.asarray(7),
    }
    path = str(tmp_path / "train")
    save_train_state(path, state)
    restored = load_train_state(path, state)
    assert restored is not None
    np.testing.assert_allclose(np.asarray(restored["w"]), np.asarray(state["w"]))
    assert int(np.asarray(restored["step"])) == 7
