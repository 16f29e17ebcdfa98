import jax
import numpy as np

from bhraytracer_tpu.models.denoiser import (
    DenoiserUNet,
    denoise,
    init_denoiser,
    train_denoiser,
)


def test_denoiser_shapes(rng):
    model, params = init_denoiser(jax.random.PRNGKey(0))
    img = rng.uniform(0, 1, (37, 53, 3)).astype(np.float32)  # non-/4 dims
    out = np.asarray(denoise(model, params, img))
    assert out.shape == (37, 53, 3)
    assert np.isfinite(out).all()


def test_denoiser_learns_denoising(rng):
    """Train on synthetic noisy/clean pairs; MSE must drop substantially and
    the trained net must beat the identity on held-out noise."""
    model, params = init_denoiser(jax.random.PRNGKey(1))

    def make_clean(n):
        # Smooth random images: low-frequency patterns.
        x = rng.uniform(0, 1, (n, 4, 4, 3)).astype(np.float32)
        return jax.image.resize(x, (n, 32, 32, 3), "cubic")

    clean = np.asarray(make_clean(8)).clip(0, 1)
    noise = rng.normal(0, 0.2, clean.shape).astype(np.float32)
    noisy = (clean + noise).astype(np.float32)

    params2, losses = train_denoiser(model, params, noisy, clean, steps=300, lr=2e-3)
    assert losses[-1] < losses[0] * 0.5, (losses[0], losses[-1])

    test_clean = np.asarray(make_clean(2)).clip(0, 1)
    test_noisy = test_clean + rng.normal(0, 0.2, test_clean.shape).astype(np.float32)
    out = np.stack(
        [np.asarray(denoise(model, params2, t)) for t in test_noisy]
    )
    mse_id = np.mean((test_noisy - test_clean) ** 2)
    mse_dn = np.mean((out - test_clean) ** 2)
    assert mse_dn < mse_id * 0.7, (mse_dn, mse_id)


def test_pretrained_weights_ship_and_improve(tmp_path):
    """The checked-in weights load (OIDN-arrives-pretrained contract,
    Main.cpp:60-95) and reduce real Monte-Carlo render noise on a scene
    OUTSIDE their training set (proj2/proj7/proj12 pairs)."""
    import jax.numpy as jnp

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.denoiser import denoise, load_pretrained
    from bhraytracer_tpu.models.pathtracer import render_image
    from bhraytracer_tpu.scene.xml_loader import load_scene
    from tests.test_render import SIMPLE_SCENE

    p = tmp_path / "scene.xml"
    p.write_text(SIMPLE_SCENE.replace(
        "</scene>",
        """
        <material type="blinn" name="red">
          <diffuse r="0.8" g="0.2" b="0.2"/><specular value="0.5"/>
          <glossiness value="20"/>
        </material>
        <material type="blinn" name="white">
          <diffuse value="0.9"/><specular value="0"/>
        </material></scene>"""))
    pack, cam = load_scene(str(p))
    cam.width = cam.height = 48
    base = dict(gi_bounces=2, extra_refr_levels=0, chunk_rays=2304,
                texture_sample_count=1, use_gamma=False)
    noisy, aux = render_image(pack, cam, RenderConfig(spp=1, **base), seed=5,
                              return_aux=True)
    clean = render_image(pack, cam, RenderConfig(spp=32, **base), seed=9)

    model, params = load_pretrained()
    assert model.aux_channels == 6
    a = np.concatenate([aux["albedo"], aux["normal"]], -1)
    out = np.asarray(denoise(model, params, jnp.asarray(noisy),
                             aux=jnp.asarray(a)))
    assert np.isfinite(out).all()
    mse_id = float(np.mean((noisy - clean) ** 2))
    mse_dn = float(np.mean((out - clean) ** 2))
    # Measured 0.64x on this scene; assert with slack.
    assert mse_dn < mse_id * 0.85, (mse_dn, mse_id)
