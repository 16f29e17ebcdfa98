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
