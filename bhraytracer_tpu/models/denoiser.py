"""Learned denoiser head — the TPU-native replacement for Intel OIDN.

The reference pipes the finished float image through OIDN's pretrained "RT"
CNN filter (DenoiseImage, Main.cpp:60-95: color in -> color out, optional
albedo/normal auxiliaries). OIDN is a black-box x86 binary; here the same
interface is a small convolutional U-Net in flax, trained self-supervised on
the renderer's own (low-spp, high-spp) image pairs. Convolutions run on the
MXU in bf16-friendly shapes.
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np
import optax


class DenoiserUNet(nn.Module):
    """U-Net-lite: 2 downsamples, skip connections, residual output."""

    features: Sequence[int] = (16, 32, 64)
    aux_channels: int = 0  # 0 = color only; 6 adds albedo + normal

    @nn.compact
    def __call__(self, x):
        # x: (B, H, W, 3 + aux). H, W divisible by 4.
        color = x[..., :3]
        skips = []
        h = x
        for f in self.features[:-1]:
            h = nn.Conv(f, (3, 3), padding="SAME")(h)
            h = nn.relu(h)
            h = nn.Conv(f, (3, 3), padding="SAME")(h)
            h = nn.relu(h)
            skips.append(h)
            h = nn.avg_pool(h, (2, 2), strides=(2, 2))
        h = nn.Conv(self.features[-1], (3, 3), padding="SAME")(h)
        h = nn.relu(h)
        for f, skip in zip(reversed(self.features[:-1]), reversed(skips)):
            b, hh, ww, c = h.shape
            h = jax.image.resize(h, (b, hh * 2, ww * 2, c), "nearest")
            h = jnp.concatenate([h, skip], axis=-1)
            h = nn.Conv(f, (3, 3), padding="SAME")(h)
            h = nn.relu(h)
        delta = nn.Conv(3, (3, 3), padding="SAME")(h)
        # Residual: predict a correction to the noisy color.
        return color + delta


def init_denoiser(key, aux_channels: int = 0, size: int = 32,
                  features: Sequence[int] = (16, 32, 64)):
    model = DenoiserUNet(aux_channels=aux_channels, features=tuple(features))
    params = model.init(key, jnp.zeros((1, size, size, 3 + aux_channels)))
    return model, params


def _pad4(img):
    h, w = img.shape[-3:-1]
    ph = (-h) % 4
    pw = (-w) % 4
    if ph or pw:
        pad = [(0, 0)] * (img.ndim - 3) + [(0, ph), (0, pw), (0, 0)]
        img = jnp.pad(img, pad, mode="edge")
    return img, h, w


def denoise(model: DenoiserUNet, params, img, aux: Optional[jnp.ndarray] = None):
    """Denoise an (H, W, 3) image (OIDN filter.execute equivalent)."""
    x = jnp.asarray(img)[None]
    if aux is not None:
        x = jnp.concatenate([x, jnp.asarray(aux)[None]], axis=-1)
    x, h, w = _pad4(x)
    out = model.apply(params, x)
    return out[0, :h, :w]


def train_denoiser(
    model: DenoiserUNet,
    params,
    noisy: np.ndarray,  # (N, H, W, 3+aux)
    clean: np.ndarray,  # (N, H, W, 3)
    steps: int = 200,
    lr: float = 1e-3,
    batch: int = 4,
    seed: int = 0,
    weights: Optional[np.ndarray] = None,  # (N,) per-pair loss weights
) -> Tuple[object, list]:
    """Self-supervised training on (low-spp, high-spp) render pairs.

    `weights` rebalances the per-pair MSE so one noisy scene cannot
    dominate the loss (e.g. 1/noisy_mse per pair, normalized)."""
    tx = optax.adam(lr)
    opt_state = tx.init(params)
    noisy, _, _ = _pad4(jnp.asarray(noisy))
    clean, _, _ = _pad4(jnp.asarray(clean))
    w = (jnp.ones((noisy.shape[0],)) if weights is None
         else jnp.asarray(weights, jnp.float32))

    @jax.jit
    def step(params, opt_state, idx):
        def loss_fn(p):
            pred = model.apply(p, noisy[idx])
            per = jnp.mean((pred - clean[idx]) ** 2, axis=(1, 2, 3))
            return jnp.mean(per * w[idx])

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state2 = tx.update(grads, opt_state)
        return optax.apply_updates(params, updates), opt_state2, loss

    rng = np.random.default_rng(seed)
    losses = []
    for _ in range(steps):
        idx = jnp.asarray(rng.integers(0, noisy.shape[0], size=batch))
        params, opt_state, loss = step(params, opt_state, idx)
        losses.append(float(loss))
    return params, losses


_PRETRAINED = "denoiser_weights.npz"


def save_weights(params, path: str, aux_channels: int = 0,
                 features: Sequence[int] = (16, 32, 64)) -> None:
    """Flatten the flax param pytree to an npz (plus the aux-channel count
    and the feature widths, so load_weights rebuilds the right module)."""
    import os

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    arrs = {"/".join(str(getattr(k, "key", k)) for k in path_): np.asarray(v)
            for path_, v in flat}
    arrs["__aux_channels__"] = np.int32(aux_channels)
    arrs["__features__"] = np.asarray(features, np.int32)
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrs)
    os.replace(tmp, path)


def load_weights(path: str):
    """Inverse of save_weights: returns (model, params)."""
    data = np.load(path)
    aux = int(data["__aux_channels__"])
    feats = (tuple(int(x) for x in data["__features__"])
             if "__features__" in data.files else (16, 32, 64))
    model = DenoiserUNet(aux_channels=aux, features=feats)
    params = {}
    for k in data.files:
        if k in ("__aux_channels__", "__features__"):
            continue
        node = params
        parts = k.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = jnp.asarray(data[k])
    return model, params


def load_pretrained():
    """The shipped weights (trained on bundled-scene render pairs by
    tools/train_denoiser.py — the OIDN-arrives-pretrained contract,
    Main.cpp:60-95)."""
    import os

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        _PRETRAINED)
    if not os.path.exists(path):
        raise FileNotFoundError(
            f"pretrained denoiser weights missing at {path}; regenerate with "
            "tools/train_denoiser.py")
    return load_weights(path)


def render_training_pairs(pack, camera, base_cfg, n_pairs: int = 4,
                          noisy_spp: int = 2, clean_spp: int = 64, seed: int = 0,
                          with_aux: bool = False):
    """Render (noisy, clean) pairs with the project's own renderer. With
    with_aux, the noisy tensor gains first-hit albedo+normal channels
    (the OIDN RT-filter auxiliary inputs, Main.cpp:68-77)."""
    import dataclasses

    from bhraytracer_tpu.models.pathtracer import render_image

    noisy, clean = [], []
    for i in range(n_pairs):
        cfg_n = dataclasses.replace(base_cfg, spp=noisy_spp, use_gamma=False)
        cfg_c = dataclasses.replace(base_cfg, spp=clean_spp, use_gamma=False)
        if with_aux:
            img, aux = render_image(pack, camera, cfg_n, seed=seed + 1000 + i,
                                    return_aux=True)
            noisy.append(np.concatenate(
                [img, aux["albedo"], aux["normal"]], -1))
        else:
            noisy.append(render_image(pack, camera, cfg_n, seed=seed + 1000 + i))
        clean.append(render_image(pack, camera, cfg_c, seed=seed + 2000 + i))
    return np.stack(noisy), np.stack(clean)
