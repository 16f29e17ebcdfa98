"""Train the shipped denoiser weights on bundled-scene render pairs.

Produces bhraytracer_tpu/models/denoiser_weights.npz — the pretrained
artifact render_image(cfg.use_denoiser=True) loads by default (the
OIDN-arrives-pretrained contract, BHRayTracer/Main.cpp:60-95).

Usage: python tools/train_denoiser.py [--steps 1500] [--res 96] [--cpu]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--res", type=int, default=96)
    ap.add_argument("--pairs-per-scene", type=int, default=3)
    ap.add_argument("--clean-spp", type=int, default=48)
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default=None)
    ap.add_argument("--features", default="24,48,96",
                    help="comma-separated U-Net feature widths")
    ap.add_argument("--render-scene", default=None, help="internal: render "
                    "one scene's pairs and exit (fresh-process worker)")
    ap.add_argument("--render-out", default=None)
    ap.add_argument("--seed", type=int, default=17)
    ap.add_argument("--noisy-spp", default="2",
                    help="comma-separated noisy spp values; pairs rotate "
                         "through them (robustness across noise levels)")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import numpy as np

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models import denoiser as DN
    from bhraytracer_tpu.scene.xml_loader import load_scene

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    assets = os.path.join(repo, "assets")
    scenes = ["proj2.xml", "proj3.xml", "proj5.xml", "proj7.xml",
              "proj9.xml", "proj10.xml", "proj11_0.xml", "proj11_1.xml",
              "proj12_0.xml", "proj12_backfaceTest.xml", "proj13.xml"]
    heldout = "proj12_metals.xml"  # NEVER trained on — the PSNR report scene
    ref = "/root/reference/BHRayTracer/Resource/Data"

    if args.render_scene:
        pack, cam = load_scene(os.path.join(ref, args.render_scene),
                               resource_root=assets)
        cam.width = cam.height = args.res
        cfg = RenderConfig(spp=1, gi_bounces=2, extra_refr_levels=1,
                           tir_bounces=8, chunk_rays=args.res * args.res,
                           texture_sample_count=1)
        spps = [int(x) for x in args.noisy_spp.split(",")]
        ns, cs = [], []
        for j, sv in enumerate(spps):
            n, c = DN.render_training_pairs(
                pack, cam, cfg, n_pairs=args.pairs_per_scene, noisy_spp=sv,
                clean_spp=args.clean_spp, seed=args.seed + 100 * j,
                with_aux=True)
            ns.append(n); cs.append(c)
        with open(args.render_out, "wb") as f:
            np.savez(f, noisy=np.concatenate(ns), clean=np.concatenate(cs))
        return

    import warnings

    warnings.simplefilter("ignore")

    # Each scene's pairs render in a FRESH subprocess: accumulated XLA:CPU
    # compiles in one process exhaust mmap sections (LLVM "Unable to
    # allocate section memory" with most of RAM free) — same disease the
    # test suite's fresh-process module groups guard against.
    import subprocess
    import tempfile

    noisy_l, clean_l = [], []
    for sx in scenes:
        path = os.path.join(ref, sx)
        if not os.path.exists(path):
            continue
        with tempfile.NamedTemporaryFile(suffix=".npz") as tf:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpu",
                 "--render-scene", sx, "--render-out", tf.name,
                 "--res", str(args.res), "--clean-spp", str(args.clean_spp),
                 "--pairs-per-scene", str(args.pairs_per_scene),
                 "--noisy-spp", args.noisy_spp, "--seed", "17"],
                check=True)
            data = np.load(tf.name)
            n, c = data["noisy"], data["clean"]
        noisy_l.append(n)
        clean_l.append(c)
        print(f"{sx}: pairs {n.shape} noisy-mse "
              f"{np.mean((n[..., :3] - c) ** 2):.5f}", flush=True)

    noisy = np.concatenate(noisy_l)
    clean = np.concatenate(clean_l)

    # 8x dihedral augmentation (flips + rotations; square crops).
    def augment(x):
        outs = []
        for k in range(4):
            r = np.rot90(x, k, axes=(1, 2))
            outs += [r, r[:, :, ::-1]]
        return np.concatenate(outs)

    noisy, clean = augment(noisy), augment(clean)
    print(f"training set (augmented): {noisy.shape}", flush=True)

    # Per-pair loss rebalance: 1/noisy-mse, clipped — without it the
    # noisiest scene (Cornell, ~10x the others) dominates the objective
    # and the net ignores everything else (the round-5 held-out failure).
    per_mse = np.mean((noisy[..., :3] - clean) ** 2, axis=(1, 2, 3))
    w = 1.0 / np.clip(per_mse, 1e-4, None)
    w = (w / w.mean()).astype(np.float32)

    feats = tuple(int(f) for f in args.features.split(","))
    model, params = DN.init_denoiser(jax.random.PRNGKey(0), aux_channels=6,
                                     size=args.res, features=feats)
    params, losses = DN.train_denoiser(model, params, noisy, clean,
                                       steps=args.steps, batch=8, weights=w)
    print(f"loss {losses[0]:.5f} -> {np.mean(losses[-20:]):.5f}", flush=True)

    base = float(np.mean((noisy[..., :3] - clean) ** 2))
    out = args.out or os.path.join(repo, "bhraytracer_tpu", "models",
                                   DN._PRETRAINED)
    DN.save_weights(params, out, aux_channels=6, features=feats)
    m2, p2 = DN.load_weights(out)
    import jax.numpy as jnp

    pred = np.stack([np.asarray(DN.denoise(m2, p2, jnp.asarray(x[..., :3]),
                                           aux=jnp.asarray(x[..., 3:])))
                     for x in noisy])
    mse = float(np.mean((pred - clean) ** 2))
    print(f"saved {out}: train denoised-mse {mse:.5f} vs noisy-mse "
          f"{base:.5f} ({base / max(mse, 1e-12):.2f}x reduction)", flush=True)

    # Held-out PSNR report (the VERDICT quality bar: >= +3 dB at spp2 on a
    # scene NOT in the training set).
    ho_path = os.path.join(ref, heldout)
    if os.path.exists(ho_path):
        with tempfile.NamedTemporaryFile(suffix=".npz") as tf:
            subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--cpu",
                 "--render-scene", heldout, "--render-out", tf.name,
                 "--res", str(args.res), "--clean-spp", str(args.clean_spp),
                 "--pairs-per-scene", "2", "--seed", "31"],
                check=True)
            data = np.load(tf.name)
            hn, hc = data["noisy"], data["clean"]

        def psnr(a, b):
            return -10.0 * np.log10(max(float(np.mean((a - b) ** 2)), 1e-12))

        hp = np.stack([np.asarray(DN.denoise(m2, p2, jnp.asarray(x[..., :3]),
                                             aux=jnp.asarray(x[..., 3:])))
                       for x in hn])
        p_in = psnr(hn[..., :3], hc)
        p_dn = psnr(hp, hc)
        print(f"HELD-OUT {heldout}: noisy {p_in:.2f} dB -> denoised "
              f"{p_dn:.2f} dB (gain {p_dn - p_in:+.2f} dB)", flush=True)


if __name__ == "__main__":
    main()
