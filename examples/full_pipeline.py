"""Full-pipeline demo (BASELINE config 4): Monte-Carlo GI with an area point
light, caustic photon map, and the learned denoiser head, end to end.

    python examples/full_pipeline.py [--out /tmp/full_pipeline] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scene():
    import numpy as np

    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene

    sd = D.SceneDesc()
    floor = D.MaterialDesc(name="floor")
    floor.diffuse = D.TexturedColorDesc(color=np.array([0.75, 0.75, 0.75]))
    floor.specular = D.TexturedColorDesc(color=np.zeros(3))
    red = D.MaterialDesc(name="red")
    red.diffuse = D.TexturedColorDesc(color=np.array([0.8, 0.25, 0.2]))
    red.specular = D.TexturedColorDesc(color=np.array([0.3, 0.3, 0.3]))
    red.glossiness = 30.0
    glass = D.MaterialDesc(name="glass")
    glass.diffuse = D.TexturedColorDesc(color=np.zeros(3))
    glass.specular = D.TexturedColorDesc(color=np.zeros(3))
    glass.refraction = D.TexturedColorDesc(color=np.array([0.95, 0.95, 0.95]))
    glass.ior = 1.5
    sd.materials += [floor, red, glass]

    t = D.Transform()
    t.scale(25.0, 25.0, 25.0)
    sd.nodes.append(D.NodeDesc(kind="plane", name="floor", transform=t, material=0))
    t2 = D.Transform()
    t2.translate(np.array([0.0, 0.0, 3.0]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="ball", transform=t2, material=2))
    t3 = D.Transform()
    t3.scale(1.2, 1.2, 1.2)
    t3.translate(np.array([-3.5, 2.0, 1.2]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="red", transform=t3, material=1))
    # Area point light ("size" -> soft shadows + photon emission weighting).
    sd.lights.append(
        D.LightDesc(kind="point", intensity=np.full(3, 40.0),
                    position=np.array([0.0, 0.0, 9.0]), size=1.5)
    )
    sd.background = D.TexturedColorDesc(color=np.array([0.05, 0.06, 0.1]))
    sd.environment = D.TexturedColorDesc(color=np.array([0.15, 0.15, 0.2]))

    cam = D.Camera()
    cam.pos = np.array([0.0, -11.0, 6.0])
    d = np.array([0.0, 11.0, -5.0])
    cam.dir = d / np.linalg.norm(d)
    x = np.cross(cam.dir, np.array([0.0, 0.0, 1.0]))
    up = np.cross(x, cam.dir)
    cam.up = up / np.linalg.norm(up)
    cam.width, cam.height = 200, 150
    return compile_scene(sd), cam


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/full_pipeline")
    ap.add_argument("--spp", type=int, default=8)
    ap.add_argument("--photons", type=int, default=1 << 15)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import warnings

    warnings.filterwarnings("ignore")
    import time

    import numpy as np

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.denoiser import (
        init_denoiser,
        render_training_pairs,
        train_denoiser,
    )
    from bhraytracer_tpu.models.pathtracer import image_to_u8, render_image
    from bhraytracer_tpu.models.photonmap import build_photon_map
    from bhraytracer_tpu.utils.png import write_png

    os.makedirs(args.out, exist_ok=True)
    pack, cam = build_scene()
    cfg = RenderConfig(
        spp=args.spp, gi_bounces=2, extra_refr_levels=1, chunk_rays=8192,
        texture_sample_count=1, photon_count=args.photons, use_photon_map=True,
    )

    t0 = time.time()
    pmap = build_photon_map(pack, cfg, seed=0, caustic=True)
    print(f"caustic photon map: {int(pmap.pos.shape[0])} photons "
          f"({time.time()-t0:.1f}s)")

    t0 = time.time()
    img = render_image(pack, cam, cfg, seed=0, photon_map=pmap)
    print(f"GI + caustics render: {time.time()-t0:.1f}s")
    write_png(os.path.join(args.out, "render.png"), image_to_u8(img))

    # Self-supervised denoiser pass.
    small = dataclasses.replace(cfg, use_photon_map=False)
    noisy, clean = render_training_pairs(pack, cam, small, n_pairs=2,
                                         noisy_spp=1, clean_spp=16, seed=9)
    model, params = init_denoiser(jax.random.PRNGKey(0))
    params, losses = train_denoiser(model, params, noisy, clean, steps=150)
    print(f"denoiser trained: loss {losses[0]:.5f} -> {losses[-1]:.5f}")

    cfg_dn = dataclasses.replace(cfg, use_denoiser=True)
    img_dn = render_image(pack, cam, cfg_dn, seed=0, photon_map=pmap,
                          denoiser=(model, params))
    write_png(os.path.join(args.out, "render_denoised.png"), image_to_u8(img_dn))
    print(f"wrote {args.out}/render.png and render_denoised.png")


if __name__ == "__main__":
    main()
