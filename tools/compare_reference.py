"""Compare our render of a bundled reference scene against the reference's
OWN golden PNG (Resource/Result/*.png), region by region.

The reference repo ships goldens but none of its .obj mesh assets, so
mesh-covered pixels can never match; this tool (and the parity test built on
it, tests/test_reference_parity.py) compares rectangular regions chosen to
contain only analytic geometry (planes, spheres, textures, shadows) and
reports per-region statistics.

Usage:
    python tools/compare_reference.py proj10 proj10_noAA [--spp 1] [--out x.png]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
REF = "/root/reference/BHRayTracer"

# (name, x0, x1, y0, y1) in golden-image pixel coords, regions free of mesh
# geometry, mesh shadows, and mesh reflections (picked by inspection).
REGIONS = {
    "proj10": [
        ("wall_top_right", 640, 800, 0, 70),
        ("wall_top_left", 0, 60, 0, 100),
        ("floor_bottom_left", 0, 110, 500, 600),
        ("floor_bottom_right", 700, 800, 545, 600),
        ("sphere_big_top", 430, 560, 120, 200),
    ],
    "proj9": [
        ("ground_top_left", 0, 120, 0, 60),
        ("ground_right", 700, 800, 300, 420),
        ("ground_bottom_right", 650, 800, 540, 600),
    ],
    "proj12_backfaceTest": [
        ("left_red_wall", 10, 120, 200, 330),
        ("right_blue_wall", 680, 790, 200, 330),
        ("back_wall_mid", 300, 500, 120, 220),
        ("ceiling_light", 300, 500, 10, 60),
    ],
}


def region_stats(ours_u8, golden_u8, regions):
    rows = []
    for name, x0, x1, y0, y1 in regions:
        a = ours_u8[y0:y1, x0:x1].astype(np.float64)
        b = golden_u8[y0:y1, x0:x1, :3].astype(np.float64)
        d = a - b
        rows.append({
            "region": name,
            "mean_ours": a.mean(axis=(0, 1)).round(1).tolist(),
            "mean_gold": b.mean(axis=(0, 1)).round(1).tolist(),
            "mean_abs_diff": float(np.abs(d).mean()),
            "mean_signed_diff": float(d.mean()),
            "p95_abs_diff": float(np.percentile(np.abs(d), 95)),
            "frac_gt16": float((np.abs(d) > 16).mean()),
        })
    return rows


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("golden")
    ap.add_argument("--spp", type=int, default=1)
    ap.add_argument("--gi", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--out", default=None)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import image_to_u8, render_image
    from bhraytracer_tpu.scene.xml_loader import load_scene
    from bhraytracer_tpu.utils.cache import enable_compilation_cache
    from bhraytracer_tpu.utils.png import read_png, write_png

    enable_compilation_cache()
    pack, cam = load_scene(
        os.path.join(REF, "Resource", "Data", f"{args.scene}.xml"),
        resource_root=REF,
    )
    cfg = RenderConfig(spp=args.spp, gi_bounces=args.gi, chunk_rays=args.chunk)
    img = image_to_u8(render_image(pack, cam, cfg, seed=7))
    if args.out:
        write_png(args.out, img)
        print(f"wrote {args.out}")

    golden = read_png(os.path.join(REF, "Resource", "Result", f"{args.golden}.png"))
    assert golden.shape[:2] == img.shape[:2], (golden.shape, img.shape)
    for row in region_stats(img, golden, REGIONS[args.scene]):
        print(row)


if __name__ == "__main__":
    main()
