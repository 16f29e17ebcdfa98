"""Golden-image regression: low-res fixed-seed renders of bundled reference
scenes, compared byte-near against committed goldens (the executable version
of the reference's golden-image-by-eye methodology, SURVEY §4).

Regenerate (after intentional image-affecting changes):
    python -c "see tests/golden/README in git log"  — or re-run the
    generation snippet in this file's docstring history and review diffs.
"""

import os

import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import image_to_u8, render_image
from bhraytracer_tpu.scene.xml_loader import load_scene
from bhraytracer_tpu.utils.png import read_png

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "golden")
CFG = RenderConfig(spp=2, gi_bounces=1, extra_refr_levels=1, tir_bounces=4,
                   chunk_rays=4096, texture_sample_count=4)


@pytest.mark.parametrize("name", ["proj2", "proj10", "proj12_backfaceTest"])
def test_golden_render(reference_dir, name):
    pack, cam = load_scene(
        os.path.join(reference_dir, "Resource", "Data", f"{name}.xml"),
        resource_root=reference_dir,
    )
    cam.width, cam.height = 80, 60
    img = image_to_u8(render_image(pack, cam, CFG, seed=42))
    golden = read_png(os.path.join(GOLDEN_DIR, f"{name}.png"))
    # Deterministic renderer: same seed + backend must reproduce the golden
    # almost exactly (tiny slack for cross-CPU libm differences).
    diff = np.abs(img.astype(int) - golden.astype(int))
    assert diff.mean() < 1.0, (name, diff.mean(), diff.max())
    assert (diff > 8).mean() < 0.005, (name, (diff > 8).mean())
