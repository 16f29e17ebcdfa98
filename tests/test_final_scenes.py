"""The fixture ladder's tail: proj13 (photon scene), proj14 (BHRTFinal,
10 mesh instances through the unified world BVH), proj15 (TestRoom).

Reference meshes are absent from the checkout, so these render with the
generated stand-ins (tools/gen_assets.py) — the assertion is that every
bundled final scene loads, compiles, and renders finite non-trivial images
end-to-end (SURVEY §4: proj14 is the 22-object stress scene family)."""

import os
import warnings

import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import render_image
from bhraytracer_tpu.scene.xml_loader import load_scene

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

SCENES = [
    ("Resource/Data/proj13.xml", 1, 0.05),
    ("Resource/BHRTFinal/proj14.xml", 10, 0.05),
    ("Resource/TestRoom/proj15.xml", 4, 1e-4),  # enclosed room, one light
]


@pytest.fixture
def assets(gen_assets_root):
    return gen_assets_root


@pytest.mark.parametrize("rel,min_meshes,min_mean", SCENES,
                         ids=[s[0].split("/")[-1] for s in SCENES])
def test_final_scene_renders(reference_dir, assets, rel, min_meshes, min_mean):
    scene = os.path.join(reference_dir, rel)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pack, cam = load_scene(scene, resource_root=assets)
    assert pack.n_msh >= min_meshes
    cam.width, cam.height = 64, 48
    cfg = RenderConfig(spp=1, gi_bounces=1, extra_refr_levels=0,
                       chunk_rays=3072, texture_sample_count=1)
    img = render_image(pack, cam, cfg, seed=0)
    assert np.isfinite(img).all()
    assert float(img.mean()) > min_mean  # something got lit

    # Golden pin (round-5, VERDICT weak #6): deterministic fixed-seed
    # renders against committed goldens — catches silent regressions the
    # smoke floor cannot. Goldens use the generated stand-in assets;
    # regenerate with /tmp-style snippet in git history after intentional
    # image changes.
    from bhraytracer_tpu.models.pathtracer import image_to_u8
    from bhraytracer_tpu.utils.png import read_png

    name = os.path.basename(rel).split(".")[0]
    golden_path = os.path.join(os.path.dirname(__file__), "golden",
                               f"{name}.png")
    golden = read_png(golden_path)
    diff = np.abs(image_to_u8(img).astype(int) - golden.astype(int))
    assert diff.mean() < 1.0, (name, diff.mean(), diff.max())
    assert (diff > 8).mean() < 0.005, (name, (diff > 8).mean())
