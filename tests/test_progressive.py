"""Progressive preview (--progressive): K passes over the sample budget.

The headless stand-in for the reference viewport's live in-progress view
(viewport.cpp:354-366): each pass rewrites the PNG with the running mean,
and sample_offset keeps the union of the passes' RNG streams identical to a
single-pass render — the final image converges to the non-progressive one.
"""

import numpy as np

from bhraytracer_tpu.cli import main
from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import render_image
from bhraytracer_tpu.scene.xml_loader import load_scene
from bhraytracer_tpu.utils.png import read_png
from tests.test_render import simple_scene  # noqa: F401 (fixture)


def test_sample_offset_partitions_stream(simple_scene):  # noqa: F811
    """Two half-budget renders at offsets 0 and 2 average to the full one."""
    pack, cam = load_scene(simple_scene)
    cfg = RenderConfig(spp=4, gi_bounces=1, extra_refr_levels=0,
                       chunk_rays=2048, texture_sample_count=1,
                       use_gamma=False)
    full = render_image(pack, cam, cfg, seed=0)
    import dataclasses

    half_cfg = dataclasses.replace(cfg, spp=2)
    a = render_image(pack, cam, half_cfg, seed=0, sample_offset=0)
    b = render_image(pack, cam, half_cfg, seed=0, sample_offset=2)
    np.testing.assert_allclose((a + b) / 2.0, full, rtol=1e-6, atol=1e-7)


def test_cli_progressive_matches_single_pass(simple_scene, tmp_path):  # noqa: F811
    out_prog = str(tmp_path / "prog.png")
    out_single = str(tmp_path / "single.png")
    base = [
        "render", simple_scene, "--cpu", "--spp", "4", "--gi-bounces", "1",
        "--extra-refr-levels", "0", "--chunk-rays", "2048",
        "--texture-taps", "1",
    ]
    assert main(base + ["-o", out_prog, "--progressive", "2"]) == 0
    assert main(base + ["-o", out_single]) == 0
    prog = read_png(out_prog)
    single = read_png(out_single)
    # u8 quantization after float averaging: allow off-by-one.
    assert np.abs(prog.astype(int) - single.astype(int)).max() <= 1
