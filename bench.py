"""Benchmark: traced ray segments / second on the current default device.

Baseline: the reference CPU renderer sustains ~2-3M ray segments/s with 16
OpenMP threads (derived from wall-times encoded in its golden-image
filenames; see BASELINE.md). We count the same unit of work — one scene
intersection query (closest-hit or shadow) — across the wavefront shade
tree and report segments/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SEGMENTS_PER_SEC = 2.5e6  # reference 16-thread CPU midpoint


def main():
    import jax
    import jax.numpy as jnp

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from __graft_entry__ import _tiny_scene
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_chunk_staged
    from bhraytracer_tpu.ops.camera import from_scene_camera

    pack, cam = _tiny_scene()
    cam.width, cam.height = 800, 600
    cfg = RenderConfig(
        spp=1,
        gi_bounces=3,
        extra_refr_levels=2,
        tir_bounces=16,
        chunk_rays=65536,
        texture_sample_count=1,
    )
    cam_p = from_scene_camera(cam)

    n = cfg.chunk_rays
    idx = np.arange(n)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)

    key = jax.random.PRNGKey(0)

    def run(i):
        acc = jnp.zeros((n, 3))
        zb = jnp.full((n,), 1e30)
        return render_chunk_staged(
            pack, cfg, cam_p, cam.width, cam.height, px, py,
            jax.random.fold_in(key, i), None, acc, zb, True,
        )

    jax.block_until_ready(run(0))  # compile all stages

    iters = 10
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = run(i + 1)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    # Segments per camera lane: per tree level, each task lane issues one
    # closest-hit and one shadow query (refraction-chain iterations add more;
    # not counted — conservative).
    total_lanes = sum(cfg.level_sizes(n))
    segments = total_lanes * iters * 2
    segs_per_sec = segments / dt

    print(
        json.dumps(
            {
                "metric": "ray_segments_per_sec",
                "value": round(segs_per_sec),
                "unit": "segments/s",
                "vs_baseline": round(segs_per_sec / BASELINE_SEGMENTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
