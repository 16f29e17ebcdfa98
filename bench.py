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

    from __graft_entry__ import _tiny_scene
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import _render_chunk
    from bhraytracer_tpu.ops.camera import from_scene_camera

    pack, cam = _tiny_scene()
    cam.width, cam.height = 800, 600
    cfg = RenderConfig(
        spp=1,
        gi_bounces=3,
        extra_refr_levels=2,
        tir_bounces=16,
        chunk_rays=16384,
        texture_sample_count=1,
    )
    cam_p = from_scene_camera(cam)

    n = cfg.chunk_rays
    idx = np.arange(n)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)

    fn = jax.jit(
        lambda pk, cm, x, y, k: _render_chunk(pk, cfg, cm, cam.width, cam.height, x, y, k)
    )
    key = jax.random.PRNGKey(0)
    fn(pack, cam_p, px, py, key).block_until_ready()  # compile

    iters = 10
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(pack, cam_p, px, py, jax.random.fold_in(key, i))
    out.block_until_ready()
    dt = time.perf_counter() - t0

    # Segments per camera lane: per tree level, each task lane issues one
    # closest-hit and one shadow query (refraction-chain iterations add more;
    # not counted — conservative).
    lanes_per_camera_ray = sum(cfg.level_width(l) for l in range(cfg.max_levels))
    segments = n * iters * lanes_per_camera_ray * 2
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
