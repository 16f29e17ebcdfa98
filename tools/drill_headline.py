"""Drill the headline-vs-full discrepancy: time the SAME compiled chunk
render in the two styles bench.py uses and print honest per-chunk walls
and segment counts.

(a) headline style: 10 iterations of chunk 0 (same px/py arrays, new key)
(b) full-image style: the 8 distinct chunks of 800x600 (fresh np px/py)

If (a) and (b) disagree on per-chunk wall, the headline number is an
artifact; if they agree, the segment counts explain everything.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as B
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_chunk_staged
    from bhraytracer_tpu.ops.camera import from_scene_camera

    pack, cam = B._bench_scene()
    cam.width, cam.height = 800, 600
    cfg = RenderConfig(spp=1, gi_bounces=3, extra_refr_levels=2,
                       tir_bounces=16, chunk_rays=65536,
                       texture_sample_count=1, refr_capacity=0.08)
    cam_p = from_scene_camera(cam)

    if jax.default_backend() == "tpu":
        from bhraytracer_tpu.ops.pallas_shade import probe_shade_kernel
        from bhraytracer_tpu.ops.trace import probe_trace_kernels

        probe_trace_kernels(pack)
        probe_shade_kernel(pack, cfg)

    n = cfg.chunk_rays
    key = jax.random.PRNGKey(0)

    def chunk_idx(start):
        return np.minimum(np.arange(start, start + n), 800 * 600 - 1)

    def run(px, py, i):
        acc = jnp.zeros((n, 3))
        zb = jnp.full((n,), 1e30)
        return render_chunk_staged(pack, cfg, cam_p, 800, 600, px, py,
                                   jax.random.fold_in(key, i), None,
                                   acc, zb, True)

    idx0 = chunk_idx(0)
    px0 = jnp.asarray(idx0 % 800, jnp.int32)
    py0 = jnp.asarray(idx0 // 800, jnp.int32)
    jax.block_until_ready(run(px0, py0, 0))

    # (a) headline style
    t0 = time.perf_counter()
    outs = [run(px0, py0, i + 1) for i in range(10)]
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    segs = [int(o[2].segments) for o in outs]
    print(f"(a) same-chunk x10: {dt*100:.1f} ms/chunk, segs/chunk "
          f"{segs[0]} (all: {sorted(set(segs))}) -> "
          f"{sum(segs)/dt/1e6:.2f}M segs/s", flush=True)

    # (a2) blocking each iteration
    t0 = time.perf_counter()
    per = []
    segs2 = []
    for i in range(10):
        t1 = time.perf_counter()
        o = run(px0, py0, i + 1)
        jax.block_until_ready(o)
        per.append(time.perf_counter() - t1)
        segs2.append(int(o[2].segments))
    dt2 = time.perf_counter() - t0
    print(f"(a2) same-chunk x10 BLOCKING: per-chunk "
          f"{[round(p*1e3) for p in per]} ms, segs {segs2[0]} -> "
          f"{sum(segs2)/dt2/1e6:.2f}M segs/s", flush=True)

    # (b) full-image style over the 8 chunks of 800x600
    t0 = time.perf_counter()
    outs = []
    for start in range(0, 800 * 600, n):
        idx = chunk_idx(start)
        px = jnp.asarray(idx % 800, jnp.int32)
        py = jnp.asarray(idx // 800, jnp.int32)
        outs.append(run(px, py, start))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    segs = [int(o[2].segments) for o in outs]
    print(f"(b) 8 distinct chunks: {dt/8*1e3:.1f} ms/chunk, segs "
          f"{segs} -> {sum(segs)/dt/1e6:.2f}M segs/s", flush=True)

    # (c) full-image style with DEVICE-SIDE lane-index generation (the r3
    # render_image path: no px/py uploads, keys folded in-jit). If (c)
    # matches (a), the round-2 gap was pure host->device upload cost.
    from bhraytracer_tpu.models.pathtracer import render_chunk_staged_at

    def run_at(start, s):
        acc = jnp.zeros((n, 3))
        zb = jnp.full((n,), 1e30)
        return render_chunk_staged_at(pack, cfg, cam_p, 800, 600, n,
                                      jnp.int32(start), key, jnp.int32(s),
                                      None, acc, zb, True)

    jax.block_until_ready(run_at(0, 0))  # compile raygen_at
    t0 = time.perf_counter()
    outs = []
    for s in range(3):
        for start in range(0, 800 * 600, n):
            outs.append(run_at(start, s + 1))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    segs = [int(o[2].segments) for o in outs]
    print(f"(c) 8 distinct chunks x3, device-side raygen: "
          f"{dt/len(segs)*1e3:.1f} ms/chunk -> "
          f"{sum(segs)/dt/1e6:.2f}M segs/s", flush=True)


if __name__ == "__main__":
    main()
