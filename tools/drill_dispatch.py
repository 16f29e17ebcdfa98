"""Drill the per-chunk dispatch cost on the tunneled TPU: which host-side
operation makes a distinct-chunk render ~17x slower than the same stage
sequence re-submitted on one chunk (drill_headline (a) 6.5ms vs (c) 110ms)?

Suspects, timed in isolation and in the full chunk sequence:
  (1) host->device scalar creation (jnp.int32(v)) per chunk
  (2) eager fold_in on a device key
  (3) device-array slicing (starts_d[i]) as the scalar source
  (4) the (c) leg re-run with device-sliced scalars (zero per-chunk
      host->device transfers)
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

    import bench as B
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_chunk_staged_at
    from bhraytracer_tpu.ops.camera import from_scene_camera

    # (1) fresh scalar constants
    x = jnp.int32(0)
    jax.block_until_ready(x)
    t0 = time.perf_counter()
    xs = [jnp.int32(i) for i in range(20)]
    jax.block_until_ready(xs)
    print(f"(1) 20x jnp.int32(): {(time.perf_counter()-t0)*50:.2f} ms each",
          flush=True)

    # (2) eager fold_in
    key = jax.random.PRNGKey(0)
    jax.block_until_ready(jax.random.fold_in(key, 0))
    t0 = time.perf_counter()
    ks = [jax.random.fold_in(key, i) for i in range(20)]
    jax.block_until_ready(ks)
    print(f"(2) 20x fold_in: {(time.perf_counter()-t0)*50:.2f} ms each",
          flush=True)

    # (3) device-array slice
    starts_d = jnp.arange(64, dtype=jnp.int32) * 65536
    jax.block_until_ready(starts_d[0])
    t0 = time.perf_counter()
    ss = [starts_d[i] for i in range(20)]
    jax.block_until_ready(ss)
    print(f"(3) 20x device slice: {(time.perf_counter()-t0)*50:.2f} ms each",
          flush=True)

    # (4) full chunk sequence with device-sliced scalars
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
    total = 800 * 600
    n_chunks = -(-total // n)
    starts_d = jnp.arange(n_chunks, dtype=jnp.int32) * n
    samples_d = jnp.arange(16, dtype=jnp.int32)

    def run_at(start_dev, s_dev):
        acc = jnp.zeros((n, 3))
        zb = jnp.full((n,), 1e30)
        return render_chunk_staged_at(pack, cfg, cam_p, 800, 600, n,
                                      start_dev, key, s_dev,
                                      None, acc, zb, True)

    jax.block_until_ready(run_at(starts_d[0], samples_d[0]))
    t0 = time.perf_counter()
    outs = []
    for s in range(3):
        for c in range(n_chunks):
            outs.append(run_at(starts_d[c], samples_d[s + 1]))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    segs = sum(int(o[2].segments) for o in outs)
    print(f"(4) {len(outs)} distinct chunks, device-sliced scalars: "
          f"{dt/len(outs)*1e3:.1f} ms/chunk -> {segs/dt/1e6:.2f}M segs/s",
          flush=True)

    # (5) same thing but python-int scalars (the r3 render_image path)
    t0 = time.perf_counter()
    outs = []
    for s in range(3):
        for c in range(n_chunks):
            outs.append(run_at(jnp.int32(c * n), jnp.int32(s + 10)))
    jax.block_until_ready(outs)
    dt = time.perf_counter() - t0
    segs = sum(int(o[2].segments) for o in outs)
    print(f"(5) {len(outs)} distinct chunks, fresh jnp.int32 scalars: "
          f"{dt/len(outs)*1e3:.1f} ms/chunk -> {segs/dt/1e6:.2f}M segs/s",
          flush=True)


if __name__ == "__main__":
    main()
