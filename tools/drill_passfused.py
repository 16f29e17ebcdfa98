"""Bound the tunnel's per-execute/per-fetch overhead: render a whole
800x600 pass as ONE program (lax.scan over the 8 chunk starts inside the
fused chunk body) vs the per-chunk dispatch style bench.py uses.

If the scan version lands near the microbench slope prediction
(~2-25 ms/chunk of true device compute) while per-chunk dispatch pays
~105 ms/chunk, the render rate is set by per-execute + per-fetch tunnel
overhead, and the fix is whole-pass programs — not faster kernels.

Usage: python tools/drill_passfused.py [--passes 3] [--chunk 65536]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--chunk", type=int, default=65536)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as B
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models import pathtracer as PT
    from bhraytracer_tpu.ops import trace as T
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.ops.pallas_shade import probe_shade_kernel

    pack, cam = B._bench_scene()
    cam.width, cam.height = 800, 600
    cfg = RenderConfig(spp=1, gi_bounces=3, extra_refr_levels=2,
                       tir_bounces=16, chunk_rays=args.chunk,
                       texture_sample_count=1, refr_capacity=0.08)
    cam_p = from_scene_camera(cam)
    n = args.chunk
    total = 800 * 600
    n_chunks = -(-total // n)
    key = jax.random.PRNGKey(0)
    if jax.default_backend() == "tpu":
        T.probe_trace_kernels(pack)
        probe_shade_kernel(pack, cfg)
    np.asarray(jnp.zeros((1,)) + 1)  # eager mode

    st0 = jnp.zeros((4,), jnp.int32)

    @jax.jit
    def render_pass(sample):
        acc0 = jnp.zeros((n, 3))
        zb0 = jnp.full((n,), 1e30)

        def body(st, start):
            acc, zb, st2 = PT._chunk_fused_at(
                pack, cfg, cam_p, 800, 600, n, start, key, sample,
                acc0, zb0, True, st, want_aux=False)
            return st2, (jnp.sum(acc), jnp.max(zb))
        starts = jnp.arange(n_chunks, dtype=jnp.int32) * n
        st, (sums, _) = jax.lax.scan(body, st0, starts)
        return st, jnp.sum(sums)

    samples_d = jnp.arange(args.passes + 4, dtype=jnp.int32)
    st, s = render_pass(samples_d[0])
    np.asarray(st)  # compile + fetch barrier
    t0 = time.perf_counter()
    outs = [render_pass(samples_d[1 + p]) for p in range(args.passes)]
    sts = [np.asarray(o[0]) for o in outs]
    dt = time.perf_counter() - t0
    segs = sum(int(x[3]) for x in sts)
    per_chunk = dt / (args.passes * n_chunks) * 1e3
    print(f"whole-pass scan: {segs / dt / 1e6:7.2f}M segs/s  "
          f"{per_chunk:7.2f} ms/chunk  ({dt / args.passes * 1e3:.1f} ms/pass,"
          f" drops/pass {sum(int(x[:3].sum()) for x in sts) / args.passes:.0f})",
          flush=True)


if __name__ == "__main__":
    main()
