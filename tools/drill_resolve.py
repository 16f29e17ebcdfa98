"""Decompose resolve_hit cost on the current device: minimal vs full, and
per-geometry-branch variants, on level-2 headline rays (the dominant lane
population after the refraction-capacity shrink)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=20, warmup=2):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--level", type=int, default=2)
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import dataclasses

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import bench as B
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models import pathtracer as PT
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.ops.trace import resolve_hit, trace_closest

    pack, cam = B._bench_scene()
    cam.width, cam.height = 800, 600
    cfg = RenderConfig(spp=1, gi_bounces=3, extra_refr_levels=2,
                       tir_bounces=16, chunk_rays=args.n,
                       texture_sample_count=1)
    cam_p = from_scene_camera(cam)
    n = args.n
    idx = np.arange(n)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)
    key = jax.random.PRNGKey(0)
    o, d, bg, dd_x, dd_y = PT._stage_raygen_jit(pack, cfg, cam_p, cam.width,
                                                cam.height, px, py, key)
    tasks = PT.Tasks(o=o, d=d, active=jnp.ones((n,), bool),
                     bounce=jnp.full((n,), cfg.tir_bounces, jnp.int32))
    for lvl in range(args.level):
        _, tasks, _ = PT._shade_level_jit(
            pack, cfg, tasks, lvl, jax.random.fold_in(key, 100 + lvl),
            dd_x, dd_y, None)
    print(f"device={jax.devices()[0].platform} lanes={tasks.o.shape[0]} "
          f"active={int(jnp.sum(tasks.active))} n_texmaps={pack.n_texmaps}",
          flush=True)
    hit = jax.jit(lambda o_, d_: trace_closest(pack, o_, d_, "front"))(
        tasks.o, tasks.d)

    def rep(name, dt):
        print(f"{name:34s} {dt * 1e3:9.3f} ms", flush=True)

    rep("resolve_hit FULL", timeit(jax.jit(
        lambda o_, d_, h: resolve_hit(pack, o_, d_, h, dd_x, dd_y)),
        tasks.o, tasks.d, hit))
    rep("resolve_hit minimal", timeit(jax.jit(
        lambda o_, d_, h: resolve_hit(pack, o_, d_, h, dd_x, dd_y,
                                      minimal=True)),
        tasks.o, tasks.d, hit))

    # Per-branch: zero out other geometry counts so branches are skipped.
    for keep in ("sph", "pln", "msh"):
        kw = {f"n_{k}": (getattr(pack, f"n_{k}") if k == keep else 0)
              for k in ("sph", "pln", "msh")}
        pk = dataclasses.replace(pack, **kw)
        rep(f"resolve_hit {keep}-only", timeit(jax.jit(
            lambda o_, d_, h, pk=pk: resolve_hit(pk, o_, d_, h, dd_x, dd_y)),
            tasks.o, tasks.d, hit))


if __name__ == "__main__":
    main()
