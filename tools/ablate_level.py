"""Ablation timing of _shade_level: stub out one component at a time and
re-jit, all within one process (per-op microbenchmarks are unreliable on the
axon tunnel — variance across processes exceeds the effects being measured;
end-to-end deltas within one process are stable).

Usage: python tools/ablate_level.py [--scene headline|analytic] [--n 65536]
       [--level 2]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="headline", choices=["headline", "analytic"])
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--level", type=int, default=0)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import bench as B
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models import pathtracer as PT
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.ops import trace as TR

    if args.scene == "headline":
        pack, cam = B._bench_scene()
        cam.width, cam.height = 800, 600
    else:
        from bhraytracer_tpu.scene.compile import compile_scene

        sd = B._tiny_scene_desc()
        pack = compile_scene(sd)
        cam = sd.camera
        cam.width, cam.height = 800, 600

    cfg = RenderConfig(spp=1, gi_bounces=3, extra_refr_levels=2, tir_bounces=16,
                       chunk_rays=args.n, texture_sample_count=1)
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
    lvl = args.level
    lkey = jax.random.fold_in(key, 100 + lvl)
    n_lvl = tasks.o.shape[0]
    print(f"device={jax.devices()[0].platform} scene={args.scene} level={lvl} "
          f"lanes={n_lvl} active={int(jnp.sum(tasks.active))}", flush=True)

    orig = {n: getattr(PT, n) for n in
            ("_refraction_chain", "_direct_light", "_gi_sample",
             "_select_light", "_sample_in_light", "_illuminate")}
    orig_shadow = TR.trace_shadow
    orig_shadow_pt = PT.trace_shadow  # pathtracer binds its own reference

    def timeit(fn, iters=30):
        out = fn(tasks, lkey)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(tasks, lkey)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    def stub_chain(pack_, cfg_, surf, mtl, vn, vv, cos1, refr_eff, active, bounce, key_):
        k = surf.p.shape[0]
        return (jnp.zeros((k,), jnp.int32), surf.p, vv, bounce,
                jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))

    def stub_shadow(pack_, o_, d_, t_max, bias, plane_extent_bug=False):
        return jnp.zeros((o_.shape[0],), bool)

    def stub_direct(pack_, cfg_, surf, mtl, nsc, vn, vv, u, mask, pmap=None):
        return jnp.zeros((surf.p.shape[0], 3)), jnp.zeros((), jnp.int32)

    def stub_gi(pack_, cfg_, surf, mtl, nsc, vn, vv, u):
        k = surf.p.shape[0]
        return surf.p, vn, jnp.zeros((k, 3)), jnp.zeros((k, 3))

    def stub_select(pack_, u):
        return jnp.zeros((u.shape[0],), jnp.int32)

    def stub_sample_in_light(pack_, lidx, surf, mtl, nsc, u):
        return jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), surf.p.shape)

    def stub_illuminate(pack_, cfg_, lidx, p, u, mask):
        return jnp.ones_like(p), jnp.zeros((), jnp.int32)

    variants = [
        ("full", {}),
        ("no refr_chain", {"_refraction_chain": stub_chain}),
        ("no shadow trace", {"trace_shadow": stub_shadow}),
        ("no direct (incl shadow)", {"_direct_light": stub_direct}),
        ("no gi_sample", {"_gi_sample": stub_gi}),
        ("no direct+gi+chain", {"_refraction_chain": stub_chain,
                                "_direct_light": stub_direct,
                                "_gi_sample": stub_gi}),
        ("no select_light", {"_select_light": stub_select}),
        ("no sample_in_light", {"_sample_in_light": stub_sample_in_light}),
        ("no illuminate", {"_illuminate": stub_illuminate}),
    ]

    base = None
    for name, patches in variants:
        for n, fn_orig in orig.items():
            setattr(PT, n, patches.get(n, fn_orig))
        TR.trace_shadow = patches.get("trace_shadow", orig_shadow)
        PT.trace_shadow = patches.get("trace_shadow", orig_shadow_pt)
        fn = jax.jit(
            lambda t, k: PT._shade_level(pack, cfg, t, lvl, k, dd_x, dd_y, None),
            static_argnums=(),
        )
        dt = timeit(fn)
        if base is None:
            base = dt
        print(f"{name:28s} {dt * 1e3:9.3f} ms   delta {-(dt - base) * 1e3:+8.3f} ms",
              flush=True)

    # restore
    for n, fn_orig in orig.items():
        setattr(PT, n, fn_orig)
    TR.trace_shadow = orig_shadow
    PT.trace_shadow = orig_shadow_pt

    # isolated trace_closest for reference, same process
    tc = jax.jit(lambda o_, d_: TR.trace_closest(pack, o_, d_, "front"))
    out = tc(tasks.o, tasks.d)
    jax.block_until_ready(out)
    best = 1e9
    for _ in range(4):
        t0 = time.perf_counter()
        for _ in range(30):
            out = tc(tasks.o, tasks.d)
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / 30)
    print(f"{'trace_closest alone':28s} {best * 1e3:9.3f} ms", flush=True)


if __name__ == "__main__":
    main()
