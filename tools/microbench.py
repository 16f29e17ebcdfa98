"""Cache-proof per-op timing on the tunneled TPU.

Rules learned in round 3 (tools/drill_dispatch.py, sweep_variants.py):
  - block_until_ready lies before the first readback; only fetches wait.
  - Repeated calls with IDENTICAL inputs are served from the terminal's
    content-keyed replay cache — micro-timings of same-input calls are
    fiction.
  - Fetch round-trip is ~25ms; timed functions must return a SCALAR digest
    so the fetch is 4 bytes, and the no-op baseline is subtracted.

Every op here is wrapped as jit(f(i)) where the int `i` perturbs the
inputs (so each iteration is genuinely new work) and the output is a
scalar digest.

Usage: python tools/microbench.py [--n 65536] [--iters 20]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

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
                       tir_bounces=16, chunk_rays=args.n,
                       texture_sample_count=1, refr_capacity=0.08)
    cam_p = from_scene_camera(cam)
    if jax.default_backend() == "tpu":
        T.probe_trace_kernels(pack)
        probe_shade_kernel(pack, cfg)
    np.asarray(jnp.zeros((1,)) + 1)  # eager mode

    n = args.n
    key = jax.random.PRNGKey(7)
    iota = jnp.arange(args.iters + 8, dtype=jnp.int32)

    def timed(name, fn):
        """fn: jitted scalar-digest function of a single int32 tracer."""
        for w in range(2):
            float(fn(iota[w]))
        t0 = time.perf_counter()
        for i in range(args.iters):
            float(fn(iota[i + 2]))  # float() = 4-byte fetch barrier
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:38s} {max(dt - timed.base, 0.0) * 1e3:9.2f} ms",
              flush=True)
        return dt

    # no-op baseline: scalar in, scalar out
    base_fn = jax.jit(lambda i: (i * 2 + 1).astype(jnp.float32))
    for w in range(2):
        float(base_fn(iota[w]))
    t0 = time.perf_counter()
    for i in range(args.iters):
        float(base_fn(iota[i + 2]))
    timed.base = (time.perf_counter() - t0) / args.iters
    print(f"(baseline fetch round-trip: {timed.base*1e3:.2f} ms — "
          "subtracted)", flush=True)

    # fresh camera rays per i (the raygen stage itself)
    @jax.jit
    def rays_of(i):
        o, d, bg, dd_x, dd_y, ck = PT._stage_raygen_at(
            pack, cfg, cam_p, 800, 600, n, i * 0, key, i)
        return o, d, ck

    o0, d0, _ = rays_of(iota[0])

    timed("raygen (stage)", jax.jit(
        lambda i: rays_of(i)[0].sum()))

    # trace_closest, kernel auto (packet pallas on TPU)
    def mk_trace(reorder):
        @jax.jit
        def f(i):
            o, d, _ = rays_of(i)
            return T.trace_closest(pack, o, d, "front",
                                   reorder=reorder).t.sum()
        return f

    timed("trace_closest coherent (pallas)", mk_trace(False))
    timed("trace_closest +reorder sort", mk_trace(True))
    T.set_pallas_mode("off")
    timed("trace_closest coherent (XLA)", mk_trace(False))
    T.set_pallas_mode("auto")

    # incoherent rays: post-GI style directions
    @jax.jit
    def rays_inc(i):
        o, d, ck = rays_of(i)
        u = jax.random.uniform(ck, (n, 3))
        d2 = u * 2.0 - 1.0
        return o + d * 5.0, d2

    def mk_trace_inc(reorder):
        @jax.jit
        def f(i):
            o, d = rays_inc(i)
            return T.trace_closest(pack, o, d, "front",
                                   reorder=reorder).t.sum()
        return f

    timed("trace_closest incoherent+reorder", mk_trace_inc(True))
    T.set_divergent_mode("on")
    timed("trace_closest incoherent divergent", mk_trace_inc(True))
    T.set_divergent_mode("off")

    # shadow trace
    @jax.jit
    def shadow(i):
        o, d, _ = rays_of(i)
        return T.trace_shadow(pack, o + d * 2.0,
                              pack.light_vec[0][None] - o,
                              1.0, cfg.shadow_bias).sum()

    timed("trace_shadow", shadow)

    # full shade level 0 (digest every output)
    def mk_level(use_shade_kernel):
        @jax.jit
        def f(i):
            o, d, ck = rays_of(i)
            rec, tasks, surf = PT._shade_entry(pack, cfg, o, d, ck,
                                               jnp.zeros(3), jnp.zeros(3))
            return (rec.direct.sum() + tasks.o.sum() + rec.z.sum()
                    + rec.segs.astype(jnp.float32))
        return f

    timed("shade_level 0 FULL", mk_level(True))
    from bhraytracer_tpu.ops import pallas_shade as PS
    PS.set_shade_kernel("off")
    timed("shade_level 0 FULL (no shade krn)", mk_level(False))
    PS.set_shade_kernel("auto")

    # refraction chain in isolation at the bench capacity width
    k_cap = cfg.refr_cap(n)

    @jax.jit
    def chain(i):
        o, d, ck = rays_of(i)
        hit = T.trace_closest(pack, o, d, "front")
        from bhraytracer_tpu.ops.trace import resolve_hit
        surf = resolve_hit(pack, o, d, hit, jnp.zeros(3), jnp.zeros(3),
                           minimal=True, fast_rows=True)
        mtl = PT._fetch_mtl(pack, surf.mtl)
        sel = jnp.argsort(~(hit.hit & (jnp.sum(mtl.refraction, 1) > 0)),
                          stable=True)[:k_cap]
        g = lambda x: x[sel]
        surf_k = PT.Surface(*[g(f_) for f_ in surf])
        mtl_k = PT.Mtl(*[g(f_) for f_ in mtl])
        vv = -d / jnp.linalg.norm(d, axis=1, keepdims=True)
        cos1 = jnp.clip(jnp.sum(g(surf.n) * g(vv), 1), 0.0, 1.0)
        case, ro, rd, bl, drop, segs = PT._refraction_chain(
            pack, cfg, surf_k, mtl_k, surf_k.n, g(vv), cos1,
            mtl_k.refraction, g(hit.hit), jnp.full((k_cap,), 16), ck)
        return ro.sum() + rd.sum() + segs.astype(jnp.float32)

    timed(f"refraction_chain (K={k_cap})", chain)


if __name__ == "__main__":
    main()
