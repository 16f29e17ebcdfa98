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
    ap.add_argument("--cpu", action="store_true",
                    help="force CPU (smoke-testing the harness itself)")
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
        """fn: jitted scalar-digest function of a single int32 tracer.
        A kernel that fails to compile on this hardware prints FAILED
        instead of killing the remaining measurements."""
        try:
            return _timed(name, fn)
        except Exception as e:
            print(f"{name:38s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)
            return None

    def _timed(name, fn):
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

    # ------------------------------------------------------------------
    # Amplified per-component timings: run the component K times inside a
    # lax.scan whose carry feeds each iteration's inputs (nothing hoists,
    # nothing replays), measure at two K values, and report the SLOPE —
    # per-iteration device cost with RTT/init/fixed overhead cancelled.
    # This is the only reading here precise enough to attribute the
    # ~100ms/chunk render cost (single-shot readings drown in the ~25ms
    # fetch round-trip).
    # ------------------------------------------------------------------
    print("--- amplified component slopes (ms per call at n="
          f"{n}) ---", flush=True)
    from functools import partial

    from bhraytracer_tpu.ops.compact import partition_indices
    from bhraytracer_tpu.ops.linalg import normalize
    from bhraytracer_tpu.ops.trace import resolve_hit

    K1, K2 = 4, 12
    amp_iters = 6

    def slope(name, make_scan):
        """make_scan(K) -> jitted scalar fn of i running the component K
        times; report (t(K2)-t(K1))/(K2-K1)."""
        try:
            fns = [make_scan(K) for K in (K1, K2)]
            ts = []
            for f in fns:
                for w in range(2):
                    float(f(iota[w]))
                t0 = time.perf_counter()
                for it in range(amp_iters):
                    float(f(iota[it + 2]))
                ts.append((time.perf_counter() - t0) / amp_iters)
            per = (ts[1] - ts[0]) / (K2 - K1)
            print(f"{name:38s} {per * 1e3:9.2f} ms/call", flush=True)
        except Exception as e:
            print(f"{name:38s} FAILED: {type(e).__name__}: {str(e)[:160]}",
                  flush=True)

    def scan_over(body, init_of):
        """Build make_scan(K) for a body(carry, k) -> carry."""
        def make(K):
            @jax.jit
            def f(i):
                c = init_of(i)
                c, _ = jax.lax.scan(lambda c_, k: (body(c_, k), None), c,
                                    jnp.arange(K, dtype=jnp.int32))
                return jax.tree.reduce(
                    lambda a, b: a + b,
                    jax.tree.map(lambda x: jnp.sum(x.astype(jnp.float32)
                                                   if x.dtype != jnp.float32
                                                   else x) * 1e-9, c))
            return f
        return make

    def rays_init(i):
        o, d, _ = rays_of(i)
        return o, d

    def perturb(o, t):
        # tiny data-dependent shift: keeps every iteration distinct and
        # chained without changing the work's character
        return o + (t[:, None] % 1.0) * 1e-12

    # trace_closest, coherent (the per-level closest-hit trace)
    slope("trace_closest (pallas, no sort)", scan_over(
        lambda c, k: (perturb(c[0], T.trace_closest(
            pack, c[0], c[1], "front").t), c[1]), rays_init))
    slope("trace_closest (+reorder sort)", scan_over(
        lambda c, k: (perturb(c[0], T.trace_closest(
            pack, c[0], c[1], "front", reorder=True).t), c[1]), rays_init))
    T.set_pallas_mode("off")
    slope("trace_closest (XLA while_loop)", scan_over(
        lambda c, k: (perturb(c[0], T.trace_closest(
            pack, c[0], c[1], "front").t), c[1]), rays_init))
    T.set_pallas_mode("auto")

    # shadow trace
    slope("trace_shadow", scan_over(
        lambda c, k: (perturb(c[0], T.trace_shadow(
            pack, c[0], c[1], 1.0, cfg.shadow_bias).astype(jnp.float32)),
            c[1]), rays_init))

    # per-level RNG table
    slope("u_tab uniform (n,13)", scan_over(
        lambda c, k: c + jnp.sum(jax.random.uniform(
            jax.random.fold_in(key, c.astype(jnp.int32) % 1000), (n, 13))),
        lambda i: i.astype(jnp.float32)))

    # resolve_hit on real level-0 hits
    def surf_state(i):
        o, d, _ = rays_of(i)
        hit = T.trace_closest(pack, o, d, "front")
        return o, d, hit

    def resolve_body(c, k):
        o, d, hit = c
        surf = resolve_hit(pack, o, d, hit, jnp.zeros(3), jnp.zeros(3),
                           fast_rows=True)
        return perturb(o, surf.z), d, hit

    slope("resolve_hit (fast_rows)", scan_over(resolve_body, surf_state))

    # direct light (incl shadow trace) + gi sample, on level-0 surfaces
    def shade_state(i):
        o, d, _ = rays_of(i)
        hit = T.trace_closest(pack, o, d, "front")
        surf = resolve_hit(pack, o, d, hit, jnp.zeros(3), jnp.zeros(3),
                           fast_rows=True)
        mtl = PT._fetch_mtl(pack, surf.mtl)
        vv = normalize(o - surf.p)
        u = jax.random.uniform(key, (n, 13))
        return surf, mtl, vv, hit.hit, u

    def direct_body(c, k):
        surf, mtl, vv, mask, u = c
        dl, _ = PT._direct_light(pack, cfg, surf, mtl, mtl.specular, surf.n,
                                 vv, u[:, :8], mask)
        u2 = jnp.roll(u, 1, axis=0) + jnp.mean(dl) * 1e-12
        return surf, mtl, vv, mask, u2

    slope("_direct_light (incl shadow)", scan_over(direct_body, shade_state))

    def gi_body(c, k):
        surf, mtl, vv, mask, u = c
        go, gd, galb, genv = PT._gi_sample(pack, cfg, surf, mtl, mtl.specular,
                                           surf.n, vv, u[:, 8:13])
        u2 = jnp.roll(u, 1, axis=0) + jnp.mean(galb) * 1e-12
        return surf, mtl, vv, mask, u2

    slope("_gi_sample", scan_over(gi_body, shade_state))

    # compaction: partition_indices + the child gathers
    def compact_body(c, k):
        mask, o = c
        selv = partition_indices(mask, k_cap)
        og = o[selv]
        mask2 = jnp.roll(mask, 1) ^ (jnp.sum(og) > 0.0)
        return mask2, o

    slope(f"partition+gather (K={k_cap})", scan_over(
        compact_body,
        lambda i: ((rays_of(i)[0][:, 0] > 0.0), rays_of(i)[0])))

    # full shade level 0 (everything the renderer pays per level)
    def level_body(c, k):
        o, d = c
        rec, tasks, _ = PT._shade_entry(pack, cfg, o, d,
                                        jax.random.fold_in(key, k),
                                        jnp.zeros(3), jnp.zeros(3))
        return perturb(o, rec.z), d

    slope("shade_level 0 FULL", scan_over(level_body, rays_init))


if __name__ == "__main__":
    main()
