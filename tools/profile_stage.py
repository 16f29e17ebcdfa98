"""Per-component timing of the shade-level stage on the current device.

The round-1 ledger says per-level throughput is flat ~3M segs/s on the
headline scene and ~15M on analytic-only scenes, and calls that
"shading-bound". This tool decomposes one level into its component ops —
trace_closest, trace_shadow, resolve_hit, direct light, GI sample,
refraction chain, and the compaction argsorts — each jitted and timed
separately, so the round-2 fusion work targets measured cost, not a guess.

Usage: python tools/profile_stage.py [--scene headline|analytic] [--n 65536]
       [--level 0|2]  (level 2 = incoherent post-GI tasks)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _barrier(out):
    """TRUE completion barrier: fetch one element of an output.

    On the tunneled-TPU backend block_until_ready does NOT wait (the client
    journals ops and reports buffers ready; only a fetch forces execution),
    and un-fetched programs may be skipped entirely — so every timed
    iteration must be individually fetched or it may never run."""
    import jax
    import numpy as np

    for leaf in jax.tree.leaves(out):
        if hasattr(leaf, "dtype"):
            np.asarray(leaf.ravel()[0])
            return


_FETCH_BASELINE = None


def _fetch_baseline():
    """Per-iteration cost of the barrier itself (tiny slice + 4-byte
    fetch), measured on a no-op, subtracted from every reading."""
    global _FETCH_BASELINE
    if _FETCH_BASELINE is None:
        import jax
        import jax.numpy as jnp

        f = jax.jit(lambda x: x + 1.0)
        x = jnp.zeros((8,))
        _barrier(f(x))
        t0 = time.perf_counter()
        for _ in range(20):
            _barrier(f(x))
        _FETCH_BASELINE = (time.perf_counter() - t0) / 20
        print(f"(fetch-barrier baseline: {_FETCH_BASELINE*1e3:.2f} ms/iter, "
              "subtracted from every reading)", flush=True)
    return _FETCH_BASELINE


def timeit(fn, *args, iters=20, warmup=2):
    base = _fetch_baseline()
    for _ in range(warmup):
        _barrier(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        _barrier(fn(*args))
    return max((time.perf_counter() - t0) / iters - base, 0.0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="headline", choices=["headline", "analytic"])
    ap.add_argument("--n", type=int, default=65536)
    ap.add_argument("--level", type=int, default=0)
    ap.add_argument("--refr-capacity", type=float, default=0.08,
                    help="match bench.py's headline capacity so the level "
                         "walk reuses its compilation cache")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models import pathtracer as PT
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.ops.trace import resolve_hit, trace_closest, trace_shadow

    import bench as B

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
                       chunk_rays=args.n, texture_sample_count=1,
                       refr_capacity=args.refr_capacity)
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
    # Walk to the requested level so inputs have that level's ray statistics.
    for lvl in range(args.level):
        _, tasks, _ = PT._shade_level_jit(
            pack, cfg, tasks, lvl, jax.random.fold_in(key, 100 + lvl),
            dd_x, dd_y, None)
    lvl = args.level
    n_lvl = tasks.o.shape[0]
    lkey = jax.random.fold_in(key, 100 + lvl)
    print(f"device={jax.devices()[0].platform} scene={args.scene} "
          f"level={lvl} lanes={n_lvl} "
          f"active={int(jnp.sum(tasks.active))}", flush=True)

    results = {}

    def rep(name, dt, per_lane_traces=None):
        results[name] = dt
        extra = ""
        if per_lane_traces:
            extra = f"  ({n_lvl * per_lane_traces / dt / 1e6:.1f}M traces/s)"
        print(f"{name:28s} {dt * 1e3:9.3f} ms{extra}", flush=True)

    # --- full level stage (the unit the renderer pays per level) ---
    full = lambda t, k: PT._shade_level_jit(pack, cfg, t, lvl, k, dd_x, dd_y, None)
    rep("shade_level TOTAL", timeit(full, tasks, lkey))

    # --- trace_closest on this level's rays ---
    tc = jax.jit(lambda o_, d_: trace_closest(pack, o_, d_, "front"))
    rep("trace_closest", timeit(tc, tasks.o, tasks.d), per_lane_traces=1)

    hit = tc(tasks.o, tasks.d)

    # --- resolve_hit ---
    rh = jax.jit(lambda o_, d_, h: resolve_hit(pack, o_, d_, h, dd_x, dd_y))
    rep("resolve_hit", timeit(rh, tasks.o, tasks.d, hit))
    surf = rh(tasks.o, tasks.d, hit)

    # --- fused shade-setup kernel (replaces resolve+fresnel+lights+GI on
    # qualifying scenes; ops/pallas_shade.py) ---
    from bhraytracer_tpu.ops.pallas_shade import shade_setup, shade_setup_supported

    u_tab0 = jax.random.uniform(lkey, (n_lvl, 13))
    if shade_setup_supported(pack, cfg, None):
        ss = jax.jit(lambda o_, d_, h, u_: shade_setup(
            pack, cfg, o_, d_, h, tasks.active & h.hit, u_))
        rep("shade_setup (fused kernel)", timeit(ss, tasks.o, tasks.d, hit,
                                                 u_tab0))

    # --- trace_shadow (point-light style rays from the surface) ---
    sh_d = pack.light_vec[0][None, :] - surf.p
    ts = jax.jit(lambda o_, d_: trace_shadow(pack, o_, d_, 1.0, cfg.shadow_bias))
    rep("trace_shadow", timeit(ts, surf.p, sh_d), per_lane_traces=1)

    # --- direct light (includes one trace_shadow) ---
    mtl = PT._fetch_mtl(pack, surf.mtl)
    vn = surf.n
    vv = -tasks.d / jnp.linalg.norm(tasks.d, axis=1, keepdims=True)
    u_tab = jax.random.uniform(lkey, (n_lvl, 13))
    shade_mask = tasks.active & hit.hit

    dl = jax.jit(lambda s_, m_, u_: PT._direct_light(
        pack, cfg, s_, m_, m_.specular, s_.n, vv, u_, shade_mask))
    rep("direct_light (incl shadow)", timeit(dl, surf, mtl, u_tab[:, :8]))

    # --- GI sample ---
    gi = jax.jit(lambda s_, m_, u_: PT._gi_sample(
        pack, cfg, s_, m_, m_.specular, s_.n, vv, u_))
    rep("gi_sample", timeit(gi, surf, mtl, u_tab[:, 8:13]))

    # --- compaction argsort + gathers (what _shade_level pays to compact) ---
    k_cap = cfg.refr_cap(n_lvl)

    def compact(cand):
        order = jnp.argsort(~cand, stable=True)
        sel = order[:k_cap]
        return sel, surf.p[sel], surf.n[sel], tasks.o[sel], tasks.d[sel]

    cand = shade_mask & (jnp.sum(mtl.refraction, 1) > 0)
    rep("argsort+gather (compact)", timeit(jax.jit(compact), cand))

    # --- plain argsort of n keys (sort cost alone) ---
    rep("argsort alone", timeit(jax.jit(lambda c: jnp.argsort(c)), cand))

    # --- refraction chain on compacted lanes ---
    def g(x):
        order = jnp.argsort(~cand, stable=True)
        sel = order[:k_cap]
        return x[sel]

    surf_k = PT.Surface(*[g(f) for f in surf])
    mtl_k = PT.Mtl(*[g(f) for f in mtl])
    cos1 = jnp.clip(jnp.sum(g(vn) * g(vv), 1), 0.0, 1.0)
    refr_eff = mtl_k.refraction
    rc = jax.jit(lambda s_, m_: PT._refraction_chain(
        pack, cfg, s_, m_, s_.n, g(vv), cos1, m_.refraction,
        g(cand), g(tasks.bounce), jax.random.fold_in(lkey, 2)))
    rep(f"refraction_chain (K={k_cap})", timeit(rc, surf_k, mtl_k))

    # --- components sum ---
    acc = sum(v for k, v in results.items()
              if k not in ("shade_level TOTAL", "trace_shadow", "argsort alone"))
    print(f"{'components sum':28s} {acc * 1e3:9.3f} ms "
          f"(vs total {results['shade_level TOTAL'] * 1e3:.3f} ms)")


if __name__ == "__main__":
    main()
