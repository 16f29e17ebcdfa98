"""Bisect the _illuminate cost at level-2 inputs (headline scene).

The shade-level ablation shows stubbing _illuminate saves ~6.8 ms while
stubbing just its trace_shadow saves ~0 — this measures the pieces
standalone to tell a real component cost from an XLA fusion-context effect.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import bench as B
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models import pathtracer as PT
    from bhraytracer_tpu.ops import trace as TR
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.ops.sampling import sample_along_normal

    pack, cam = B._bench_scene()
    cam.width, cam.height = 800, 600
    cfg = RenderConfig(spp=1, gi_bounces=3, extra_refr_levels=2, tir_bounces=16,
                       chunk_rays=65536, texture_sample_count=1)
    cam_p = from_scene_camera(cam)
    n = cfg.chunk_rays
    idx = np.arange(n)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)
    key = jax.random.PRNGKey(0)
    o, d, bg, dd_x, dd_y = PT._stage_raygen_jit(pack, cfg, cam_p, cam.width,
                                                cam.height, px, py, key)
    tasks = PT.Tasks(o=o, d=d, active=jnp.ones((n,), bool),
                     bounce=jnp.full((n,), cfg.tir_bounces, jnp.int32))
    for lvl in range(2):
        _, tasks, _ = PT._shade_level_jit(
            pack, cfg, tasks, lvl, jax.random.fold_in(key, 100 + lvl),
            dd_x, dd_y, None)
    lkey = jax.random.fold_in(key, 102)
    n_lvl = tasks.o.shape[0]
    hit = jax.jit(lambda o_, d_: TR.trace_closest(pack, o_, d_, "front"))(
        tasks.o, tasks.d)
    surf = jax.jit(lambda o_, d_, h: TR.resolve_hit(pack, o_, d_, h, dd_x, dd_y))(
        tasks.o, tasks.d, hit)
    shade = tasks.active & hit.hit
    u_tab = jax.random.uniform(jax.random.fold_in(lkey, 1), (n_lvl, 13))
    lidx = jax.jit(PT._select_light)(pack, u_tab[:, 7])
    p = surf.p
    print(f"lanes={n_lvl} shade={int(jnp.sum(shade))}", flush=True)

    def timeit(fn, *a, iters=50):
        out = fn(*a)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(4):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    mask = shade

    full = jax.jit(lambda li, p_, u_, m_: PT._illuminate(pack, cfg, li, p_, u_, m_))
    print(f"illuminate full        {timeit(full, lidx, p, u_tab[:, 5:7], mask)*1e3:8.3f} ms",
          flush=True)

    def no_shadow(li, p_, u_, m_):
        orig = TR.trace_shadow
        kind = pack.light_kind[li]
        lvec = pack.light_vec[li]
        lsize = pack.light_size[li]
        intensity = pack.light_intensity[li]
        center_dir = lvec - p_
        rr = jnp.sum(center_dir * center_dir, 1)
        sdir = sample_along_normal(center_dir, lsize, u_[:, 0], u_[:, 1])
        sdir = jnp.where((lsize > 0)[:, None], sdir, center_dir)
        is_point = kind == 2
        is_direct = kind == 1
        vis = jnp.ones((p_.shape[0],))
        irr_point = jnp.where((rr == 0.0)[:, None], 1e30,
                              intensity * vis[:, None] / jnp.maximum(rr, 1e-30)[:, None])
        irr_direct = intensity * vis[:, None]
        return jnp.where(is_point[:, None], irr_point,
                         jnp.where(is_direct[:, None], irr_direct, intensity)) + sdir

    print(f"illuminate minus trace {timeit(jax.jit(no_shadow), lidx, p, u_tab[:, 5:7], mask)*1e3:8.3f} ms",
          flush=True)

    # the shadow trace alone on the same rays _illuminate builds
    def shadow_only(li, p_, u_, m_):
        kind = pack.light_kind[li]
        lvec = pack.light_vec[li]
        lsize = pack.light_size[li]
        center_dir = lvec - p_
        sdir = sample_along_normal(center_dir, lsize, u_[:, 0], u_[:, 1])
        sdir = jnp.where((lsize > 0)[:, None], sdir, center_dir)
        is_point = kind == 2
        is_direct = kind == 1
        cand = m_ & (is_point | is_direct)
        shadow_o = jnp.where(cand[:, None], p_, PT._MISS_O)
        shadow_d = jnp.where(cand[:, None], sdir, PT._MISS_D)
        t_max = jnp.where(is_point, 1.0, 1e30)
        return TR.trace_shadow(pack, shadow_o, shadow_d, t_max, cfg.shadow_bias)

    print(f"shadow trace alone     {timeit(jax.jit(shadow_only), lidx, p, u_tab[:, 5:7], mask)*1e3:8.3f} ms",
          flush=True)

    print(f"sample_along_normal    {timeit(jax.jit(lambda p_, u_: sample_along_normal(pack.light_vec[0] - p_, pack.light_size[0], u_[:, 0], u_[:, 1])), p, u_tab[:, 5:7])*1e3:8.3f} ms",
          flush=True)


if __name__ == "__main__":
    main()
