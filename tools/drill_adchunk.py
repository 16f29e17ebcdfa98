"""Drill: honest attribution of the fwd+bwd (differentiable) chunk on TPU.

bench.py's fwd+bwd leg reads ~650K rays/s vs ~15M forward camera rays/s —
a ~23x gap the round-4 VERDICT flags. This reuses the image-level ablation
machinery (cfg.ablate data-dependent stubs) under differentiable=True to
price each component of the AD chunk, plus structural variants:

  - fwd_value_only: same differentiable graph, value only (no grad) — the
    AD-graph forward cost;
  - nondiff_fwd: differentiable=False monolithic chunk (the inference
    semantics: while_loop chain, fused shade kernel eligible) — the true
    forward baseline;
  - no_remat: remat_levels=False (backward keeps level intermediates);
  - tir_N: chain scan length sensitivity (the AD chain is a FIXED
    tir_bounces+1-trip scan at full K width; inference settles in ~2).

Timing: fetch-barriered per step, distinct `start` scalars per call (the
tunnel replays identical-input calls), eager flip first. Chunks at
production width (default 131072).

Usage: python tools/drill_adchunk.py [--chunk 131072] [--iters 3]
       [--only name,name]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--chunk", type=int, default=131072)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as B
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import _render_chunk
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.parallel.sharding import (
        _apply_params,
        trainable_params,
    )

    pack, cam = B._bench_scene()
    cam.width, cam.height = 1024, 1024
    cam_p = from_scene_camera(cam)
    n = args.chunk
    total = cam.width * cam.height
    key = jax.random.PRNGKey(0)
    params = trainable_params(pack, cam_p)
    target0 = jnp.zeros((n, 3))
    starts_d = jnp.arange(256, dtype=jnp.int32) * n
    print(f"backend={jax.default_backend()} chunk={n} scene=headline",
          flush=True)
    np.asarray(jnp.zeros((1,)) + 1)  # eager flip

    base = dict(spp=1, gi_bounces=3, extra_refr_levels=2, tir_bounces=16,
                chunk_rays=n, texture_sample_count=1, refr_capacity=0.08,
                differentiable=True, remat_levels=True)

    si = [0]

    def make_step(cfg, grad: bool):
        def step(p, start, target):
            idx = jnp.minimum(start + jnp.arange(n, dtype=jnp.int32),
                              total - 1)
            px = idx % cam.width
            py = idx // cam.width
            ck = jax.random.fold_in(key, start)

            def loss_fn(p_):
                pk, cm = _apply_params(pack, cam_p, p_)
                rad, _, _ = _render_chunk(pk, cfg, cm, cam.width, cam.height,
                                          px, py, ck)
                return jnp.mean((rad - target) ** 2)

            if grad:
                return jax.value_and_grad(loss_fn)(p)[0]
            return loss_fn(p)

        return jax.jit(step)

    def measure(name, cfg_overrides=None, grad=True):
        cfg = RenderConfig(**{**base, **(cfg_overrides or {})})
        f = make_step(cfg, grad)
        t_c0 = time.perf_counter()
        float(f(params, starts_d[si[0]], target0)); si[0] += 1
        compile_s = time.perf_counter() - t_c0
        t0 = time.perf_counter()
        for _ in range(args.iters):
            float(f(params, starts_d[si[0]], target0)); si[0] += 1
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:28s} {dt*1e3:8.1f} ms/step  "
              f"{n/dt/1e3:8.1f}K rays/s  (compile+warm {compile_s:.0f}s)",
              flush=True)
        return dt

    V = [
        ("fwdbwd_baseline", None, True),
        ("fwd_value_only", None, False),
        ("nondiff_fwd", {"differentiable": False}, False),
        ("no_remat", {"remat_levels": False}, True),
        ("ablate_chain", {"ablate": "chain"}, True),
        ("ablate_trace", {"ablate": "trace"}, True),
        ("ablate_shadow", {"ablate": "shadow"}, True),
        ("ablate_direct", {"ablate": "direct"}, True),
        ("ablate_gi", {"ablate": "gi"}, True),
        ("ablate_resolve", {"ablate": "resolve"}, True),
        ("ablate_rng", {"ablate": "rng"}, True),
        ("tir_4", {"tir_bounces": 4}, True),
        ("tir_8", {"tir_bounces": 8}, True),
        ("refr_cap_0.04", {"refr_capacity": 0.04}, True),
        ("gi_cap_0.5", {"gi_capacity": 0.5}, True),
    ]
    only = set(args.only.split(",")) if args.only else None
    for name, cfg_o, grad in V:
        if only and name not in only:
            continue
        try:
            measure(name, cfg_o, grad)
        except Exception as e:
            print(f"{name:28s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
