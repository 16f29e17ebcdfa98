"""Drill: honest image-level attribution of the proj10 TEXTURED chunk.

bench --full's proj10 leg read 82K segs/s (vs 22.7M on the untextured
headline) — a ~276x hole. This prices the suspects at image level on TPU:

  - fetch_stub: the four bilinear atlas texel gathers replaced by a
    data-dependent hash (ops/texturing.set_fetch_stub) — if the delta is
    the bulk, serialized atlas gathers are the villain;
  - ablate_direct / ablate_chain / ablate_trace: the usual component
    stubs under the textured config;
  - notex: the same scene with every texture map stripped from the pack
    (checker+file -> plain colors) — the structural upper bound.

Timing discipline: eager flip, distinct sample ids per pass, fetch-barrier
on the per-pass stats vector, jax.clear_caches() around module-switch
variants (jit caches key on (cfg, shapes), not module globals).

Usage: python tools/drill_textured.py [--passes 2] [--chunk 480000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--chunk", type=int, default=480000)
    ap.add_argument("--only", default=None)
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import warnings

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_chunk_staged_at
    from bhraytracer_tpu.ops import texturing as X
    from bhraytracer_tpu.ops import trace as T
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.scene.xml_loader import load_scene

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pack, cam = load_scene(
            "/root/reference/BHRayTracer/Resource/Data/proj10.xml",
            resource_root=os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                "assets"))
    cam.width, cam.height = 800, 600
    cam_p = from_scene_camera(cam)
    n = args.chunk
    base = dict(spp=1, gi_bounces=0, extra_refr_levels=0, tir_bounces=16,
                chunk_rays=n, texture_sample_count=1, fused_levels=True)
    total = 800 * 600
    n_chunks = -(-total // n)
    key = jax.random.PRNGKey(0)
    starts_d = jnp.arange(n_chunks, dtype=jnp.int32) * n
    samples_d = jnp.arange(4096, dtype=jnp.int32)
    acc0 = jnp.zeros((n, 3))
    zb0 = jnp.full((n,), 1e30)
    st0 = jnp.zeros((4,), jnp.int32)
    if jax.default_backend() == "tpu":
        T.probe_trace_kernels(pack)
    np.asarray(jnp.zeros((1,)) + 1)
    print(f"backend={jax.default_backend()} chunk={n} scene=proj10",
          flush=True)

    counter = [1]

    def measure(cfg, the_pack):
        def run(c, s):
            return render_chunk_staged_at(
                the_pack, cfg, cam_p, 800, 600, n, starts_d[c], key,
                samples_d[s], None, acc0, zb0, True, st_prev=st0)

        s0 = counter[0]
        counter[0] += args.passes + 1
        outs = [run(c, s0) for c in range(n_chunks)]
        np.asarray(outs[-1][2].vec)
        t0 = time.perf_counter()
        outs = []
        for p in range(args.passes):
            outs += [run(c, s0 + 1 + p) for c in range(n_chunks)]
        sts = [np.asarray(o[2].vec) for o in outs]
        dt = time.perf_counter() - t0
        segs = sum(int(s[3]) for s in sts)
        return segs / dt, dt / len(outs) * 1e3

    def notex_pack(p):
        """Strip every texture binding (tm ids -> -1, env/bg plain)."""
        import dataclasses as dc

        kw = {}
        for f in ("mtl_diffuse_tm", "mtl_specular_tm", "mtl_emission_tm",
                  "mtl_reflection_tm", "mtl_refraction_tm"):
            if hasattr(p, f):
                kw[f] = jnp.full_like(getattr(p, f), -1)
        for f in ("env_tm", "bg_tm"):
            if hasattr(p, f):
                kw[f] = jnp.full_like(getattr(p, f), -1)
        # n_texmaps=0 statically skips ALL texture machinery (and
        # re-enables the fused shade kernel) — the structural upper bound.
        kw["n_texmaps"] = 0
        try:
            return dc.replace(p, **kw)
        except Exception:
            return p._replace(**kw)

    V = [
        ("baseline", {}, None, None, None),
        ("fetch_stub", {}, lambda: X.set_fetch_stub(True),
         lambda: X.set_fetch_stub(False), None),
        ("ablate_direct", {"ablate": "direct"}, None, None, None),
        ("ablate_chain", {"ablate": "chain"}, None, None, None),
        ("ablate_trace", {"ablate": "trace"}, None, None, None),
        ("notex", {}, None, None, notex_pack),
    ]
    only = set(args.only.split(",")) if args.only else None
    results = {}
    for name, cfg_o, setup, teardown, packfn in V:
        if only and name not in only:
            continue
        if setup:
            setup()
            jax.clear_caches()
        try:
            cfg = RenderConfig(**{**base, **cfg_o})
            the_pack = packfn(pack) if packfn else pack
            segs, ms = measure(cfg, the_pack)
            results[name] = ms
            print(f"{name:18s} {segs/1e6:8.3f} Msegs/s  {ms:9.1f} ms/chunk",
                  flush=True)
        except Exception as e:
            print(f"{name:18s} FAILED {type(e).__name__}: {e}", flush=True)
        finally:
            if teardown:
                teardown()
                jax.clear_caches()
    if "baseline" in results:
        b = results["baseline"]
        for k, v in results.items():
            if k != "baseline":
                print(f"delta {k:18s} {v - b:+9.1f} ms/chunk", flush=True)


if __name__ == "__main__":
    main()
