"""Image-level ablation sweep on the tunneled TPU — the ONLY honest way to
attribute per-chunk cost on this backend.

Why not per-op timing (tools/profile_stage.py): the axon client journals
ops (block_until_ready does not wait before the first readback), skips
never-fetched programs, and the terminal serves repeated identical calls
from a content-keyed replay cache — so micro-timings of a fn called with
the same inputs are fiction. At image granularity with per-call sample
keys every chunk is distinct work, the single stats fetch at the end is a
true barrier, and the ~1.2ms/dispatch RTT is amortized over ~100ms chunks.

Each variant renders the 8 distinct 65536-lane chunks of the headline
scene (proj12_backfaceTest, 800x600) N times with distinct sample indices
and reports segs/s. Variants toggle the module-level kernel switches and
config knobs one at a time.

Usage: python tools/sweep_variants.py [--passes 3] [--only name,name]
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
    ap.add_argument("--only", default=None,
                    help="comma-separated variant names to run")
    ap.add_argument("--chunk", type=int, default=65536,
                    help="lanes per dispatch; bigger chunks amortize the "
                         "~1.5ms/dispatch tunnel RTT over more work "
                         "(480000 = whole 800x600 image in one chunk)")
    ap.add_argument("--fused", action="store_true",
                    help="base every variant on fused_levels=True (required "
                         "at 480K-lane chunks: the staged stages hit "
                         "remote-compile failures there)")
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as B
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_chunk_staged_at
    from bhraytracer_tpu.ops import trace as T
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.ops.pallas_shade import (
        probe_shade_kernel,
        set_shade_kernel,
    )

    pack, cam = B._bench_scene()
    cam.width, cam.height = 800, 600
    base = dict(spp=1, gi_bounces=3, extra_refr_levels=2, tir_bounces=16,
                chunk_rays=args.chunk, texture_sample_count=1,
                refr_capacity=0.08, fused_levels=args.fused)
    cam_p = from_scene_camera(cam)
    n = base["chunk_rays"]
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
        probe_shade_kernel(pack, RenderConfig(**base))
    # Flip the client into eager (post-readback) execution mode before any
    # timing — fresh-mode journaled execution is slower end-to-end and its
    # block_until_ready lies.
    np.asarray(jnp.zeros((1,)) + 1)

    sample_counter = [1]

    def measure(cfg, passes):
        def run(c, s):
            return render_chunk_staged_at(
                pack, cfg, cam_p, 800, 600, n, starts_d[c], key,
                samples_d[s], None, acc0, zb0, True, st_prev=st0)

        # warm/compile pass (not timed)
        s0 = sample_counter[0]
        sample_counter[0] += passes + 1
        outs = [run(c, s0) for c in range(n_chunks)]
        np.asarray(outs[-1][2].vec)
        t0 = time.perf_counter()
        outs = []
        for p in range(passes):
            outs += [run(c, s0 + 1 + p) for c in range(n_chunks)]
        sts = [np.asarray(o[2].vec) for o in outs]
        dt = time.perf_counter() - t0
        segs = sum(int(s[3]) for s in sts)
        drops = sum(int(s[:3].sum()) for s in sts)
        return segs / dt, dt / len(outs), drops / len(outs)

    def variant(name, cfg_overrides=None, setup=None, teardown=None):
        cfg = RenderConfig(**{**base, **(cfg_overrides or {})})
        if setup:
            setup()
            # Module-level kernel switches are read at TRACE time, but the
            # jitted chunk entry points cache on (cfg, shapes) only — without
            # this, every setup-lambda variant silently reuses the baseline's
            # compiled program and measures NOTHING (round-4 discovery: this
            # artifact produced the "kernel swaps change nothing" readings in
            # rounds 3-4; the stream kernel is actually 3.5x faster per trace
            # in isolation). Re-tracing hits the persistent .jax_cache for
            # previously-compiled HLO, so repeat sweeps stay fast.
            jax.clear_caches()
        try:
            rate, per_chunk, drops = measure(cfg, args.passes)
        finally:
            if teardown:
                teardown()
                jax.clear_caches()
        print(f"{name:32s} {rate/1e6:7.2f}M segs/s  {per_chunk*1e3:7.1f} "
              f"ms/chunk  drops/chunk {drops:.0f}", flush=True)

    only = set(args.only.split(",")) if args.only else None
    V = [
        ("baseline", None, None, None),
        ("fused_levels", {"fused_levels": True}, None, None),
        ("shade_kernel_off", None,
         lambda: set_shade_kernel("off"), lambda: set_shade_kernel("auto")),
        ("pallas_trace_off", None,
         lambda: T.set_pallas_mode("off"), lambda: T.set_pallas_mode("auto")),
        ("divergent_on", None,
         lambda: T.set_divergent_mode("on"), lambda: T.set_divergent_mode("off")),
        # Stream is the DEFAULT now; the A/B variant measures it OFF
        # (packet-only). Teardown restores the default ("on").
        ("stream_off", None,
         lambda: T.set_stream_mode("off"), lambda: T.set_stream_mode("on")),
        # Component ablations (cfg.ablate stubs; images are wrong by
        # construction — only the TIMING delta vs baseline means anything).
        ("ablate_chain", {"ablate": "chain"}, None, None),
        ("ablate_direct", {"ablate": "direct"}, None, None),
        ("ablate_shadow", {"ablate": "shadow"}, None, None),
        ("ablate_gi", {"ablate": "gi"}, None, None),
        ("ablate_rng", {"ablate": "rng"}, None, None),
        ("ablate_trace", {"ablate": "trace"}, None, None),
        ("ablate_resolve", {"ablate": "resolve"}, None, None),
        ("ablate_raygen", {"ablate": "raygen"}, None, None),
        ("ablate_combine", {"ablate": "combine"}, None, None),
        # reorder ablation: with stream ON, reorder also selects the
        # kernel, so images agree only up to the equal-t seam-tie family
        # (see config.py); timing compares sorted-stream routing vs
        # unsorted-packet routing, not just the sort fabric.
        ("ablate_reorder", {"ablate": "reorder"}, None, None),
        ("ablate_compact", {"ablate": "compact"}, None, None),
        ("ablate_all", {"ablate": "chain,direct,gi,rng,trace"}, None, None),
        ("ablate_all_resolve",
         {"ablate": "chain,direct,gi,rng,trace,resolve,compact"}, None, None),
        ("partition_topk", None,
         lambda: __import__("bhraytracer_tpu.ops.compact",
                            fromlist=["x"]).set_partition_method("topk"),
         lambda: __import__("bhraytracer_tpu.ops.compact",
                            fromlist=["x"]).set_partition_method("auto")),
        ("partition_scan", None,
         lambda: __import__("bhraytracer_tpu.ops.compact",
                            fromlist=["x"]).set_partition_method("scan"),
         lambda: __import__("bhraytracer_tpu.ops.compact",
                            fromlist=["x"]).set_partition_method("auto")),
        # Serialized-gather attribution (set_gather_stub; wrong images).
        ("stub_instgather", None,
         lambda: T.set_gather_stub("inst"), lambda: T.set_gather_stub("")),
        ("stub_rowgather", None,
         lambda: T.set_gather_stub("rows"), lambda: T.set_gather_stub("")),
        # Per-family reorder toggles (BIT-IDENTICAL images: order-only).
        ("chain_noreorder", {"chain_reorder": False}, None, None),
        ("shadow_noreorder", {"shadow_reorder": False}, None, None),
        ("closest_noreorder", {"closest_reorder": False}, None, None),
        ("all_noreorder",
         {"chain_reorder": False, "shadow_reorder": False,
          "closest_reorder": False}, None, None),
        # One sort per level instead of one per trace (+ none per chain
        # trip). Images identical up to fusion-boundary rounding.
        ("level_presort", {"level_presort": True}, None, None),
        # Finer coherence-sort origin cells (bit-identical: order-only).
        ("cells8", None,
         lambda: __import__("bhraytracer_tpu.ops.pallas_bvh",
                            fromlist=["x"]).set_cell_res(8),
         lambda: __import__("bhraytracer_tpu.ops.pallas_bvh",
                            fromlist=["x"]).set_cell_res(4)),
        ("cells16", None,
         lambda: __import__("bhraytracer_tpu.ops.pallas_bvh",
                            fromlist=["x"]).set_cell_res(16),
         lambda: __import__("bhraytracer_tpu.ops.pallas_bvh",
                            fromlist=["x"]).set_cell_res(4)),
        # UNSTABLE reorder sort A/B; the shipped default is STABLE
        # (pallas_bvh._STABLE_REORDER = True — stable measured faster
        # in-context despite the cheaper isolated sort, drill_sort480).
        # Teardown restores the module default so later variants don't
        # silently run on the non-default sort (round-4 advisor finding).
        ("unstable_reorder", None,
         lambda: __import__("bhraytracer_tpu.ops.pallas_bvh",
                            fromlist=["x"]).set_stable_reorder(False),
         lambda: __import__("bhraytracer_tpu.ops.pallas_bvh",
                            fromlist=["x"]).set_stable_reorder(True)),
        # Stream kernel shape knobs (bit-identical results; order-only).
        # Stream shape A/B variants. Teardowns restore the SHIPPED default
        # (2048, 32) — a stale teardown here silently re-traces every later
        # variant on a non-default shape (review finding, round 4).
        ("stream_r1024_s8", None,
         lambda: __import__("bhraytracer_tpu.ops.pallas_stream",
                            fromlist=["x"]).set_stream_shape(1024, 8),
         lambda: __import__("bhraytracer_tpu.ops.pallas_stream",
                            fromlist=["x"]).set_stream_shape(2048, 32)),
        ("stream_s16", None,
         lambda: __import__("bhraytracer_tpu.ops.pallas_stream",
                            fromlist=["x"]).set_stream_shape(2048, 16),
         lambda: __import__("bhraytracer_tpu.ops.pallas_stream",
                            fromlist=["x"]).set_stream_shape(2048, 32)),
        ("stream_s64", None,
         lambda: __import__("bhraytracer_tpu.ops.pallas_stream",
                            fromlist=["x"]).set_stream_shape(2048, 64),
         lambda: __import__("bhraytracer_tpu.ops.pallas_stream",
                            fromlist=["x"]).set_stream_shape(2048, 32)),
        ("stream_r4096", None,
         lambda: __import__("bhraytracer_tpu.ops.pallas_stream",
                            fromlist=["x"]).set_stream_shape(4096, 32),
         lambda: __import__("bhraytracer_tpu.ops.pallas_stream",
                            fromlist=["x"]).set_stream_shape(2048, 32)),
        # Cluster-culled sorted stream (bit-identical; pays sort+unsort
        # per trace for conservative 64-face-cluster skipping).
        ("stream_cull", None,
         lambda: T.set_stream_cull("on"), lambda: T.set_stream_cull("off")),
        # Level-0 camera rays through the stream kernel instead of the
        # coherent packet kernel (value-safe up to seam ties).
        ("level0_stream", {"level0_reorder": True}, None, None),
        # Chain trip-width structure (drop counters say what it costs).
        ("tir_head1", {"tir_head_trips": 1}, None, None),
        ("tir_head1_div16", {"tir_head_trips": 1, "tir_tail_divisor": 16},
         None, None),
        ("tir_div16", {"tir_tail_divisor": 16}, None, None),
        ("tir_head1_div8", {"tir_head_trips": 1, "tir_tail_divisor": 8},
         None, None),
        ("tir_head2_div16", {"tir_head_trips": 2, "tir_tail_divisor": 16},
         None, None),
        ("refr_cap_0.16", {"refr_capacity": 0.16}, None, None),
        ("refr_cap_1.0_lossless",
         {"refr_capacity": 1.0, "tir_tail_compaction": False,
          "gi_capacity": 1.0}, None, None),
        ("gi_2_bounces", {"gi_bounces": 2}, None, None),
    ]
    for name, cfg_o, setup, teardown in V:
        if only and name not in only:
            continue
        try:
            variant(name, cfg_o, setup, teardown)
        except Exception as e:
            print(f"{name:32s} FAILED: {type(e).__name__}: {str(e)[:200]}",
                  flush=True)


if __name__ == "__main__":
    main()
