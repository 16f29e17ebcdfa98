"""Micro-benchmark: packet-BVH closest-hit on fully-incoherent rays.

The packet kernel's weak spot is incoherent (GI/secondary) rays: a tile
traverses the union of its rays' paths, so throughput here tracks how well
the coherence sort (ops/pallas_bvh._coherence_order) groups lanes.  Round-1
reference points on one TPU v5e chip, 65K rays over the proj11 teapot scene:
octant-only key 12.1 ms; octant+4x4x4-origin-cell key 10.9 ms (6.0M rays/s).
Run after any traversal/sort-key change and compare.

Usage: python tools/bench_incoherent.py [scene.xml] [--rays N]
(defaults to the reference's proj11_0.xml with generated stand-in assets).
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("scene", nargs="?",
                    default="/root/reference/BHRayTracer/Resource/Data/proj11_0.xml")
    ap.add_argument("--resource-root", default=None)
    ap.add_argument("--rays", type=int, default=65536)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import numpy as np
    import warnings

    import jax
    import jax.numpy as jnp

    from bhraytracer_tpu.ops import trace as T
    from bhraytracer_tpu.scene.xml_loader import load_scene

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = args.resource_root or os.path.join(repo, "assets")
    if not os.path.exists(os.path.join(root, "Resource", "Data", "teapot.obj")):
        import subprocess

        subprocess.run([sys.executable, os.path.join(repo, "tools", "gen_assets.py"),
                        root], check=True)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pack, _ = load_scene(args.scene, resource_root=root)

    rng = np.random.default_rng(0)
    n = args.rays
    # Origins scattered through the scene volume, directions uniform — the
    # worst case the GI wavefront produces. DISTINCT inputs per iteration:
    # the tunneled TPU client serves repeated identical calls from a
    # content-keyed replay cache (round-3 ledger), so same-input timing
    # loops are fiction.
    o = jnp.asarray(rng.uniform(-8, 8, (args.iters + 1, n, 3))
                    * np.array([1, 1, 0.5]) + [0, 0, 2], jnp.float32)
    d = jnp.asarray(rng.normal(size=(args.iters + 1, n, 3)), jnp.float32)
    # Flip the client into eager mode (block_until_ready does not wait in
    # the initial journaling mode; only a fetch is a true barrier).
    np.asarray(jnp.zeros((1,)) + 1.0)

    def timed(name, fn):
        # Digest-slope timing: each per-fetch round trip on the tunneled
        # backend costs ~26-30ms, swamping kernels in the 1-10ms range. So:
        # chain every output into a carried scalar digest (content differs
        # every call -> no replay cache), fetch ONE scalar at the end, and
        # difference two loop lengths so the RTT and loop-entry costs
        # cancel. The slope is per-iteration wall (device compute, or the
        # ~1.5ms dispatch floor if the kernel is cheaper than dispatch).
        g = jax.jit(lambda o_, d_, acc: acc + jnp.sum(fn(o_, d_)))

        def run(k):
            a = jnp.zeros(())
            t0 = time.time()
            for i in range(k):
                a = g(o[1 + (i % args.iters)], d[1 + (i % args.iters)], a)
            float(a)
            return time.time() - t0

        # One kernel failing to lower (Mosaic gaps show up on hardware
        # only) must not kill the rest of the sweep.
        try:
            float(g(o[0], d[0], jnp.zeros(())))  # warm/compile + barrier
            k1, k2 = max(2, args.iters // 2), 2 * args.iters
            t1, t2 = run(k1), run(k2)
        except Exception as e:
            print(f"{name}: FAILED ({type(e).__name__}: "
                  f"{str(e).splitlines()[0][:200]})", flush=True)
            return
        ms = (t2 - t1) / (k2 - k1) * 1e3
        print(f"{name}: {ms:.2f} ms for {n} rays "
              f"({n / ms / 1e3:.1f}M rays/s) slope over {k2 - k1} iters "
              f"on {jax.default_backend()}", flush=True)

    timed("incoherent closest-hit (packet)",
          jax.jit(lambda o, d: T.trace_closest(pack, o, d, "front").t))

    if pack.n_msh:
        from bhraytracer_tpu.ops.linalg import BIG
        from bhraytracer_tpu.ops.pallas_bvh import bvh_closest_pallas
        from bhraytracer_tpu.ops.pallas_bvh_divergent import (
            bvh_anyhit_divergent,
            bvh_closest_divergent,
            divergent_traversable,
        )
        from bhraytracer_tpu.ops.pallas_bvh import bvh_anyhit_pallas
        from bhraytracer_tpu.ops.trace import MESH_SHADOW_BIAS

        ti = jnp.full((n,), BIG)
        timed("bvh only (packet kernel)",
              jax.jit(lambda o, d: bvh_closest_pallas(pack, 0, o, d,
                                                      "front", ti)[0]))
        try:
            # Retired measured-slower experiment (2.0M vs 5.9M rays/s);
            # kept under experiments/ with its outcome header.
            from experiments.pallas_bvh_subpacket import bvh_closest_subpacket

            timed("bvh only (sub-packet kernel, experiments/)",
                  jax.jit(lambda o, d: bvh_closest_subpacket(
                      pack, 0, o, d, "front", ti)[0]))
        except ImportError:
            pass
        from bhraytracer_tpu.ops.pallas_stream import (
            stream_anyhit,
            stream_closest,
            stream_traversable,
        )

        if stream_traversable(pack):
            timed("bvh only (streaming kernel)",
                  jax.jit(lambda o, d: stream_closest(pack, o, d,
                                                      "front", ti)[0]))
        if divergent_traversable(pack):
            timed("bvh only (divergent kernel)",
                  jax.jit(lambda o, d: bvh_closest_divergent(pack, 0, o, d,
                                                             "front", ti)[0]))
            tm = jnp.ones((n,))
            timed("anyhit (packet kernel)",
                  jax.jit(lambda o, d: bvh_anyhit_pallas(
                      pack, 0, o, d, MESH_SHADOW_BIAS, tm)))
            timed("anyhit (divergent kernel)",
                  jax.jit(lambda o, d: bvh_anyhit_divergent(
                      pack, 0, o, d, MESH_SHADOW_BIAS, tm)))
            if stream_traversable(pack):
                timed("anyhit (streaming kernel)",
                      jax.jit(lambda o, d: stream_anyhit(
                          pack, o, d, MESH_SHADOW_BIAS, tm)))
        else:
            print("divergent kernel: gated off for this scene")


if __name__ == "__main__":
    main()
