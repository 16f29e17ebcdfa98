"""Drill: true per-trace cost of each traversal kernel at production width.

The 480K fused sweep (round 4, honest stubs) shows closest traces ~385ms
and the shadow trace ~130ms of the 601ms chunk, yet swapping kernels
(packet/divergent/stream/XLA) moves image time < 0.3%. This measures each
kernel's per-trace cost directly, floor-free (K-loop slope between two K
values inside ONE program; the tunnel's ~27ms dispatch floor cancels).

Rays are fully-incoherent box rays over the headline scene (the GI/TIR
population that saturates packet unions). Each iteration perturbs origins
by the previous t so nothing folds or replays.

Usage: python tools/drill_trace_kernels.py [--rays 589824] [--ks 2,8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=589824)  # 576 * 1024
    ap.add_argument("--ks", default="2,8")
    args = ap.parse_args()
    k_lo, k_hi = (int(x) for x in args.ks.split(","))

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as B
    from bhraytracer_tpu.ops import trace as T

    pack, cam = B._bench_scene()
    n = args.rays
    print(f"backend={jax.default_backend()} rays={n} scene=headline",
          flush=True)
    np.asarray(jnp.zeros((1,)) + 1)  # eager flip

    key = jax.random.PRNGKey(0)
    bmin = np.asarray(pack.bvh_bmin[0]) - 2.0
    bmax = np.asarray(pack.bvh_bmax[0]) + 2.0
    span = jnp.asarray(bmax - bmin, jnp.float32)
    o0 = jax.random.uniform(key, (n, 3)) * span + jnp.asarray(bmin)
    tgt = (jax.random.uniform(jax.random.fold_in(key, 1), (n, 3))
           * jnp.asarray(bmax - bmin) + jnp.asarray(bmin))
    d0 = tgt - o0
    salts = jnp.arange(64, dtype=jnp.int32)

    def closest_loop(kk, reorder):
        def run(s, o, d):
            o = o + s.astype(jnp.float32) * 1e-9

            def body(i, c):
                oo, acc = c
                h = T.trace_closest(pack, oo, d, "front", reorder=reorder)
                # data-dependent perturbation; keeps every trace live
                oo = oo + (h.t[:, None] % 1.0) * 1e-6
                return oo, acc + jnp.sum(h.t % 7.0)

            _, acc = jax.lax.fori_loop(0, kk, body, (o, jnp.zeros(())))
            return acc
        return run

    def shadow_loop(kk, reorder):
        tmax = jnp.ones((n,)) * 3.0

        def run(s, o, d):
            o = o + s.astype(jnp.float32) * 1e-9

            def body(i, c):
                oo, acc = c
                occ = T.trace_shadow(pack, oo, d, tmax, 1e-4, reorder=reorder)
                oo = oo + occ[:, None] * 1e-7
                return oo, acc + jnp.sum(occ)

            _, acc = jax.lax.fori_loop(0, kk, body, (o, jnp.zeros(())))
            return acc
        return run

    si = 0

    def measure(name, make, reorder=True):
        nonlocal si
        ts = {}
        for kk in (k_lo, k_hi):
            f = jax.jit(make(kk, reorder))
            float(f(salts[si], o0, d0)); si += 1
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                float(f(salts[si], o0, d0)); si += 1
            ts[kk] = (time.perf_counter() - t0) / iters
        slope = (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)
        print(f"{name:24s} t{k_lo}={ts[k_lo]*1e3:8.1f}ms "
              f"t{k_hi}={ts[k_hi]*1e3:8.1f}ms  marginal={slope*1e3:8.2f} "
              f"ms/trace  ({slope/n*1e9:6.1f} ns/lane)", flush=True)

    modes = [("packet", lambda: None),
             ("stream", lambda: T.set_stream_mode("on")),
             ("divergent", lambda: T.set_divergent_mode("on")),
             ("xla", lambda: T.set_pallas_mode("off"))]

    for name, setup in modes:
        T.set_stream_mode("off" if name != "stream" else "on")
        T.set_divergent_mode("off" if name != "divergent" else "on")
        T.set_pallas_mode("auto" if name != "xla" else "off")
        setup()
        measure(f"closest/{name}", closest_loop)
    T.set_stream_mode("off"); T.set_divergent_mode("off")
    T.set_pallas_mode("auto")
    measure("closest/packet_nosort", closest_loop, reorder=False)
    measure("shadow/packet", shadow_loop)
    measure("shadow/packet_nosort", shadow_loop, reorder=False)
    T.set_stream_mode("on")
    measure("shadow/stream", shadow_loop)
    T.set_stream_mode("off")


if __name__ == "__main__":
    main()
