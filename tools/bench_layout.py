"""Measure the cost of the (N,3) minor-dim layout on TPU.

XLA:TPU tiles the two minor dims of every buffer to (8 sublanes, 128
lanes). An (N,3) f32 array therefore occupies 3/128 of each vector
register and (if padded in HBM) up to 42x its logical bytes at every
fusion boundary. The integrator stores every point/direction/color as
(N,3) — if the padding tax is real, an SoA (3,N) refactor is the single
biggest perf lever available.

Method: digest-slope timing (round-3 ledger: flip eager first, perturb
inputs via a carried scalar so the replay cache can't serve, fetch one
scalar, difference two loop lengths). Each variant runs the same chain of
C elementwise vec3 ops (mul/add/where/normalize-ish) over N lanes.

Usage: python tools/bench_layout.py [--n 98304] [--ops 24] [--iters 12]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=98304)
    ap.add_argument("--ops", type=int, default=24)
    ap.add_argument("--iters", type=int, default=12)
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n, C = args.n, args.ops
    rng = np.random.default_rng(0)

    def chain_aos(a, b, s):
        # a, b: (N,3). A chain of dependent vec3 ops with a fusion barrier
        # (optimization_barrier) every 4 ops to mimic the integrator's
        # fusion boundaries.
        x = a + s
        for i in range(C):
            x = jnp.where((x[:, 0:1] > 0), x * b + a, x - b)
            if i % 4 == 3:
                x = jax.lax.optimization_barrier(x)
        return jnp.sum(x)

    def chain_soa(a, b, s):
        # a, b: (3,N) — same math, minor dim is N (128-aligned).
        x = a + s
        for i in range(C):
            x = jnp.where((x[0:1, :] > 0), x * b + a, x - b)
            if i % 4 == 3:
                x = jax.lax.optimization_barrier(x)
        return jnp.sum(x)

    def chain_flat(a, b, s):
        # a, b: (N,) — one component only, x3 chains to match work.
        outs = []
        for _ in range(3):
            x = a + s
            for i in range(C):
                x = jnp.where(x > 0, x * b + a, x - b)
                if i % 4 == 3:
                    x = jax.lax.optimization_barrier(x)
            outs.append(jnp.sum(x))
            s = s + 1.0
        return outs[0] + outs[1] + outs[2]

    a3 = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    b3 = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    a3t = a3.T.copy()
    b3t = b3.T.copy()
    a1 = a3[:, 0].copy()
    b1 = b3[:, 0].copy()

    np.asarray(jnp.zeros((1,)) + 1.0)  # flip eager

    def slope(name, fn, a, b):
        # In-program repetition: ONE dispatch runs the chain K times via
        # fori_loop (carried digest feeds the next trip's perturbation so
        # trips can't be folded); slope across two static K values cancels
        # the dispatch+fetch RTT entirely.
        def loop(k_static, s0):
            def body(i, acc):
                return acc + fn(a, b, s0 + acc * 1e-12
                                + jnp.float32(i) * 1e-6)

            return jax.lax.fori_loop(0, k_static, body, jnp.zeros(()))

        k1, k2 = max(2, args.iters // 2), args.iters * 2
        g1 = jax.jit(lambda s: loop(k1, s))
        g2 = jax.jit(lambda s: loop(k2, s))
        float(g1(jnp.float32(0.5)))
        float(g2(jnp.float32(0.5)))  # compiles done

        def run(g, s):
            t0 = time.time()
            float(g(jnp.float32(s)))
            return time.time() - t0

        t1 = min(run(g1, 0.1), run(g1, 0.2), run(g1, 0.3))
        t2 = min(run(g2, 0.1), run(g2, 0.2), run(g2, 0.3))
        ms = (t2 - t1) / (k2 - k1) * 1e3
        print(f"{name:10s} {ms:8.3f} ms/iter  ({C} vec3 ops x {n} lanes) "
              f"on {jax.default_backend()}", flush=True)
        return ms

    m_aos = slope("aos (N,3)", chain_aos, a3, b3)
    m_soa = slope("soa (3,N)", chain_soa, a3t, b3t)
    m_flat = slope("flat (N,)x3", chain_flat, a1, b1)
    print(f"aos/soa = {m_aos / max(m_soa, 1e-9):.1f}x   "
          f"aos/flat = {m_aos / max(m_flat, 1e-9):.1f}x")


if __name__ == "__main__":
    main()
