"""Drill: practical VPU/HBM roofline under this XLA/axon stack.

The integrator runs ~100x off naive f32-peak arithmetic; tools/drill_vec3.py
showed layout ((N,3) AoS vs SoA vs (3,N)) is NOT the reason (all within 10%
on TPU, 480K lanes). This drill measures what simple primitive chains can
actually sustain here, to calibrate how much headroom image-level numbers
really have:

  copy    y = x + c                      -> effective GB/s (HBM ceiling)
  fma     y = y*a + b  (depth D in-body) -> GFLOP/s (VPU ceiling)
  rsqrt   y = 1/sqrt(y + c)              -> G-transcendental/s
  powx    y = (y+c)**5 via safe chain    -> Schlick-style pow cost
  gather  y = t[idx] (64K table)         -> G-gather/s (VMEM/serial gathers)

All loops are K-deep fori_loop with data-dependent carries (nothing folds),
inputs salted per call (axon replay cache serves identical calls from
cache), eager flip before timing (journal mode), floats fetched inside the
window. Per the round-3 ledger, in-program slopes under-read in-context
costs; use these as CEILINGS, not attributions.

Usage: python tools/drill_roofline.py [--n 1572864] [--k 64] [--depth 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1572864)  # 1.5M f32 = 6MB
    ap.add_argument("--k", type=int, default=64)
    ap.add_argument("--depth", type=int, default=16)
    ap.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n, k, depth = args.n, args.k, args.depth
    dt = jnp.float32 if args.dtype == "f32" else jnp.bfloat16
    dsize = 4 if args.dtype == "f32" else 2
    print(f"backend={jax.default_backend()} n={n} k={k} depth={depth} "
          f"dtype={args.dtype}", flush=True)
    np.asarray(jnp.zeros((1,)) + 1)  # eager flip

    key = jax.random.PRNGKey(0)
    x = (jax.random.uniform(key, (n,)) + 0.5).astype(dt)
    a = (jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 0.1 + 0.9).astype(dt)
    b = (jax.random.uniform(jax.random.fold_in(key, 2), (n,)) * 0.01).astype(dt)
    tab = jax.random.uniform(jax.random.fold_in(key, 3), (65536,)).astype(dt)
    idx0 = jax.random.randint(jax.random.fold_in(key, 4), (n,), 0, 65536)
    salts = jnp.arange(32, dtype=jnp.int32)

    def loop(body):
        def run(s, y0):
            y0 = y0 + s.astype(dt) * dt(0)
            return jnp.sum(jax.lax.fori_loop(0, k, body, y0)
                           .astype(jnp.float32))
        return run

    def copy_body(i, y):
        return y + dt(1e-7)

    def fma_body(i, y):
        for _ in range(depth):
            y = y * a + b
        return y

    def rsqrt_body(i, y):
        return 1.0 / jnp.sqrt(y + dt(1.0))

    def pow_body(i, y):
        c = jnp.clip(y, 0.0, 1.0)
        return dt(0.04) + dt(0.96) * (dt(1.0) - c) ** dt(5.0)

    def gather_body(i, y):
        ix = (idx0 + i) & 65535
        return y * dt(0.5) + tab[ix]

    cases = [
        ("copy", copy_body, ("GB/s", lambda dt_s: 2 * n * dsize / dt_s / 1e9)),
        ("fma", fma_body, ("GFLOP/s", lambda dt_s: 2 * depth * n / dt_s / 1e9)),
        ("rsqrt", rsqrt_body, ("Gtrans/s", lambda dt_s: n / dt_s / 1e9)),
        ("powx", pow_body, ("Gpow/s", lambda dt_s: n / dt_s / 1e9)),
        ("gather", gather_body, ("Ggather/s", lambda dt_s: n / dt_s / 1e9)),
    ]
    for name, body, (unit, rate) in cases:
        f = jax.jit(loop(body))
        float(f(salts[0], x))  # compile+warm
        iters = 5
        t0 = time.perf_counter()
        vals = [float(f(salts[i + 1], x)) for i in range(iters)]
        dt_call = (time.perf_counter() - t0) / iters
        per_iter = dt_call / k
        print(f"{name:8s} {dt_call*1e3:8.2f} ms/call {per_iter*1e6:8.1f} "
              f"us/iter  {rate(per_iter):10.1f} {unit}", flush=True)


if __name__ == "__main__":
    main()
