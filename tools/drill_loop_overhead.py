"""Drill: does lax.fori_loop carry a large fixed per-iteration cost here?

tools/drill_roofline.py measured ~430-530 us PER LOOP ITERATION regardless
of body (copy == 16-deep fma == rsqrt), i.e. 23.9 GB/s effective on a chip
with ~800 GB/s HBM. If the cost is per-iteration overhead (not work), the
integrator - which is built on lax.while_loop / scan / fori_loop - pays a
structural tax proportional to total trip counts, and flattening/unrolling
loops is a first-order lever.

Method: identical total work (K applications of y = y*a + b on (N,) f32),
three ways inside one jit:
  loop     lax.fori_loop(0, K, body)
  unroll   K Python-unrolled applications (static chain)
  scan     lax.scan over K dummy xs
Sweep K to fit cost = fixed + K * marginal.

Usage: python tools/drill_loop_overhead.py [--n 1572864]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1572864)
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n = args.n
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    np.asarray(jnp.zeros((1,)) + 1)  # eager flip

    key = jax.random.PRNGKey(0)
    x = jax.random.uniform(key, (n,)) + 0.5
    a = jax.random.uniform(jax.random.fold_in(key, 1), (n,)) * 0.1 + 0.9
    b = jax.random.uniform(jax.random.fold_in(key, 2), (n,)) * 0.01
    salts = jnp.arange(64, dtype=jnp.int32)

    def step(y):
        return y * a + b

    def make_loop(kk):
        def run(s, y0):
            y0 = y0 + s.astype(jnp.float32) * 0.0
            return jnp.sum(jax.lax.fori_loop(0, kk, lambda i, y: step(y), y0))
        return run

    def make_unroll(kk):
        def run(s, y0):
            y = y0 + s.astype(jnp.float32) * 0.0
            for _ in range(kk):
                y = step(y)
            return jnp.sum(y)
        return run

    def make_scan(kk):
        def run(s, y0):
            y0 = y0 + s.astype(jnp.float32) * 0.0
            out, _ = jax.lax.scan(lambda y, _: (step(y), None), y0,
                                  None, length=kk)
            return jnp.sum(out)
        return run

    si = 0
    for name, make in (("loop", make_loop), ("unroll", make_unroll),
                       ("scan", make_scan)):
        for kk in (8, 32, 128):
            f = jax.jit(make(kk))
            float(f(salts[si], x)); si += 1  # compile+warm
            iters = 4
            t0 = time.perf_counter()
            for _ in range(iters):
                float(f(salts[si], x)); si += 1
            dt_call = (time.perf_counter() - t0) / iters
            print(f"{name:7s} K={kk:4d}  {dt_call*1e3:9.3f} ms/call  "
                  f"{dt_call/kk*1e6:8.1f} us/step", flush=True)


if __name__ == "__main__":
    main()
