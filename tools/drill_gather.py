"""Microbenchmark gather strategies on the current device.

resolve_hit is gather-bound on TPU (drill_resolve: mesh branch 11.2ms,
plane 5.9ms at 102K lanes). This measures the alternatives XLA gives us:
  - jnp.take from tables of various sizes
  - one-hot matmul (MXU) for small tables
so the resolve redesign targets measured numbers.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def timeit(fn, *args, iters=50, warmup=3):
    import jax

    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=102400)
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

    n = args.n
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0].platform} n={n}", flush=True)

    for size in (4, 64, 1024, 8192, 65536):
        tab = jnp.asarray(rng.random((size, 3)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, size, n), jnp.int32)
        dt = timeit(jax.jit(lambda t, i: t[i]), tab, idx)
        print(f"take      (tab {size:6d},3)        {dt*1e3:8.3f} ms", flush=True)

    for size in (4, 16, 64, 256):
        tab = jnp.asarray(rng.random((size, 9)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, size, n), jnp.int32)

        def onehot_mm(t, i, size=size):
            oh = jax.nn.one_hot(i, size, dtype=jnp.float32)
            return oh @ t

        dt = timeit(jax.jit(onehot_mm), tab, idx)
        print(f"onehot-mm (tab {size:6d},9)        {dt*1e3:8.3f} ms", flush=True)
        dt = timeit(jax.jit(lambda t, i: t[i]), tab, idx)
        print(f"take      (tab {size:6d},9)        {dt*1e3:8.3f} ms", flush=True)

    # 3x3 matrix gather the way resolve does it: (K,3,3)[idx]
    for size in (4, 64):
        tab = jnp.asarray(rng.random((size, 3, 3)), jnp.float32)
        idx = jnp.asarray(rng.integers(0, size, n), jnp.int32)
        dt = timeit(jax.jit(lambda t, i: t[i]), tab, idx)
        print(f"take      (tab {size:6d},3,3)      {dt*1e3:8.3f} ms", flush=True)

    # Chained: the mesh-branch pattern — face_v gather then 3 vert gathers.
    F, V = 8192, 4096
    face_v = jnp.asarray(rng.integers(0, V, (F, 3)), jnp.int32)
    verts = jnp.asarray(rng.random((V, 3)), jnp.float32)
    fi = jnp.asarray(rng.integers(0, F, n), jnp.int32)

    def mesh_gather(face_v, verts, fi):
        vi = face_v[fi]
        return verts[vi[:, 0]] + verts[vi[:, 1]] + verts[vi[:, 2]]

    dt = timeit(jax.jit(mesh_gather), face_v, verts, fi)
    print(f"mesh chain (F={F}, V={V})       {dt*1e3:8.3f} ms", flush=True)


if __name__ == "__main__":
    main()
