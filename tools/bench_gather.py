"""Clean gather-strategy micro-benchmark (run with the TPU otherwise idle —
concurrent TPU jobs poison every number).

Decides how the shading core fetches per-lane rows from small tables:
  A. N separate XLA gathers (current code: one per field)
  B. one XLA gather from a concatenated row table
  C. one-hot matmul (MXU) from a concatenated row table
  D. unrolled where-select (K compares, no gather at all)
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

    n = 65536
    rng = np.random.default_rng(0)

    def timeit(fn, *a, iters=100):
        out = fn(*a)
        jax.block_until_ready(out)
        best = 1e9
        for _ in range(5):
            t0 = time.perf_counter()
            for _ in range(iters):
                out = fn(*a)
            jax.block_until_ready(out)
            best = min(best, (time.perf_counter() - t0) / iters)
        return best

    print(f"device={jax.devices()[0].platform} n={n}", flush=True)
    for K, F in ((4, 24), (16, 24), (64, 32)):
        ids = jnp.asarray(rng.integers(0, K, n), jnp.int32)
        tab = jnp.asarray(rng.random((K, F)), jnp.float32)

        def many(ids_, tab_):
            return [tab_[ids_, j] for j in range(F)]

        def one(ids_, tab_):
            return tab_[ids_]

        def onehot(ids_, tab_):
            oh = (ids_[:, None] == jnp.arange(K)[None, :]).astype(jnp.float32)
            return oh @ tab_

        def select(ids_, tab_):
            out = jnp.broadcast_to(tab_[0], (n, F))
            for k in range(1, K):
                out = jnp.where((ids_ == k)[:, None], tab_[k], out)
            return out

        r = {}
        r["B one gather"] = timeit(jax.jit(one), ids, tab)
        r["C one-hot matmul"] = timeit(jax.jit(onehot), ids, tab)
        r["D unrolled select"] = timeit(jax.jit(select), ids, tab)
        if K <= 16:
            r["A field gathers"] = timeit(jax.jit(many), ids, tab)
        for name, dt in sorted(r.items()):
            print(f"K={K:3d} F={F:2d} {name:20s} {dt * 1e3:8.3f} ms", flush=True)

    # big table (mesh verts class): gather (V,3) vs packed (F,32) row gather
    V = 8192
    vids = jnp.asarray(rng.integers(0, V, n), jnp.int32)
    verts = jnp.asarray(rng.random((V, 3)), jnp.float32)
    rows32 = jnp.asarray(rng.random((V, 32)), jnp.float32)
    rows16 = jnp.asarray(rng.random((V, 16)), jnp.float32)
    print("big gather (8192,3) x13 ",
          timeit(jax.jit(lambda i_, t_: [t_[i_] for _ in range(13)]), vids, verts) * 1e3,
          flush=True)
    print("big gather (8192,3) x1  ",
          timeit(jax.jit(lambda i_, t_: t_[i_]), vids, verts) * 1e3, flush=True)
    print("big gather (8192,16) x1 ",
          timeit(jax.jit(lambda i_, t_: t_[i_]), vids, rows16) * 1e3, flush=True)
    print("big gather (8192,32) x1 ",
          timeit(jax.jit(lambda i_, t_: t_[i_]), vids, rows32) * 1e3, flush=True)
    # argsort for scale reference
    keys = jnp.asarray(rng.random(n), jnp.float32)
    print("argsort 65K             ",
          timeit(jax.jit(lambda k_: jnp.argsort(k_)), keys) * 1e3, flush=True)
    # elementwise floor
    x = jnp.asarray(rng.random((n, 3)), jnp.float32)

    def ew(x_):
        y = x_
        for _ in range(30):
            y = y * 1.0001 + x_
        return y

    print("30-op elementwise (N,3) ", timeit(jax.jit(ew), x) * 1e3, flush=True)


if __name__ == "__main__":
    main()
