"""Drill: cost of the coherence-reorder sort at 480K lanes, and cheaper
variants.

The 480K fused ablation (round 4) puts trace at ~385ms of the 601ms chunk,
and every reordered trace pays an argsort over ~N lanes plus a gather of
(N,3) rays and a scatter/gather back of hit fields. The sort key is only 9
bits (octant*64+cell), so comparison argsort may be far from optimal.

Variants (K-loop slopes, floor-subtracted via two K points):
  argsort_stable    jnp.argsort(key, stable=True)   (current production)
  argsort_unstable  jnp.argsort(key, stable=False)
  packed_u32        sort one u32 = key<<20 | iota   (perm = low 20 bits)
  sort_kv           lax.sort_key_val(key, iota)
  perm_apply        gather o,d (N,3) through a fixed perm + inverse scatter
                    of a hit-sized payload (the non-sort half of reorder)

All salted per call; in-program slopes under-read layout-conversion costs,
so treat as lower bounds and confirm winners at image level.

Usage: python tools/drill_sort480.py [--n 480000]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=480000)
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
    keys0 = jax.random.randint(key, (n,), 0, 512)
    o = jax.random.uniform(jax.random.fold_in(key, 1), (n, 3))
    d = jax.random.uniform(jax.random.fold_in(key, 2), (n, 3))
    perm0 = jax.random.permutation(jax.random.fold_in(key, 3), n)
    salts = jnp.arange(256, dtype=jnp.int32)
    iota = jnp.arange(n, dtype=jnp.int32)

    def body_argsort_stable(i, c):
        k = (keys0 + i + c[:1].astype(jnp.int32)) & 511
        p = jnp.argsort(k, stable=True)
        return c + p[:8].astype(jnp.float32)

    def body_argsort_unstable(i, c):
        k = (keys0 + i + c[:1].astype(jnp.int32)) & 511
        p = jnp.argsort(k, stable=False)
        return c + p[:8].astype(jnp.float32)

    def body_packed(i, c):
        k = (keys0 + i + c[:1].astype(jnp.int32)) & 511
        packed = (k.astype(jnp.uint32) << 20) | iota.astype(jnp.uint32)
        s = jnp.sort(packed)
        p = (s & jnp.uint32((1 << 20) - 1)).astype(jnp.int32)
        return c + p[:8].astype(jnp.float32)

    def body_sort_kv(i, c):
        k = (keys0 + i + c[:1].astype(jnp.int32)) & 511
        _, p = jax.lax.sort_key_val(k, iota)
        return c + p[:8].astype(jnp.float32)

    def body_perm_apply(i, c):
        # fixed perm: gather rays, fake 'trace' (one fma), scatter hit back
        oo = o[perm0] + c[:1] * 0.0
        dd = d[perm0]
        t = jnp.sum(oo * dd, axis=1)
        back = jnp.zeros((n,), jnp.float32).at[perm0].set(t)
        return c + back[:8]

    cases = [
        ("argsort_stable", body_argsort_stable),
        ("argsort_unstable", body_argsort_unstable),
        ("packed_u32", body_packed),
        ("sort_kv", body_sort_kv),
        ("perm_apply", body_perm_apply),
    ]
    si = 0
    c0 = jnp.zeros((8,), jnp.float32)
    for name, body in cases:
        ts = {}
        for kk in (8, 32):
            def run(s, kk=kk, body=body):
                c = c0 + s.astype(jnp.float32) * 1e-9
                return jnp.sum(jax.lax.fori_loop(0, kk, body, c))
            f = jax.jit(run)
            float(f(salts[si])); si += 1
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                float(f(salts[si])); si += 1
            ts[kk] = (time.perf_counter() - t0) / iters
        slope = (ts[32] - ts[8]) / 24
        print(f"{name:17s} t8={ts[8]*1e3:8.1f}ms t32={ts[32]*1e3:8.1f}ms "
              f"marginal={slope*1e3:8.2f} ms/op", flush=True)


if __name__ == "__main__":
    main()
