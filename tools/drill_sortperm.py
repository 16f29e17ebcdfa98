"""Drill: what do the reorder-fabric primitives cost on the TPU at
headline-bench widths?  argsort (bitonic), inverse_permutation (one
N-scatter), permutation gathers, and partition_indices — each timed with
the axon rules (eager flip first, distinct inputs per iteration, fetch
barrier inside the timed window; see CLAUDE.md round-3 ledger).

These are single serialized XLA ops that cannot fuse into neighbors, so
isolated timing is meaningful for them (unlike elementwise chains, whose
in-context cost is fusion-dependent — ledger caveat).

Usage: python tools/drill_sortperm.py [--n 480000] [--iters 5]
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
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bhraytracer_tpu.ops.compact import inverse_permutation, partition_indices

    n = args.n
    print(f"backend={jax.default_backend()} n={n}", flush=True)
    # Eager flip: one tiny fetch, so journaling mode never lies to us.
    np.asarray(jnp.zeros((1,)) + 1)

    # Keys shaped like the coherence sort's: ~577 distinct small ints.
    base_keys = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 577,
                                   dtype=jnp.int32)
    vals3 = jax.random.uniform(jax.random.PRNGKey(1), (n, 3))
    salts = jnp.arange(64, dtype=jnp.int32)

    def timed(name, fn, *xs):
        # fn must consume a per-iteration salt so the replay cache can't
        # serve repeats. The jitted wrapper reduces the output to ONE
        # scalar in-graph: fetching the full array would time the tunnel's
        # ~25MB/s bulk readback, not the op (first drill attempt read
        # 236ms for a (480K,3) gather — 5.7MB of fetch).
        # Full-array sum (not a slice): a slice would let XLA dead-code
        # most of the op; the sum consumes every element for ~one extra
        # pass over VMEM-resident data.
        f = jax.jit(lambda s, *a: jnp.sum(fn(s, *a).astype(jnp.float32)))
        float(f(salts[0], *xs))  # compile + warm
        t0 = time.perf_counter()
        outs = []
        for i in range(args.iters):
            outs.append(f(salts[i + 1], *xs))
        fetched = [np.asarray(o).ravel()[0] for o in outs]
        dt = (time.perf_counter() - t0) / args.iters
        print(f"{name:28s} {dt * 1e3:8.2f} ms", flush=True)
        return dt

    timed("argsort(keys)", lambda s, k: jnp.argsort(k + s * 0, stable=True),
          base_keys)
    timed("sort1d(keys)", lambda s, k: jnp.sort(k + s * 0), base_keys)
    perm = jnp.argsort(base_keys, stable=True)
    timed("inverse_permutation",
          lambda s, p: inverse_permutation(p + s * 0), perm)
    timed("gather (n,3)[perm]", lambda s, p, v: v[p + s * 0], perm, vals3)
    timed("scatter (n,3).at[perm]",
          lambda s, p, v: jnp.zeros_like(v).at[p + s * 0].set(v), perm, vals3)
    timed("partition_indices(mask,n/12)",
          lambda s, k: partition_indices((k + s * 0) < 48, max(128, n // 12)),
          base_keys)
    timed("cumsum i32", lambda s, k: jnp.cumsum(k + s * 0), base_keys)
    # The full reorder fabric as used per reordered trace:
    def fabric(s, k, v):
        order = jnp.argsort(k + s * 0, stable=True)
        inv = inverse_permutation(order)
        vs = v[order]
        return vs[inv]

    timed("fabric sort+inv+2gathers", fabric, base_keys, vals3)


if __name__ == "__main__":
    main()
