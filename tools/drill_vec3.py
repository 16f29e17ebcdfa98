"""Drill: does the (N,3) array-of-vec3 layout starve TPU lanes?

Most of the integrator's math is vec3 arithmetic on (N,3) f32 arrays. If
XLA:TPU tiles those with the size-3 minor dim on the 128-lane axis, every
elementwise op runs at 3/128 lane occupancy — a ~40x systematic waste that
would explain the shading core sitting far off roofline. If instead XLA
flattens/bitcasts elementwise chains, AoS ~= SoA and the layout is fine.

Method: K-iteration fori_loop slopes (amplified, data-dependent across
iterations so nothing folds) of a representative shading snippet —
normalize, dot, cross, a Schlick pow — in three layouts:
  aos:   (N,3) arrays, axis-1 reductions
  soa:   three (N,) arrays
  aosT:  (3,N) arrays, axis-0 reductions (N on lanes by construction)
Slopes under-read absolute in-context costs (round-3 ledger) but the
RELATIVE comparison at equal arithmetic is meaningful.

Usage: python tools/drill_vec3.py [--n 480000] [--k 64]
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
    ap.add_argument("--k", type=int, default=64)
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    n, k = args.n, args.k
    print(f"backend={jax.default_backend()} n={n} k={k}", flush=True)
    np.asarray(jnp.zeros((1,)) + 1)  # eager flip

    key = jax.random.PRNGKey(0)
    a3 = jax.random.uniform(key, (n, 3)) + 0.5
    b3 = jax.random.uniform(jax.random.fold_in(key, 1), (n, 3)) + 0.5
    salts = jnp.arange(32, dtype=jnp.int32)

    def snippet_aos(a, b):
        # normalize + dot + cross + Schlick-ish pow: ~the shading mix.
        an = a / jnp.sqrt(jnp.sum(a * a, 1, keepdims=True) + 1e-9)
        c = jnp.sum(an * b, 1)
        cr = jnp.cross(an, b)
        f = 0.04 + 0.96 * (1.0 - jnp.clip(c, 0.0, 1.0)) ** 5
        return cr * f[:, None] + an * c[:, None]

    def snippet_soa(ax, ay, az, bx, by, bz):
        il = 1.0 / jnp.sqrt(ax * ax + ay * ay + az * az + 1e-9)
        ax, ay, az = ax * il, ay * il, az * il
        c = ax * bx + ay * by + az * bz
        cx = ay * bz - az * by
        cy = az * bx - ax * bz
        cz = ax * by - ay * bx
        f = 0.04 + 0.96 * (1.0 - jnp.clip(c, 0.0, 1.0)) ** 5
        return (cx * f + ax * c, cy * f + ay * c, cz * f + az * c)

    def run_aos(s, a, b):
        def body(i, x):
            return snippet_aos(x + s * 0.0, b)

        return jnp.sum(jax.lax.fori_loop(0, k, body, a))

    def run_soa(s, a, b):
        comps = tuple(a[:, i] for i in range(3)) + tuple(b[:, i] for i in range(3))

        def body(i, xs):
            return snippet_soa(*(xs + (comps[3] + s * 0.0, comps[4], comps[5])))

        out = jax.lax.fori_loop(0, k, body, comps[:3])
        return sum(jnp.sum(o) for o in out)

    def run_aos_t(s, a, b):
        at, bt = a.T, b.T  # (3, N): N on the minor axis

        def body(i, x):
            an = x / jnp.sqrt(jnp.sum(x * x, 0, keepdims=True) + 1e-9)
            c = jnp.sum(an * bt, 0)
            cr = jnp.cross(an, bt, axis=0)
            f = 0.04 + 0.96 * (1.0 - jnp.clip(c, 0.0, 1.0)) ** 5
            return cr * f[None, :] + an * c[None, :] + s * 0.0

        return jnp.sum(jax.lax.fori_loop(0, k, body, at))

    for name, fn in (("aos (N,3)", run_aos), ("soa 3x(N,)", run_soa),
                     ("aosT (3,N)", run_aos_t)):
        f = jax.jit(fn)
        float(f(salts[0], a3, b3))  # compile+warm
        iters = 5
        t0 = time.perf_counter()
        outs = [f(salts[i + 1], a3, b3) for i in range(iters)]
        vals = [float(o) for o in outs]
        dt = (time.perf_counter() - t0) / iters
        per_iter = dt / k
        print(f"{name:12s} {dt*1e3:8.2f} ms/call  {per_iter*1e6:8.1f} us/loop-iter",
              flush=True)


if __name__ == "__main__":
    main()
