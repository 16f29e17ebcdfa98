"""Drill: incoherent per-lane trace cost on a BIG mesh (teapot_hires,
~112K faces) vs the 1,408-face headline teapot.

The bundled scenes top out at 1,408 faces, where the O(F) stream kernel
wins by 5x; a 112K-face mesh exceeds the packet kernel's VMEM budget, so
compile_scene builds the treelet-streamed layout (accel/bvh.py) — this
measures that path's true cost (K-slope, floor-free) and the XLA
while_loop fallback, plus the small-mesh numbers for the crossover.

Usage: python tools/drill_bigmesh.py [--rays 589824] [--ks 2,6]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _mesh_pack(root: str, obj: str):
    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene
    from bhraytracer_tpu.scene.obj_loader import load_obj

    sd = D.SceneDesc()
    sd.materials.append(D.MaterialDesc(name="m"))
    sd.meshes.append(load_obj(os.path.join(root, "Resource", "Data", obj)))
    sd.nodes.append(D.NodeDesc(kind="mesh", name="t", transform=D.Transform(),
                               material=0, mesh=0))
    return compile_scene(sd)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--rays", type=int, default=589824)
    ap.add_argument("--ks", default="2,6")
    ap.add_argument("--meshes", default="teapot.obj,teapot_hires.obj")
    args = ap.parse_args()
    k_lo, k_hi = (int(x) for x in args.ks.split(","))

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bhraytracer_tpu.ops import trace as T

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    root = os.path.join(repo, "assets")
    if not os.path.exists(os.path.join(root, "Resource", "Data",
                                       "teapot_hires.obj")):
        import subprocess
        subprocess.run([sys.executable,
                        os.path.join(repo, "tools", "gen_assets.py"),
                        root, "--big"], check=True)

    n = args.rays
    print(f"backend={jax.default_backend()} rays={n}", flush=True)
    np.asarray(jnp.zeros((1,)) + 1)  # eager flip
    key = jax.random.PRNGKey(0)
    salts = jnp.arange(64, dtype=jnp.int32)
    si = [0]

    def measure(name, pack, reorder=True, shadow=False):
        bmin = np.asarray(pack.bvh_bmin[0]) - 2.0
        bmax = np.asarray(pack.bvh_bmax[0]) + 2.0
        o0 = (jax.random.uniform(key, (n, 3))
              * jnp.asarray(bmax - bmin) + jnp.asarray(bmin))
        tgt = (jax.random.uniform(jax.random.fold_in(key, 1), (n, 3))
               * jnp.asarray(bmax - bmin) + jnp.asarray(bmin))
        d0 = tgt - o0
        tmax = jnp.ones((n,)) * 3.0

        def make(kk):
            def run(s, o, d):
                o = o + s.astype(jnp.float32) * 1e-9

                def body(i, c):
                    oo, acc = c
                    if shadow:
                        occ = T.trace_shadow(pack, oo, d, tmax, 1e-4,
                                             reorder=reorder)
                        oo = oo + occ[:, None] * 1e-7
                        return oo, acc + jnp.sum(occ)
                    h = T.trace_closest(pack, oo, d, "front", reorder=reorder)
                    oo = oo + (h.t[:, None] % 1.0) * 1e-6
                    return oo, acc + jnp.sum(h.t % 7.0)

                _, acc = jax.lax.fori_loop(0, kk, body, (o, jnp.zeros(())))
                return acc
            return run

        ts = {}
        for kk in (k_lo, k_hi):
            f = jax.jit(make(kk))
            float(f(salts[si[0]], o0, d0)); si[0] += 1
            iters = 3
            t0 = time.perf_counter()
            for _ in range(iters):
                float(f(salts[si[0]], o0, d0)); si[0] += 1
            ts[kk] = (time.perf_counter() - t0) / iters
        slope = (ts[k_hi] - ts[k_lo]) / (k_hi - k_lo)
        print(f"{name:36s} marginal={slope*1e3:9.2f} ms/trace "
              f"({slope/n*1e9:7.1f} ns/lane)", flush=True)

    for obj in args.meshes.split(","):
        pack = _mesh_pack(root, obj)
        nf = int(pack.pallas_faces.shape[0]) if pack.pallas_faces is not None \
            else pack.face_v.shape[0]
        from bhraytracer_tpu.ops.pallas_stream import stream_traversable
        print(f"--- {obj}: {pack.face_v.shape[0]} faces, treelets="
              f"{len(pack.treelets)}, stream_ok={stream_traversable(pack)}",
              flush=True)
        # default routing (stream if gated in, else packet/treelet)
        measure(f"{obj}/closest/default", pack)
        measure(f"{obj}/shadow/default", pack, shadow=True)
        # packet/treelet explicitly
        T.set_stream_mode("off")
        try:
            measure(f"{obj}/closest/packet", pack)
            measure(f"{obj}/shadow/packet", pack, shadow=True)
        finally:
            T.set_stream_mode("on")
        # XLA fallback (the oracle; expensive on big meshes)
        if "--xla" in sys.argv:
            T.set_pallas_mode("off")
            try:
                measure(f"{obj}/closest/xla", pack)
            finally:
                T.set_pallas_mode("auto")


if __name__ == "__main__":
    main()
