"""Validate TPU renders against the CPU (jnp) path pixel-for-pixel.

The kernels (packet BVH, treelet streaming, fused shade) run compiled on
TPU only; tests exercise them in interpreter mode on CPU, which shares
numerics with jnp but NOT the Mosaic compile path. After any perf jump,
run this on hardware before believing the number (round-1 lesson: a 108M
reading came from inward-wound meshes making every trace miss).

Renders the bench scene (proj12_backfaceTest + stand-in assets) at low res
on the default device, then forces CPU and renders the same chunk, and
reports max|diff| both in linear radiance and in the 8-bit image.

Usage: python tools/validate_tpu.py [--width 200] [--height 150]
Exit code 1 when the 8-bit images differ by more than --tol levels.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _render(pack, cam, cfg, dev, max_chunks=None, seed=0):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from bhraytracer_tpu.models.pathtracer import render_chunk_staged
    from bhraytracer_tpu.ops.camera import from_scene_camera

    cam_p = from_scene_camera(cam)
    n = cfg.chunk_rays
    total = cam.width * cam.height
    key = jax.random.PRNGKey(seed)
    if max_chunks is not None:
        total = min(total, max_chunks * n)
    acc_np = np.zeros((total, 3), np.float64)
    with jax.default_device(dev):
        for start in range(0, total, n):
            idx = np.minimum(np.arange(start, start + n), total - 1)
            px = jnp.asarray(idx % cam.width, jnp.int32)
            py = jnp.asarray(idx // cam.width, jnp.int32)
            acc = jnp.zeros((n, 3))
            zb = jnp.full((n,), 1e30)
            ck = jax.random.fold_in(key, start)
            out = render_chunk_staged(pack, cfg, cam_p, cam.width,
                                      cam.height, px, py, ck, None,
                                      acc, zb, True)
            colors = np.asarray(out[0])
            m = min(n, total - start)
            acc_np[start:start + m] = colors[:m]
    return acc_np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=800)
    ap.add_argument("--height", type=int, default=600)
    ap.add_argument("--chunks", type=int, default=1,
                    help="limit to the first N 65536-lane chunks "
                         "(keeps the CPU leg tractable; defaults match "
                         "the headline bench's cached TPU shapes)")
    ap.add_argument("--tol", type=int, default=1,
                    help="max 8-bit level difference allowed")
    ap.add_argument("--scene", default=None)
    args = ap.parse_args()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    import jax
    import numpy as np

    import bench
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import image_to_u8
    from bhraytracer_tpu.ops import trace as T
    from bhraytracer_tpu.ops.pallas_shade import probe_shade_kernel

    def linear_to_u8(lin):
        return image_to_u8(np.power(np.maximum(lin, 0.0), 1.0 / 2.2))

    pack, cam = bench._bench_scene()
    cam.width, cam.height = args.width, args.height
    # EXACTLY the headline bench config: reuses its cached TPU compiles.
    cfg = RenderConfig(spp=1, gi_bounces=3, extra_refr_levels=2,
                       tir_bounces=16, chunk_rays=65536,
                       texture_sample_count=1, refr_capacity=0.08)

    dev = jax.devices()[0]
    if jax.default_backend() == "tpu":
        T.probe_trace_kernels(pack)
        probe_shade_kernel(pack, cfg)
    else:
        # On a CPU-only host the "device" leg also runs the XLA path
        # (pallas auto-mode disables off-TPU), so both renders are
        # identical and OK would validate nothing.
        print("ERROR: default backend is not TPU; this run would compare "
              "the XLA path against itself. Refusing to print a "
              "vacuous VALIDATION OK.", file=sys.stderr)
        sys.exit(2)
    img_dev = _render(pack, cam, cfg, dev, args.chunks)
    backend = jax.default_backend()

    cpu = jax.devices("cpu")[0]
    T.set_pallas_mode("off")
    img_cpu = _render(pack, cam, cfg, cpu, args.chunks)
    # Noise yardstick: the same CPU render with a different seed. Device
    # numerics may flip a sample path here and there (kernel-vs-XLA t
    # tie-breaks on glass); that is acceptable iff the resulting image
    # distance is well under ordinary 1-spp sampling noise.
    img_cpu1 = _render(pack, cam, cfg, cpu, args.chunks, seed=1)

    lin = np.abs(img_dev - img_cpu)
    u8_dev = np.asarray(linear_to_u8(img_dev))
    u8_cpu = np.asarray(linear_to_u8(img_cpu))
    du8 = np.abs(u8_dev.astype(int) - u8_cpu.astype(int))
    n_diff = int((du8 > args.tol).sum())
    du8_seed = np.abs(np.asarray(linear_to_u8(img_cpu1)).astype(int)
                      - u8_cpu.astype(int))
    n_seed = int((du8_seed > args.tol).sum())
    print(f"backend={backend} res={args.width}x{args.height}")
    print(f"linear max|diff|={lin.max():.3e} mean={lin.mean():.3e}")
    print(f"u8 max|diff|={du8.max()} pixels>{args.tol}: {n_diff} "
          f"/ {du8.size} (seed-noise yardstick: {n_seed})")
    # Brightness sanity: a kernel that silently misses everything makes the
    # device image darker, not noisier.
    print(f"mean radiance dev={img_dev.mean():.4f} cpu={img_cpu.mean():.4f} "
          f"cpu-seed1={img_cpu1.mean():.4f}")
    mean_tol = 3.0 * abs(img_cpu1.mean() - img_cpu.mean()) + 1e-4
    # Floor scales with image size (a localized single-tile bug in a 65536-
    # pixel chunk must not hide under a fixed 64-pixel allowance), and when
    # seed noise is nonzero the allowance is a fraction of it.
    floor = max(du8.size // 4096, 16)
    ok = (n_diff <= max(n_seed // 4, floor)
          and abs(img_dev.mean() - img_cpu.mean()) <= mean_tol)
    if not ok:
        print("VALIDATION FAILED")
        sys.exit(1)
    print("VALIDATION OK (device diffs well under sampling noise)")


if __name__ == "__main__":
    main()
