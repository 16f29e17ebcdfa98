"""Benchmark: traced ray segments / second on the current default device.

Baseline: the reference CPU renderer sustains ~2-3M ray segments/s with 16
OpenMP threads (derived from wall-times encoded in its golden-image
filenames; see BASELINE.md). We count the same unit of work — one scene
intersection query (closest-hit or shadow) — across the wavefront shade
tree and report segments/sec.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

from __future__ import annotations

import json
import time

import numpy as np

BASELINE_SEGMENTS_PER_SEC = 2.5e6  # reference 16-thread CPU midpoint


def _bench_scene():
    """The reference's compiled-in headline scene (proj12_backfaceTest.xml:
    Cornell box + glass teapot/pane/sphere — the scene behind the derived
    2.5M segs/s CPU baseline) with generated stand-in meshes; falls back to
    a built-in scene when the reference checkout is absent."""
    import os
    import subprocess
    import sys

    repo = os.path.dirname(os.path.abspath(__file__))
    ref_scene = "/root/reference/BHRayTracer/Resource/Data/proj12_backfaceTest.xml"
    if os.path.exists(ref_scene):
        assets = os.path.join(repo, "assets")
        if not os.path.exists(os.path.join(assets, "Resource", "Data", "teapot.obj")):
            subprocess.run([sys.executable, os.path.join(repo, "tools", "gen_assets.py"),
                            assets], check=True)
        from bhraytracer_tpu.scene.xml_loader import load_scene

        import warnings

        with warnings.catch_warnings():
            warnings.simplefilter("ignore")
            return load_scene(ref_scene, resource_root=assets)
    return _builtin_bench_scene()


def _builtin_bench_scene():
    """Fallback: tiny scene plus a teapot-class mesh."""
    import os
    import subprocess
    import sys

    import numpy as np

    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.obj_loader import load_obj

    from bhraytracer_tpu.scene.compile import compile_scene

    repo = os.path.dirname(os.path.abspath(__file__))
    teapot = os.path.join(repo, "assets", "Resource", "Data", "teapot.obj")
    if not os.path.exists(teapot):
        subprocess.run([sys.executable, os.path.join(repo, "tools", "gen_assets.py"),
                        os.path.join(repo, "assets")], check=True)

    sd = _tiny_scene_desc()
    mesh = load_obj(teapot)
    sd.meshes.append(mesh)
    t = D.Transform()
    t.scale(0.25, 0.25, 0.25)
    t.translate(np.array([0.0, 2.5, 0.0]))
    sd.nodes.append(D.NodeDesc(kind="mesh", name="teapot", transform=t,
                               material=0, mesh=len(sd.meshes) - 1))
    return compile_scene(sd), sd.camera


def _tiny_scene_desc():
    """SceneDesc variant of __graft_entry__._tiny_scene."""
    import numpy as np

    from bhraytracer_tpu.scene import desc as D

    sd = D.SceneDesc()
    red = D.MaterialDesc(name="red")
    red.diffuse = D.TexturedColorDesc(color=np.array([0.8, 0.2, 0.2]))
    red.specular = D.TexturedColorDesc(color=np.array([0.5, 0.5, 0.5]))
    red.glossiness = 20.0
    glass = D.MaterialDesc(name="glass")
    glass.diffuse = D.TexturedColorDesc(color=np.zeros(3))
    glass.specular = D.TexturedColorDesc(color=np.array([0.1, 0.1, 0.1]))
    glass.glossiness = 100.0
    glass.refraction = D.TexturedColorDesc(color=np.array([0.9, 0.9, 0.9]))
    glass.ior = 1.52
    white = D.MaterialDesc(name="white")
    white.diffuse = D.TexturedColorDesc(color=np.array([0.9, 0.9, 0.9]))
    white.specular = D.TexturedColorDesc(color=np.zeros(3))
    sd.materials += [red, glass, white]
    t1 = D.Transform(); t1.scale(1.5, 1.5, 1.5); t1.translate(np.array([-1.5, 0.0, 1.5]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="s1", transform=t1, material=0))
    t2 = D.Transform(); t2.translate(np.array([1.5, 0.0, 1.0]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="s2", transform=t2, material=1))
    t3 = D.Transform(); t3.scale(20.0, 20.0, 20.0)
    sd.nodes.append(D.NodeDesc(kind="plane", name="ground", transform=t3, material=2))
    sd.lights.append(D.LightDesc(kind="point", intensity=np.full(3, 50.0),
                                 position=np.array([4.0, -4.0, 8.0]), size=0.5))
    sd.lights.append(D.LightDesc(kind="direct", intensity=np.full(3, 0.3),
                                 direction=np.array([1.0, 0.5, -1.0]) / np.linalg.norm([1.0, 0.5, -1.0])))
    sd.background = D.TexturedColorDesc(color=np.array([0.1, 0.2, 0.3]))
    sd.environment = D.TexturedColorDesc(color=np.array([0.2, 0.2, 0.2]))
    cam = D.Camera()
    cam.pos = np.array([0.0, -8.0, 3.0])
    d = np.array([0.0, 8.0, -2.0]); cam.dir = d / np.linalg.norm(d)
    x = np.cross(cam.dir, np.array([0.0, 0.0, 1.0])); up = np.cross(x, cam.dir)
    cam.up = up / np.linalg.norm(up)
    cam.fov = 40.0
    cam.width, cam.height = 64, 48
    sd.camera = cam
    return sd


def main():
    import jax
    import jax.numpy as jnp

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_chunk_staged
    from bhraytracer_tpu.ops.camera import from_scene_camera

    pack, cam = _bench_scene()
    cam.width, cam.height = 800, 600
    cfg = RenderConfig(
        spp=1,
        gi_bounces=3,
        extra_refr_levels=2,
        tir_bounces=16,
        chunk_rays=65536,
        texture_sample_count=1,
    )
    cam_p = from_scene_camera(cam)

    n = cfg.chunk_rays
    idx = np.arange(n)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)

    key = jax.random.PRNGKey(0)

    def run(i):
        acc = jnp.zeros((n, 3))
        zb = jnp.full((n,), 1e30)
        return render_chunk_staged(
            pack, cfg, cam_p, cam.width, cam.height, px, py,
            jax.random.fold_in(key, i), None, acc, zb, True,
        )

    jax.block_until_ready(run(0))  # compile all stages

    iters = 10
    t0 = time.perf_counter()
    out = None
    for i in range(iters):
        out = run(i + 1)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    # Segments per camera lane: per tree level, each task lane issues one
    # closest-hit and one shadow query (refraction-chain iterations add more;
    # not counted — conservative).
    total_lanes = sum(cfg.level_sizes(n))
    segments = total_lanes * iters * 2
    segs_per_sec = segments / dt

    print(
        json.dumps(
            {
                "metric": "ray_segments_per_sec",
                "value": round(segs_per_sec),
                "unit": "segments/s",
                "vs_baseline": round(segs_per_sec / BASELINE_SEGMENTS_PER_SEC, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
