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
import os
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


def _flip_eager():
    """Force the tunneled client into eager (post-first-readback) execution
    mode before timing anything. Before a process's first device->host
    readback the client only JOURNALS operations: dispatch is ~free,
    jax.block_until_ready returns without waiting, and never-fetched
    programs may not execute at all — timings taken there are fiction
    (round-3 lesson; the 98-113M segs/s readings were journal appends).
    Only a fetch is a true barrier."""
    import jax.numpy as jnp

    np.asarray(jnp.zeros((1,)) + 1.0)


def _headline(passes: int = 3):
    """Headline metric: ACTIVE traced segments/s rendering the DISTINCT
    chunks of the reference's compiled-in scene (proj12_backfaceTest,
    800x600) — full-image style, the way the reference measures itself
    (wall-clock per image, viewport.cpp:404-409), `passes` times with
    distinct sample keys, lane indices generated on device. Timing uses
    FETCH BARRIERS (every chunk's stats vector is fetched inside the timed
    window) because block_until_ready does not reliably wait on this
    backend (see _flip_eager).

    "Active" counts real queries only (live closest hits + issued shadow
    rays + live refraction-chain trips) — NOT static level capacities; see
    LevelRecord.segs. The 2.5M/s baseline is the reference CPU's estimated
    rate for the same unit of work (BASELINE.md).

    Returns (segs_per_sec, per_chunk_ms, image_wall_s): the image wall
    additionally includes fetching the 8 radiance buffers to host, i.e.
    the full cost of having a 800x600 spp=1 image in hand."""
    import jax
    import jax.numpy as jnp

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_chunk_staged_at
    from bhraytracer_tpu.ops.camera import from_scene_camera

    pack, cam = _bench_scene()
    cam.width, cam.height = 800, 600
    # fused_levels + whole-image chunks: the round-3 sweeps measured the
    # staged 65K-chunk path at 100 ms/chunk (7.2M segs/s) vs ONE fused
    # 480K-lane program per pass at 602 ms (9.3M segs/s) — program count
    # and per-chunk fixed costs, not FLOPs, separated the two.
    cfg = RenderConfig(
        spp=1,
        gi_bounces=3,
        extra_refr_levels=2,
        tir_bounces=16,
        chunk_rays=480000,
        texture_sample_count=1,
        refr_capacity=0.08,
        fused_levels=True,
    )
    cam_p = from_scene_camera(cam)

    if jax.default_backend() == "tpu":
        # Probe-compile the trace and shade kernels first: if Mosaic rejects
        # either on this hardware, rendering falls back to the XLA paths
        # instead of failing the whole bench.
        from bhraytracer_tpu.ops.pallas_shade import probe_shade_kernel
        from bhraytracer_tpu.ops.trace import probe_trace_kernels

        probe_trace_kernels(pack)
        probe_shade_kernel(pack, cfg)
    _flip_eager()

    n = cfg.chunk_rays
    total = cam.width * cam.height
    key = jax.random.PRNGKey(0)
    # Scalars sliced from device arrays, never fresh host ints: a fresh
    # host array as a jit arg costs ~100ms of synchronous transfer wait
    # per dispatch on the tunneled TPU (tools/drill_dispatch.py).
    n_chunks = -(-total // n)
    starts_d = jnp.arange(n_chunks, dtype=jnp.int32) * n
    samples_d = jnp.arange(passes + 12, dtype=jnp.int32)
    acc0 = jnp.zeros((n, 3))
    zb0 = jnp.full((n,), 1e30)
    st0 = jnp.zeros((4,), jnp.int32)

    def run(c, s):
        return render_chunk_staged_at(
            pack, cfg, cam_p, cam.width, cam.height, n, starts_d[c],
            key, samples_d[s], None, acc0, zb0, True, st_prev=st0,
        )

    # Warm/compile pass, fetch-barriered (compiles happen lazily; only a
    # fetch proves the programs are built and runnable).
    warm = [run(c, 0) for c in range(n_chunks)]
    np.asarray(warm[-1][2].vec)

    t0 = time.perf_counter()
    outs = [run(c, s + 1) for s in range(passes) for c in range(n_chunks)]
    sts = [np.asarray(o[2].vec) for o in outs]
    dt = time.perf_counter() - t0
    segs = sum(int(s[3]) for s in sts)
    rate = segs / dt

    # Image-in-hand wall: one full image, radiance fetched to host.
    t0 = time.perf_counter()
    outs = [run(c, passes + 2) for c in range(n_chunks)]
    img_parts = [np.asarray(o[0]) for o in outs]
    image_wall = time.perf_counter() - t0
    assert all(np.isfinite(p).all() for p in img_parts)
    return rate, dt / (passes * n_chunks) * 1e3, image_wall


def _full_1024(spp: int = 1):
    """BASELINE.json config: forward render at 1024x1024, whole image."""
    import jax
    import jax.numpy as jnp

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_chunk_staged_at
    from bhraytracer_tpu.ops.camera import from_scene_camera

    pack, cam = _bench_scene()
    cam.width, cam.height = 1024, 1024
    cfg = RenderConfig(spp=spp, gi_bounces=3, extra_refr_levels=2,
                       tir_bounces=16, chunk_rays=262144,
                       texture_sample_count=1, refr_capacity=0.08,
                       fused_levels=True)
    cam_p = from_scene_camera(cam)
    n = cfg.chunk_rays
    total = cam.width * cam.height
    key = jax.random.PRNGKey(0)
    n_chunks = -(-total // n)
    starts_d = jnp.arange(n_chunks, dtype=jnp.int32) * n
    samples_d = jnp.arange(spp, dtype=jnp.int32)

    def run_chunk(c, s):
        acc = jnp.zeros((n, 3))
        zb = jnp.full((n,), 1e30)
        return render_chunk_staged_at(pack, cfg, cam_p, cam.width, cam.height,
                                      n, starts_d[c], key, samples_d[s],
                                      None, acc, zb, True)

    _flip_eager()
    warm = run_chunk(0, 0)
    np.asarray(warm[2].vec)  # fetch barrier: compiles done
    t0 = time.perf_counter()
    outs = []
    for s in range(spp):
        for c in range(n_chunks):
            outs.append(run_chunk(c, s))
    sts = [np.asarray(o[2].vec) for o in outs]  # fetch barrier per chunk
    dt = time.perf_counter() - t0
    segments = sum(int(s_[3]) for s_ in sts)
    rays = total * spp
    return {"wall_s": round(dt, 3),
            "segments_per_sec": round(segments / dt),
            "camera_rays_per_sec": round(rays / dt),
            "segments": segments}


def _fwd_bwd_1024(width: int = 1024, height: int = 1024,
                  chunk: int = 131072):
    """BASELINE.json inverse-render config: fwd+bwd at 1024x1024, one chip.

    Chunked value_and_grad of an image-MSE loss w.r.t. the trainable scene
    parameters through the monolithic differentiable path with per-level
    remat (the path the inverse-rendering demo and test_gradients use).
    Rays/s counts each camera ray once; every ray pays forward AND backward.
    width/height/chunk are overridable so the path can be smoke-tested at
    small scale on CPU."""
    import jax
    import jax.numpy as jnp

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import _render_chunk
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.parallel.sharding import _apply_params, trainable_params

    pack, cam = _bench_scene()
    cam.width, cam.height = width, height
    cfg = RenderConfig(spp=1, gi_bounces=3, extra_refr_levels=2,
                       tir_bounces=16, chunk_rays=chunk,
                       texture_sample_count=1, refr_capacity=0.08,
                       differentiable=True, remat_levels=True)
    cam_p = from_scene_camera(cam)
    n = cfg.chunk_rays
    total = cam.width * cam.height
    key = jax.random.PRNGKey(0)
    params = trainable_params(pack, cam_p)

    @jax.jit
    def step(p, start, target):
        # Lane indices + chunk key derived in-jit from the start scalar (no
        # per-chunk host uploads; same rationale as render_chunk_staged_at).
        idx = jnp.minimum(start + jnp.arange(n, dtype=jnp.int32), total - 1)
        px = idx % cam.width
        py = idx // cam.width
        ck = jax.random.fold_in(key, start)

        def loss_fn(p_):
            pk, cm = _apply_params(pack, cam_p, p_)
            rad, _, _ = _render_chunk(pk, cfg, cm, cam.width, cam.height,
                                      px, py, ck)
            return jnp.mean((rad - target) ** 2)

        return jax.value_and_grad(loss_fn)(p)

    target0 = jnp.zeros((n, 3))
    n_chunks = -(-total // n)
    starts_d = jnp.arange(n_chunks, dtype=jnp.int32) * n
    _flip_eager()
    warm = step(params, starts_d[0], target0)
    float(warm[0])  # fetch barrier: compile done
    t0 = time.perf_counter()
    losses = []
    for c in range(n_chunks):
        losses.append(step(params, starts_d[c], target0)[0])
    losses = [float(l) for l in losses]  # fetch barrier per chunk
    dt = time.perf_counter() - t0
    assert all(np.isfinite(l) for l in losses)
    return {"wall_s": round(dt, 3),
            "fwd_bwd_rays_per_sec": round(total / dt)}


def _proj11_walltime(spp: int = 16):
    """Apples-to-apples wall-time against BASELINE.md's proj11_0 row: the
    reference rendered proj11_0 (teapot room, 800x600) at 16 spp AA in 27 s
    on its 16-thread CPU. Same scene (stand-in meshes), same spp, full
    image, wall-clock including chunk orchestration (compiles excluded via
    a one-chunk warmup)."""
    import os

    import jax

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_image
    from bhraytracer_tpu.scene.xml_loader import load_scene

    scene = "/root/reference/BHRayTracer/Resource/Data/proj11_0.xml"
    if not os.path.exists(scene):
        return {"skipped": "reference checkout unavailable"}
    repo = os.path.dirname(os.path.abspath(__file__))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pack, cam = load_scene(scene, resource_root=os.path.join(repo, "assets"))
    cam.width, cam.height = 800, 600
    # proj11 predates the path-tracing projects: Blinn + shadows, no GI.
    # Whole-image fused chunks: one program per spp pass (the 65K staged
    # config paid ~5 programs x 8 chunks x 16 passes of ~25ms dispatch
    # floor each — orchestration, not rendering).
    cfg = RenderConfig(spp=spp, gi_bounces=0, extra_refr_levels=0,
                       tir_bounces=16, chunk_rays=480000,
                       texture_sample_count=1, fused_levels=True)
    img = render_image(pack, cam, cfg, seed=0)  # warmup: compiles all stages
    t0 = time.perf_counter()
    img = render_image(pack, cam, cfg, seed=1)
    dt = time.perf_counter() - t0
    return {"wall_s": round(dt, 3), "reference_wall_s": 27.0,
            "speedup_vs_reference": round(27.0 / dt, 2),
            "spp": spp, "note": "stand-in meshes (reference OBJs not in checkout)"}


def _scene_leg(scene_path: str, cfg_kw: dict, spp: int, name: str):
    """Shared harness for the textured/photon scene legs: full 800x600
    render via render_image (compiles excluded by a warmup render), honest
    segs/s from the traced_segments counter."""
    import os

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_image
    from bhraytracer_tpu.scene.xml_loader import load_scene

    if not os.path.exists(scene_path):
        return {"skipped": "reference checkout unavailable"}
    repo = os.path.dirname(os.path.abspath(__file__))
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pack, cam = load_scene(scene_path,
                               resource_root=os.path.join(repo, "assets"))
    cam.width, cam.height = 800, 600
    cfg = RenderConfig(spp=spp, texture_sample_count=1, **cfg_kw)
    render_image(pack, cam, cfg, seed=0)  # warmup: compiles
    t0 = time.perf_counter()
    _, aux = render_image(pack, cam, cfg, seed=1, return_aux=True)
    dt = time.perf_counter() - t0
    segs = aux["traced_segments"]
    return {"wall_s": round(dt, 3), "segments": segs,
            "segments_per_sec": round(segs / dt), "spp": spp}


def _textured_leg():
    """proj10: full texture suite (checker + file texture + textured
    background/environment) — the un-fused XLA shading path (the shade
    kernel gates itself off when n_texmaps > 0)."""
    return _scene_leg(
        "/root/reference/BHRayTracer/Resource/Data/proj10.xml",
        dict(gi_bounces=0, extra_refr_levels=0, tir_bounces=16,
             chunk_rays=480000, fused_levels=True), spp=4, name="proj10")


def _photon_leg():
    """proj13 with the caustic photon map: photon build + 27-cell grid
    gather on hardware (staged 65K chunks — the fused graph does not
    thread pmap and the staged path dies in remote compile at 480K)."""
    return _scene_leg(
        "/root/reference/BHRayTracer/Resource/Data/proj13.xml",
        dict(gi_bounces=3, extra_refr_levels=2, tir_bounces=16,
             chunk_rays=65536, use_photon_map=True,
             photon_count=1 << 17), spp=1, name="proj13")


def _bigmesh_leg(spp: int = 1):
    """112K-face mesh scene (teapot_hires stand-in): the big-mesh path the
    1,408-face bundled scenes cannot exercise — treelet-streamed packet
    traversal (the stream kernel gates out at 8,192 faces). Full 800x600
    render, honest segs/s."""
    import os
    import subprocess
    import sys

    import numpy as np

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_image
    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene
    from bhraytracer_tpu.scene.obj_loader import load_obj

    repo = os.path.dirname(os.path.abspath(__file__))
    hires = os.path.join(repo, "assets", "Resource", "Data",
                         "teapot_hires.obj")
    if not os.path.exists(hires):
        subprocess.run([sys.executable,
                        os.path.join(repo, "tools", "gen_assets.py"),
                        os.path.join(repo, "assets"), "--big"], check=True)

    sd = _tiny_scene_desc()
    sd.meshes.append(load_obj(hires))
    t = D.Transform()
    t.scale(0.25, 0.25, 0.25)
    t.translate(np.array([0.0, 2.5, 0.0]))
    sd.nodes.append(D.NodeDesc(kind="mesh", name="hires", transform=t,
                               material=0, mesh=len(sd.meshes) - 1))
    pack = compile_scene(sd)
    cam = sd.camera
    cam.width, cam.height = 800, 600
    cfg = RenderConfig(spp=spp, gi_bounces=1, extra_refr_levels=1,
                       tir_bounces=8, chunk_rays=480000,
                       texture_sample_count=1, fused_levels=True)
    render_image(pack, cam, cfg, seed=0)  # warmup: compiles
    t0 = time.perf_counter()
    _, aux = render_image(pack, cam, cfg, seed=1, return_aux=True)
    dt = time.perf_counter() - t0
    segs = aux["traced_segments"]
    return {"wall_s": round(dt, 3), "segments": segs,
            "segments_per_sec": round(segs / dt),
            "faces": int(pack.face_v.shape[0]), "spp": spp,
            "treelets": len(pack.treelets)}


def _scaling_curve():
    """Rays/s over a VIRTUAL 8-device CPU mesh (hardware multi-chip is not
    available in this environment; this validates the dp sharding adds no
    serialization, not ICI bandwidth). Runs in a subprocess so the CPU
    platform + device-count flags apply before JAX init.

    COMPUTE-BOUND by construction (round-5 rework — the old 16K-lane leg
    measured ~784 rays/s absolute, i.e. per-dispatch overheads presented as
    scaling signal): 262,144 lanes per pass puts each timed pass at tens of
    seconds of genuine device compute, >=1000x any dispatch cost. The 8
    virtual devices partition ONE host CPU, so total compute is fixed and
    IDEAL dp sharding keeps throughput FLAT across mesh sizes; the
    retention number isolates the overhead the sharding itself adds
    (collectives, partitioned-program inefficiency, shard imbalance in the
    while_loop integrator — the slowest shard gates each pass).

    Extrapolation to the >=80% 1-chip -> 2-host BASELINE target: the
    forward render has ZERO cross-device communication (scene replicated,
    lanes independent, no collective in the program — verifiable from the
    shard_map in parallel/sharding.py), so real-chip forward scaling is
    bounded only by load imbalance across lane shards, which shrinks as
    1/sqrt(lanes/device); the backward pass adds ONE psum whose payload is
    the trainable-parameter pytree (~KBs — mtl/light/camera tables), -- a
    negligible fraction of ICI/DCN bandwidth at any realistic step time."""
    import os
    import subprocess
    import sys

    code = r"""
import json, os, time
import jax
jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
import numpy as np
import bench as B
from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.parallel.sharding import make_mesh, render_radiance_sharded
from bhraytracer_tpu.scene.compile import compile_scene

sd = B._tiny_scene_desc()
pack = compile_scene(sd)
cam = sd.camera
cam.width, cam.height = 800, 600
n = 262144
cfg = RenderConfig(spp=1, gi_bounces=1, extra_refr_levels=0, tir_bounces=4,
                   chunk_rays=n, texture_sample_count=1)
from bhraytracer_tpu.ops.camera import from_scene_camera
cam_p = from_scene_camera(cam)
idx = np.arange(n)
px = jnp.asarray(idx % cam.width, jnp.int32)
py = jnp.asarray(idx // cam.width % cam.height, jnp.int32)
key = jax.random.PRNGKey(0)
out = {}
for ndev in (1, 2, 4, 8):
    mesh = make_mesh(ndev)
    fn = lambda k: render_radiance_sharded(pack, cfg, cam_p, cam.width,
                                           cam.height, px, py, k, mesh)
    r = fn(key)
    jax.block_until_ready(r)
    iters = 2
    t0 = time.perf_counter()
    for i in range(iters):
        r = fn(jax.random.fold_in(key, i))
        jax.block_until_ready(r)
    dt = (time.perf_counter() - t0) / iters
    out[ndev] = n / dt
print("SCALING " + json.dumps(out))
"""
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = (env.get("XLA_FLAGS", "")
                        + " --xla_force_host_platform_device_count=8").strip()
    repo = os.path.dirname(os.path.abspath(__file__))
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, env=env, cwd=repo, timeout=3600)
    for line in r.stdout.splitlines():
        if line.startswith("SCALING "):
            rates = json.loads(line[len("SCALING "):])
            base = rates["1"]
            # On the fixed-compute virtual mesh, retention vs 1 device IS
            # the sharding-efficiency number (ideal = 1.0); 'efficiency' is
            # emitted as an alias for downstream consumers of the old key
            # (round-4 advisor note on the silent schema change).
            return {nd: {"rays_per_sec": round(v),
                         "retention_vs_1dev": round(v / base, 3),
                         "efficiency": round(v / base, 3)}
                    for nd, v in rates.items()}
    raise RuntimeError(f"scaling subprocess failed: {r.stderr[-2000:]}")


def _backend_or_cpu_fallback(probe_timeout_s: int = 420) -> str | None:
    """Guard against a dead axon tunnel: backend init BLOCKS forever (retry
    nanosleep loop) when the TPU is unreachable, which would hang the whole
    bench. Probe device init in a SUBPROCESS with a timeout; on failure,
    force CPU so the driver still gets its one JSON line (marked)."""
    import subprocess
    import sys

    import jax

    try:
        subprocess.run(
            [sys.executable, "-c", "import jax; jax.devices()"],
            timeout=probe_timeout_s, check=True,
            stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        )
        return None
    except (subprocess.TimeoutExpired, subprocess.CalledProcessError):
        print("WARNING: device backend init unavailable (axon tunnel down?); "
              "falling back to CPU", file=sys.stderr)
        jax.config.update("jax_platforms", "cpu")
        return "cpu-fallback"


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true",
                    help="also run the 1024x1024 BASELINE config and the "
                         "virtual-mesh scaling curve")
    args = ap.parse_args()

    fallback = _backend_or_cpu_fallback()

    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    segs_per_sec, per_chunk_ms, image_wall = _headline()
    line = {
        "metric": "ray_segments_per_sec",
        "value": round(segs_per_sec),
        "unit": "segments/s",
        "vs_baseline": round(segs_per_sec / BASELINE_SEGMENTS_PER_SEC, 3),
        "measurement": "full 800x600 image per pass (one fused 480K-lane "
                       "program) x3 passes with distinct sample keys, "
                       "FETCH-BARRIER timed (block_until_ready does not wait "
                       "on this backend; every pass's stats vector is "
                       "fetched inside the timed window)",
        "per_chunk_ms": round(per_chunk_ms, 1),
        "image_wall_s_800x600_spp1": round(image_wall, 3),
    }
    if fallback:
        line["device_note"] = (
            "TPU backend init timed out; measured on CPU fallback — NOT a "
            "TPU number")

    if args.full:
        full = {"fwd_1024x1024": _full_1024()}
        try:
            full["fwd_bwd_1024x1024"] = _fwd_bwd_1024()
        except Exception as e:  # pragma: no cover
            full["fwd_bwd_error"] = str(e)[:500]
        try:
            full["proj11_0_walltime"] = _proj11_walltime()
        except Exception as e:  # pragma: no cover
            full["proj11_error"] = str(e)[:500]
        try:
            full["proj10_textured"] = _textured_leg()
        except Exception as e:  # pragma: no cover
            full["proj10_error"] = str(e)[:500]
        try:
            full["proj13_photon"] = _photon_leg()
        except Exception as e:  # pragma: no cover
            full["proj13_error"] = str(e)[:500]
        try:
            full["bigmesh_112k"] = _bigmesh_leg()
        except Exception as e:  # pragma: no cover
            full["bigmesh_error"] = str(e)[:500]
        try:
            full["scaling_virtual_cpu_mesh"] = _scaling_curve()
            full["scaling_note"] = (
                "COMPUTE-BOUND leg (262144 lanes/pass, tens of seconds of "
                "device compute per timed pass): 8 virtual CPU devices "
                "share ONE host's cores, total compute is fixed, so ideal "
                "dp sharding keeps throughput FLAT; retention_vs_1dev "
                "(alias 'efficiency') ~= 1.0 means the sharding adds no "
                "serialization. Real-chip forward scaling has ZERO "
                "cross-device comm (scene replicated, lanes independent); "
                "bwd adds one ~KB-payload param psum — see "
                "bench._scaling_curve docstring for the >=80% target "
                "extrapolation argument.")
        except Exception as e:  # pragma: no cover
            full["scaling_error"] = str(e)[:500]
        line["full"] = full

    print(json.dumps(line))


if __name__ == "__main__":
    main()
