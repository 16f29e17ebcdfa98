"""Multi-chip sharding: data-parallel rays/tiles over a device mesh.

The reference's entire parallelism story is one OpenMP parallel-for over
image columns on 16 CPU threads (Main.cpp:204, 422). The TPU design shards
the flat (pixel, sample) lane axis across a 1-D `dp` device mesh:

  - scene (ScenePack: BVH, geometry, materials, textures, lights) is
    REPLICATED on every device — it is small and read-only;
  - ray lanes (and the whole shade tree above them) are sharded on `dp`;
  - no cross-device exchange is needed during tracing (each lane is
    independent), so forward rendering scales embarrassingly over ICI;
  - inverse rendering: parameter gradients are partial sums over lanes, so
    jit inserts a `psum` over `dp` (riding ICI) behind `out_shardings` —
    exactly the all-reduce the reference never had.

Multi-host: the same code runs under `jax.distributed.initialize` — the mesh
then spans hosts and the psum crosses DCN only at host boundaries.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.models.pathtracer import _render_chunk
from bhraytracer_tpu.ops.camera import CameraParams


def make_mesh(n_devices: Optional[int] = None) -> Mesh:
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), ("dp",))


def _lane_sharding(mesh):
    return NamedSharding(mesh, P("dp"))


def _replicated(mesh):
    return NamedSharding(mesh, P())


@functools.partial(
    jax.jit, static_argnames=("cfg", "width", "height", "mesh")
)
def _render_sharded_impl(pack, cfg, cam, width, height, px, py, key, mesh):
    lane = _lane_sharding(mesh)
    px = jax.lax.with_sharding_constraint(px, lane)
    py = jax.lax.with_sharding_constraint(py, lane)
    rad, _, _ = _render_chunk(pack, cfg, cam, width, height, px, py, key)
    return jax.lax.with_sharding_constraint(rad, lane)


def render_radiance_sharded(pack, cfg: RenderConfig, cam: CameraParams,
                            width: int, height: int, px, py, key, mesh: Mesh):
    """Radiance for sharded lanes via shard_map. len(px) must divide by
    mesh size.

    shard_map (not plain jit+GSPMD): each device runs the whole trace on
    ITS lane shard, so `pallas_call` executes per-device on local shapes —
    GSPMD has no custom partitioning rule for the kernels and may fall back
    to replicating the call (correct but serial; the round-2 open risk).
    RNG: each device's key is folded with its GLOBAL LANE OFFSET
    (axis_index * shard), so per-device sample streams are decorrelated by
    construction. NOTE this keying differs from the single-chip path's (a
    distributed render is not bit-identical to a 1-chip render; it is
    self-consistent for a fixed mesh size)."""
    ndev = mesh.devices.size
    n = px.shape[0]
    assert n % ndev == 0, (n, ndev)
    shard = n // ndev

    @jax.jit
    @functools.partial(
        jax.shard_map, mesh=mesh,
        in_specs=(P(), P("dp"), P("dp"), P()),
        out_specs=P("dp"), check_vma=False,
    )
    def _impl(pack_, px_s, py_s, key_):
        offset = jax.lax.axis_index("dp") * shard
        k = jax.random.fold_in(key_, offset)
        rad, _, _ = _render_chunk(pack_, cfg, cam, width, height,
                                  px_s, py_s, k)
        return rad

    return _impl(pack, px, py, key)


# ---------------------------------------------------------------------------
# inverse rendering: one optimization step over a lane shard
# ---------------------------------------------------------------------------


def trainable_params(pack, cam: CameraParams, include_geometry: bool = False,
                     include_textures: bool = False):
    """The differentiable parameter pytree: material table + lights + camera.

    include_geometry adds the LOCAL-frame mesh vertex table (pack.verts) —
    gradients flow through the barycentric re-interpolation in resolve_hit
    (hit ids stay frozen, the standard hit-ID-frozen estimator).

    include_textures adds the checker colors and the image atlas; the atlas
    is promoted to float32 (kept on the uint8 0..255 scale so the sampling
    path's 1/255 stays correct) — gradients flow through the bilinear /
    elliptic filter weights in ops/texturing.py."""
    d = dict(
        mtl_diffuse=pack.mtl_diffuse,
        mtl_specular=pack.mtl_specular,
        mtl_gloss=pack.mtl_gloss,
        mtl_refraction=pack.mtl_refraction,
        mtl_absorption=pack.mtl_absorption,
        light_intensity=pack.light_intensity,
        light_vec=pack.light_vec,
        cam_pos=cam.pos,
        cam_dir=cam.dir,
        cam_up=cam.up,
    )
    if include_geometry:
        d["verts"] = pack.verts
    if include_textures:
        d["tex_c1"] = pack.tex_c1
        d["tex_c2"] = pack.tex_c2
        d["atlas"] = pack.atlas.astype(jnp.float32)
    return d


def _apply_params(pack, cam: CameraParams, params):
    import dataclasses

    fields = dict(
        mtl_diffuse=params["mtl_diffuse"],
        mtl_specular=params["mtl_specular"],
        mtl_gloss=params["mtl_gloss"],
        mtl_refraction=params["mtl_refraction"],
        mtl_absorption=params["mtl_absorption"],
        light_intensity=params["light_intensity"],
        light_vec=params["light_vec"],
    )
    for k in ("verts", "tex_c1", "tex_c2", "atlas"):
        if k in params:
            fields[k] = params[k]
    pack = dataclasses.replace(pack, **fields)
    cam = cam._replace(pos=params["cam_pos"], dir=params["cam_dir"], up=params["cam_up"])
    return pack, cam


@functools.partial(
    jax.jit, static_argnames=("cfg", "width", "height", "mesh")
)
def train_step_sharded(params, opt_state, pack, cfg, cam, width, height,
                       px, py, target, key, mesh, lr=1e-2):
    """One SGD step of inverse rendering on a lane shard.

    Loss lanes are sharded on dp; parameter grads are lane-sums, so XLA
    all-reduces them over ICI automatically (grads come out replicated).
    """
    lane = _lane_sharding(mesh)
    px = jax.lax.with_sharding_constraint(px, lane)
    py = jax.lax.with_sharding_constraint(py, lane)
    target = jax.lax.with_sharding_constraint(target, lane)

    def loss_fn(p):
        pk, cm = _apply_params(pack, cam, p)
        rad, _, _ = _render_chunk(pk, cfg, cm, width, height, px, py, key)
        return jnp.mean((rad - target) ** 2)

    loss, grads = jax.value_and_grad(loss_fn)(params)
    new_params = jax.tree.map(lambda p, g: p - lr * g, params, grads)
    return new_params, opt_state, loss


# ---------------------------------------------------------------------------
# full-image distributed render
# ---------------------------------------------------------------------------


def render_image_distributed(pack, camera, cfg: RenderConfig, mesh: Mesh,
                             seed: int = 0):
    """Render a full image with lanes sharded across the mesh.

    The image's (pixel, sample) lanes are chunked and each chunk is sharded
    on `dp`; finished radiance shards are gathered host-side and assembled —
    the all-gather-of-tiles step the reference never needed (single box).
    Under `jax.distributed` the same code spans hosts.
    """
    import jax.random as jrandom

    from bhraytracer_tpu.ops.camera import from_scene_camera

    cam_p = from_scene_camera(camera)
    width, height = camera.width, camera.height
    total = width * height
    ndev = mesh.devices.size
    chunk = max(ndev, (cfg.chunk_rays // ndev) * ndev)

    key = jrandom.PRNGKey(seed)
    accum = np.zeros((total, 3), np.float32)
    # Samples accumulate ON DEVICE (sharded, no comm — elementwise add on
    # dp-sharded lanes) and each chunk is fetched host-side ONCE, after all
    # dispatches are queued: spp x chunks host round-trips -> chunks async
    # fetches. Same addition order per pixel as the sample loop, so the
    # image is bit-identical to the per-sample-fetch version.
    parts = []
    for start in range(0, total, chunk):
        stop = min(start + chunk, total)
        count = stop - start
        pad = (-count) % ndev
        idx = np.concatenate([np.arange(start, stop),
                              np.full(pad, start, np.int64)])
        px = jnp.asarray(idx % width, jnp.int32)
        py = jnp.asarray(idx // width, jnp.int32)
        acc_d = None
        for s in range(cfg.spp):
            ck = jrandom.fold_in(jrandom.fold_in(key, s), start)
            rad = render_radiance_sharded(
                pack, cfg, cam_p, width, height, px, py, ck, mesh
            )
            acc_d = rad if acc_d is None else acc_d + rad
        parts.append((start, stop, count, acc_d))
    for start, stop, count, acc_d in parts:
        accum[start:stop] = np.asarray(acc_d)[:count]

    img = accum / cfg.spp
    if cfg.use_gamma:
        img = np.power(np.maximum(img, 0.0), 1.0 / cfg.gamma)
    return img.reshape(height, width, 3)
