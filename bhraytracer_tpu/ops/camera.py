"""Camera basis + primary-ray generation.

Reproduces BeginRender's basis math (Main.cpp:178-192) and PathTracing's
jittered pixel sampling (Main.cpp:132-155), including the reference's
integer-division quirk `(i + 1/2) == i` — pixel positions are corners, not
centers.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp

from bhraytracer_tpu.ops.linalg import cross, norm, normalize


class CameraParams(NamedTuple):
    """Differentiable camera parameters (scene.h:506-524). dir/up are assumed
    orthonormalized (xmlload.cpp:124-127)."""

    pos: jnp.ndarray  # (3,)
    dir: jnp.ndarray  # (3,)
    up: jnp.ndarray  # (3,)
    fov: jnp.ndarray  # () degrees
    focaldist: jnp.ndarray  # ()
    # Thin-lens aperture radius (scene.h:518 `dof`). The reference's
    # integrator never reads it — only the GL preview jitters the eye with
    # it (viewport.cpp:238-243); cfg.use_dof opts the integrator in.
    dof: float = 0.0


def from_scene_camera(cam) -> CameraParams:
    return CameraParams(
        pos=jnp.asarray(cam.pos, jnp.float32),
        dir=jnp.asarray(cam.dir, jnp.float32),
        up=jnp.asarray(cam.up, jnp.float32),
        fov=jnp.asarray(cam.fov, jnp.float32),
        focaldist=jnp.asarray(cam.focaldist, jnp.float32),
        dof=jnp.asarray(getattr(cam, "dof", 0.0), jnp.float32),
    )


def camera_basis(cam: CameraParams, width: int, height: int):
    """Returns (top_left, dd_x, dd_y) exactly as Main.cpp:179-192."""
    aor = width / float(height)
    # Reference PI macro is 3.14159265 (Main.cpp:39).
    tan_h = jnp.tan(cam.fov / 2.0 * 3.14159265 / 180.0)
    ell = cam.focaldist
    h = 2.0 * ell * tan_h
    w = aor * h
    cam_z = -cam.dir
    cam_y = cam.up
    cam_x = cross(cam_y, cam_z)
    top_left = cam.pos - cam_z * ell + cam_y * (h / 2.0) - cam_x * (w / 2.0)
    dd_x = cam_x * (w / width)
    dd_y = cam_y * (h / height)
    return top_left, dd_x, dd_y


def gen_rays(
    cam: CameraParams,
    width: int,
    height: int,
    px: jnp.ndarray,  # (N,) pixel column i
    py: jnp.ndarray,  # (N,) pixel row j
    u: jnp.ndarray,  # (N,2) jitter uniforms
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jittered primary rays; directions are UNNORMALIZED (Ray ctor parity,
    scene.h:48: t = 1 at the image plane)."""
    top_left, dd_x, dd_y = camera_basis(cam, width, height)
    # (i + 1/2) with C++ int division = i: corner sampling (Main.cpp:145).
    center = (
        top_left[None, :]
        + px[:, None].astype(jnp.float32) * dd_x[None, :]
        - py[:, None].astype(jnp.float32) * dd_y[None, :]
    )
    pixel_len = norm(dd_x)
    jitter = (
        normalize(dd_x)[None, :] * ((u[:, 0] * 2.0 - 1.0) * pixel_len / 2.0)[:, None]
        + normalize(dd_y)[None, :] * ((u[:, 1] * 2.0 - 1.0) * pixel_len / 2.0)[:, None]
    )
    target = center + jitter
    if u.shape[1] >= 4:
        # Thin-lens eye jitter (viewport.cpp:238-243): uniform disc of
        # radius `dof` in the (dir x up, up) plane; the target stays on the
        # focal plane (`target` above sits at focaldist), so objects there
        # render sharp and defocus grows away from it.
        cam_x = cross(cam.up, -cam.dir)  # == dir x up (the reference's v)
        r = jnp.sqrt(u[:, 2]) * cam.dof
        a = u[:, 3] * 2.0 * jnp.pi
        o = (
            cam.pos[None, :]
            + (r * jnp.cos(a))[:, None] * cam_x[None, :]
            + (r * jnp.sin(a))[:, None] * cam.up[None, :]
        )
        return o, target - o
    o = jnp.broadcast_to(cam.pos, target.shape)
    return o, target - cam.pos
