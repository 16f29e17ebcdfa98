"""Texture evaluation: file (bilinear, tiling), checker, multi-tap filter,
TextureMap uvw transforms, TexturedColor, and environment mapping.

Reference semantics: TextureFile::Sample (Texture.cpp:97-123),
TextureChecker::Sample (:127-136), Texture::Sample's 32-tap Halton elliptic
filter (scene.h:316-337), TextureMap transform (scene.h:364-386),
TexturedColor (scene.h:394-422), SampleEnvironment (scene.h:414-420).
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from bhraytracer_tpu.ops.linalg import mat_vec
from bhraytracer_tpu.utils.halton import texture_filter_taps

_TAP_CACHE = {}


def _taps(n: int) -> np.ndarray:
    # Cache host numpy (NOT jnp: a device constant created inside a jit trace
    # would leak a tracer into later traces).
    if n not in _TAP_CACHE:
        _TAP_CACHE[n] = texture_filter_taps(n)
    return _TAP_CACHE[n]


def tile_clamp(u):
    """Fractional tiling wrap (Texture::TileClamp, scene.h:344-354)."""
    u = u - jnp.trunc(u)
    return jnp.where(u < 0.0, u + 1.0, u)


# Instrumentation ONLY (tools/sweep_variants.py): replace the four atlas
# texel gathers with a cheap data-dependent hash so image-level sweeps can
# attribute their cost. Module switch read at TRACE time — sweeps must
# jax.clear_caches() (sweep_variants does). Renders with it on are WRONG
# images by construction.
_FETCH_STUB = False


def set_fetch_stub(on: bool) -> None:
    global _FETCH_STUB
    _FETCH_STUB = bool(on)


def texture_eval(pack, tex_id, uvw):
    """Single-tap texture lookup. tex_id: (N,) i32 (valid), uvw: (N,3)."""
    tex_id = jnp.clip(tex_id, 0, pack.tex_kind.shape[0] - 1)
    kind = pack.tex_kind[tex_id]
    u = tile_clamp(uvw)

    # --- checker (Texture.cpp:127-136) ---
    c1 = pack.tex_c1[tex_id]
    c2 = pack.tex_c2[tex_id]
    left = u[..., 0] <= 0.5
    low = u[..., 1] <= 0.5
    checker = jnp.where(
        (left == low)[..., None], c1, c2
    )  # (x<=.5) == (y<=.5) -> color1

    # --- file texture, bilinear with integer-wrap parity ---
    wh = pack.tex_wh[tex_id]
    w = wh[..., 0]
    h = wh[..., 1]
    x = w.astype(jnp.float32) * u[..., 0]
    y = h.astype(jnp.float32) * u[..., 1]
    ix = x.astype(jnp.int32)
    iy = y.astype(jnp.int32)
    fx = x - ix.astype(jnp.float32)
    fy = y - iy.astype(jnp.float32)
    ix = jnp.clip(ix, 0, w - 1)
    iy = jnp.clip(iy, 0, h - 1)
    ixp = jnp.where(ix + 1 >= w, ix + 1 - w, ix + 1)
    iyp = jnp.where(iy + 1 >= h, iy + 1 - h, iy + 1)

    def fetch(yy, xx):
        if _FETCH_STUB:  # data-dependent, unfoldable, gather-free
            h = (tex_id.astype(jnp.uint32) * jnp.uint32(2654435761)
                 + yy.astype(jnp.uint32) * jnp.uint32(40503)
                 + xx.astype(jnp.uint32) * jnp.uint32(97))
            h = h ^ (h >> 13)
            return jnp.stack([(h & 255), ((h >> 8) & 255),
                              ((h >> 16) & 255)],
                             axis=-1).astype(jnp.float32) * (1.0 / 255.0)
        return pack.atlas[tex_id, yy, xx].astype(jnp.float32) * (1.0 / 255.0)

    bilin = (
        fetch(iy, ix) * ((1 - fx) * (1 - fy))[..., None]
        + fetch(iy, ixp) * (fx * (1 - fy))[..., None]
        + fetch(iyp, ix) * ((1 - fx) * fy)[..., None]
        + fetch(iyp, ixp) * (fx * fy)[..., None]
    )
    return jnp.where((kind == 1)[..., None], checker, bilin)


def texmap_sample(pack, tm_id, uvw, duvw=None, taps: int = 32):
    """TextureMap::Sample: transform uvw (and derivatives) into texture space
    then filter. tm_id: (N,) i32, may be -1 (returns 0, the reference's null
    texture -> Color(0,0,0), scene.h:371)."""
    valid = tm_id >= 0
    tid = jnp.clip(tm_id, 0, pack.tm_tex.shape[0] - 1)
    itm = pack.tm_itm[tid]
    pos = pack.tm_pos[tid]
    tex = pack.tm_tex[tid]
    u = mat_vec(itm, uvw - pos)

    if duvw is None:
        c = texture_eval(pack, tex, u)
    else:
        d0 = mat_vec(itm, duvw[:, 0])
        d1 = mat_vec(itm, duvw[:, 1])
        center = texture_eval(pack, tex, u)
        if taps > 1:
            tap_xy = _taps(taps)  # (S,2); tap 0 is the center
            us = (
                u[:, None, :]
                + tap_xy[None, 1:, 0, None] * d0[:, None, :]
                + tap_xy[None, 1:, 1, None] * d1[:, None, :]
            )  # (N, S-1, 3)
            tex_b = jnp.broadcast_to(tex[:, None], us.shape[:2])
            rest = texture_eval(pack, tex_b, us).sum(axis=1)
            filtered = (center + rest) / float(taps)
        else:
            filtered = center
        dzero = (jnp.sum(duvw[:, 0] ** 2, -1) + jnp.sum(duvw[:, 1] ** 2, -1)) == 0.0
        c = jnp.where(dzero[:, None], center, filtered)
    return jnp.where(valid[:, None], c, 0.0)


def textured_color(pack, color, tm_id, uvw, duvw=None, taps: int = 32):
    """TexturedColor::Sample (scene.h:410-411): color, or color * texture.

    Statically skips all texture machinery when the scene has no texture
    maps (pack.n_texmaps == 0) — a large win for untextured scenes."""
    if getattr(pack, "n_texmaps", 1) == 0:
        return jnp.broadcast_to(color, tm_id.shape + (3,)) if color.ndim == 1 else color
    tex = texmap_sample(pack, tm_id, uvw, duvw, taps=taps)
    return jnp.where((tm_id >= 0)[..., None], color * tex, color)


def environment_uvw(direction):
    """SampleEnvironment's lat-long-ish mapping (scene.h:414-420).

    Returns (uvw, valid): invalid where the reference would produce NaN
    (|dir.z| > 1 on an unnormalized direction, or dir.x = dir.y = 0), which
    callers treat as a zero contribution (MtlBlinn.cpp:418-423).
    """
    dx, dy, dz = direction[..., 0], direction[..., 1], direction[..., 2]
    denom = jnp.abs(dx) + jnp.abs(dy)
    valid = (jnp.abs(dz) <= 1.0) & (denom > 0.0)
    z = jnp.arcsin(jnp.clip(-dz, -1.0 + 1e-7, 1.0 - 1e-7)) / jnp.pi + 0.5
    safe = jnp.where(denom > 0.0, denom, 1.0)
    x = dx / safe
    y = dy / safe
    u = 0.5 + z * (x * 0.5 - y * 0.5)
    v = 0.5 + z * (x * 0.5 + y * 0.5)
    uvw = jnp.stack([u, v, jnp.zeros_like(u)], -1)
    return uvw, valid


def sample_environment(pack, direction):
    """environment.SampleEnvironment(dir) -> (color, valid)."""
    uvw, valid = environment_uvw(direction)
    c = textured_color(
        pack, pack.env_color, jnp.broadcast_to(pack.env_tm, uvw.shape[:-1]), uvw
    )
    return c, valid


def sample_background(pack, uvw):
    """background.Sample(pixel uv) for primary-ray misses (Main.cpp:166-167)."""
    return textured_color(
        pack, pack.bg_color, jnp.broadcast_to(pack.bg_tm, uvw.shape[:-1]), uvw
    )
