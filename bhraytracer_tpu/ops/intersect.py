"""Primitive intersection tests, vectorized over ray batches.

Semantics track the reference exactly:
  - unit sphere (Sphere/Sphere.cpp:8-75): front/back/both side selection,
    inside-the-sphere = back-face hit, tangent (disc == 0) = miss
  - unit plane z=0, |x|,|y|<=1 (Plane/Plane.cpp:8-77): normal never flipped
  - triangle via dominant-axis 2D projection + signed areas
    (TriObj/TriObj.cpp:68-189), including the grazing-angle cull
  - AABB slab test (Box/Box.cpp:3-46); we use IEEE inf division semantics
    instead of the reference's BIGFLOAT fallback for axis-parallel rays
    (strictly tighter: only prunes boxes the triangle tests would reject)

`hit_side` is a static string: "front" | "back" | "both" (HIT_* flags,
scene.h:57-60).
"""

from __future__ import annotations

import jax.numpy as jnp

from bhraytracer_tpu.ops.linalg import BIG, cross, dot, norm, safe_sqrt

# cos-based grazing-angle cull for triangles (TriObj.cpp:12).
PERP_EPS = 0.001745


def sphere_intersect(o, d, hit_side: str):
    """Unit sphere at origin. o, d: (..., 3). Returns (t, front): t = BIG on
    miss."""
    a = dot(d, d)
    b = 2.0 * dot(d, o)
    c = dot(o, o) - 1.0
    disc = b * b - 4.0 * a * c
    ok = disc > 0.0
    sq = safe_sqrt(disc)
    inv2a = 1.0 / jnp.maximum(2.0 * a, 1e-30)
    t1 = (-b + sq) * inv2a  # far root (t1 >= t2 since a > 0)
    t2 = (-b - sq) * inv2a  # near root
    both_pos = t2 > 0.0  # origin outside, sphere ahead
    inside = t1 * t2 <= 0.0  # origin inside: back-face hit at t1
    if hit_side == "front":
        t = jnp.where(both_pos, t2, BIG)
        front = jnp.ones_like(ok)
    elif hit_side == "back":
        t = jnp.where(both_pos, t1, jnp.where(inside, t1, BIG))
        front = jnp.zeros_like(ok)
    else:  # both
        t = jnp.where(both_pos, t2, jnp.where(inside, t1, BIG))
        front = both_pos
    t = jnp.where(ok & (t > 0.0), t, BIG)
    return t, front


def plane_intersect(o, d, hit_side: str):
    """Unit plane: z = 0, x,y in [-1,1]. Returns (t, front)."""
    dz = d[..., 2]
    t = -o[..., 2] / jnp.where(dz == 0.0, 1e-30, dz)
    x = o[..., 0] + t * d[..., 0]
    y = o[..., 1] + t * d[..., 1]
    in_extent = (jnp.abs(x) <= 1.0) & (jnp.abs(y) <= 1.0)
    front = dz < 0.0  # dot(-dir, +z) > 0
    ok = (dz != 0.0) & (t > 0.0) & in_extent
    if hit_side == "front":
        ok &= front
    elif hit_side == "back":
        ok &= ~front
    return jnp.where(ok, t, BIG), front


def triangle_intersect(v0, v1, v2, o, d, hit_side: str):
    """Möller-style test via dominant-axis projection (TriObj.cpp:68-189).

    All inputs broadcastable to (..., 3). Returns (t, front): t = BIG on
    miss.
    """
    vn = cross(v1 - v0, v2 - v0)  # geometric normal (unnormalized)
    tdiv = dot(vn, d)
    # Grazing-angle cull: |cos| < PERP_EPS between vn and d.
    denom = jnp.maximum(norm(vn) * norm(d), 1e-30)
    pd = tdiv / denom
    ok = jnp.abs(pd) >= PERP_EPS
    t = (dot(vn, v0) - dot(vn, o)) / jnp.where(tdiv == 0.0, 1e-30, tdiv)
    ok &= t > 0.0
    front = tdiv < 0.0
    if hit_side == "front":
        ok &= front
    elif hit_side == "back":
        ok &= ~front
    a0, a1, a2 = triangle_areas(v0, v1, v2, o + t[..., None] * d, vn)
    all_nonneg = (a0 >= 0.0) & (a1 >= 0.0) & (a2 >= 0.0)
    all_neg = (a0 < 0.0) & (a1 < 0.0) & (a2 < 0.0)
    ok &= all_nonneg | all_neg
    return jnp.where(ok, t, BIG), front


def triangle_areas(v0, v1, v2, x, vn):
    """Signed doubled-projected areas /2 on the dominant axis of |vn|
    (TriObj.cpp:105-168). Differentiable given fixed axis choice."""
    import jax

    avn = jax.lax.stop_gradient(jnp.abs(vn))
    ax, ay, az = avn[..., 0], avn[..., 1], avn[..., 2]
    use_x = (ax >= ay) & (ax >= az)
    use_y = ~use_x & (ay >= ax) & (ay >= az)

    def proj(p):
        px = jnp.stack([p[..., 1], p[..., 2]], -1)
        py = jnp.stack([p[..., 0], p[..., 2]], -1)
        pz = jnp.stack([p[..., 0], p[..., 1]], -1)
        return jnp.where(
            use_x[..., None], px, jnp.where(use_y[..., None], py, pz)
        )

    p0, p1, p2, px = proj(v0), proj(v1), proj(v2), proj(x)

    def cross2(a, b):
        return a[..., 0] * b[..., 1] - a[..., 1] * b[..., 0]

    a0 = cross2(p1 - px, p2 - px) * 0.5
    a1 = cross2(p2 - px, p0 - px) * 0.5
    a2 = cross2(p0 - px, p1 - px) * 0.5
    return a0, a1, a2


def box_intersect(bmin, bmax, o, d, t_best):
    """Slab test. Returns (tmin, hit); hit when the box may contain a hit
    closer than t_best (Box.cpp:42: tMin <= tMax && tMin < t_max, plus a
    tMax >= 0 behind-the-ray prune)."""
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    ta = (bmin - o) * inv
    tb = (bmax - o) * inv
    tmin = jnp.max(jnp.minimum(ta, tb), axis=-1)
    tmax = jnp.min(jnp.maximum(ta, tb), axis=-1)
    hit = (tmin <= tmax) & (tmin < t_best) & (tmax >= 0.0)
    return tmin, hit
