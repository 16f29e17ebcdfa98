"""Monte-Carlo direction samplers.

Stateless re-implementations of the reference's rand()-driven samplers
(MtlBlinn.cpp:591-716): every function takes explicit uniform variates (from
threefry keys) instead of shared-state rand(), fixing the reference's
OpenMP-racy RNG (MtlBlinn.cpp:42-49) by construction.
"""

from __future__ import annotations

import jax.numpy as jnp

from bhraytracer_tpu.ops.linalg import cross, dot, normalize, safe_sqrt

TWO_PI = 2.0 * jnp.pi


def crossing_vector(v):
    """GetRandomCrossingVector (MtlBlinn.cpp:591-600): (0,0,1) unless v is
    (anti)parallel to it. The reference then retries with random vectors; we
    use the deterministic fallback (1,0,0) (only differs in the degenerate
    case)."""
    z = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), v.shape)
    x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0]), v.shape)
    cz = cross(v, z)
    degenerate = dot(cz, cz) < 1e-12
    return jnp.where(degenerate[..., None], x, z)


def _frame_axes(n):
    """The reference's tangent frame: axis1 = crossing x N, axis2 = axis1 x N
    (both then normalized), per GetSampleAlongNormal (MtlBlinn.cpp:612-613)."""
    a1 = normalize(cross(crossing_vector(n), n))
    a2 = normalize(cross(a1, n))
    return a1, a2


def sample_along_normal(n, radius, u1, u2):
    """Uniform disc of radius `radius` around the tip of (unnormalized) n
    (MtlBlinn.cpp:602-617). Used for point-light soft shadows
    (PointLight.cpp:13-14)."""
    r = jnp.sqrt(u1) * radius
    theta = u2 * TWO_PI
    a1, a2 = _frame_axes(n)
    return n + a1 * (r * jnp.cos(theta))[..., None] + a2 * (r * jnp.sin(theta))[..., None]


def sample_along_light_direction(n, glossiness, u1, u2):
    """Phong-lobe-ish sample around (unnormalized) n with exponent
    `glossiness` (MtlBlinn.cpp:619-635). Returns (dir, cos_theta); dir is
    NOT normalized (reference parity).

    The reference computes theta = acos(u^(1/(g+1))) then tan(theta); both
    transcendentals are eliminated algebraically (cos theta = c,
    tan theta = sqrt(1-c^2)/c for theta in [0, pi/2)) — the VPU pays only
    the irreducible pow. Callers only ever consume cos(theta), so the
    angle itself is never materialized."""
    c = jnp.power(jnp.maximum(u1, 1e-12), 1.0 / (glossiness + 1.0))
    r = safe_sqrt(jnp.maximum(1.0 - c * c, 0.0)) / jnp.maximum(c, 1e-30)
    phi = u2 * TWO_PI
    a1, a2 = _frame_axes(n)
    d = n + a1 * (r * jnp.cos(phi))[..., None] + a2 * (r * jnp.sin(phi))[..., None]
    return d, c


def sample_in_semisphere(n, u1, u2):
    """Hemisphere sample around normalized n (MtlBlinn.cpp:697-716).

    theta = 0.5*acos(1-2u) in [0, pi/2); returns (dir, sin_2theta) with dir
    normalized (the reference normalizes at the call sites). Half-angle
    identities replace the acos/sin/cos chain: cos theta = sqrt(1-u),
    sin theta = sqrt(u), sin 2theta = 2 sqrt(u(1-u)). The only consumer of
    theta is the reference's sin(2 theta) pdf weight (MtlBlinn.cpp:377)."""
    a_y = normalize(cross(n, crossing_vector(n)))
    a_x = cross(n, a_y)
    phi = u1 * TWO_PI
    ct = safe_sqrt(jnp.maximum(1.0 - u2, 0.0))
    st = safe_sqrt(jnp.maximum(u2, 0.0))
    d = (
        (st * jnp.cos(phi))[..., None] * a_x
        + (st * jnp.sin(phi))[..., None] * a_y
        + ct[..., None] * n
    )
    return d, 2.0 * st * ct
