"""Small batched vector helpers (cyVector.h's used subset, vectorized).

All functions operate on trailing-dim-3 arrays and are NaN-safe for
reverse-mode autodiff (guarded sqrt/div), which the reference never needed
but gradients do.
"""

from __future__ import annotations

import jax.numpy as jnp

BIG = 1.0e30


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def safe_sqrt(x):
    return jnp.sqrt(jnp.maximum(x, 0.0))


def safe_div(a, b, eps: float = 1e-30):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def norm(a, keepdims: bool = False):
    return safe_sqrt(dot(a, a, keepdims=keepdims))


def normalize(a):
    n = norm(a, keepdims=True)
    return a / jnp.maximum(n, 1e-30)


def acos_safe(x):
    """ACosSafe (cyCore.h:193)."""
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


def asin_safe(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def mat_vec(m, v):
    """Batched (..., 3, 3) @ (..., 3)."""
    return jnp.einsum("...ij,...j->...i", m, v)


def mat_t_vec(m, v):
    """Batched transpose(m) @ v — the reference's TransposeMult
    (scene.h:238-245), used for normal transforms."""
    return jnp.einsum("...ji,...j->...i", m, v)
