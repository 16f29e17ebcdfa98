"""Small batched vector helpers (cyVector.h's used subset, vectorized).

All functions operate on trailing-dim-3 arrays and are NaN-safe for
reverse-mode autodiff (guarded sqrt/div), which the reference never needed
but gradients do.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

BIG = 1.0e30


def dot(a, b, keepdims: bool = False):
    return jnp.sum(a * b, axis=-1, keepdims=keepdims)


def cross(a, b):
    return jnp.cross(a, b)


def safe_sqrt(x):
    # Floor strictly above 0: d(sqrt)/dx at 0 is inf and would poison
    # reverse-mode through any downstream jnp.where.
    return jnp.sqrt(jnp.maximum(x, 1e-24))


def safe_pow(x, p):
    """x**p with zero (not NaN) gradient where x <= 0. jnp.power computes
    exp(p log x); at x == 0 the VJP is NaN even though the forward is 0."""
    x_safe = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.power(x_safe, p), 0.0)


def safe_div(a, b, eps: float = 1e-30):
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def norm(a, keepdims: bool = False):
    return safe_sqrt(dot(a, a, keepdims=keepdims))


def normalize(a):
    n = norm(a, keepdims=True)
    return a / jnp.maximum(n, 1e-30)


@jax.custom_jvp
def acos_safe(x):
    """ACosSafe (cyCore.h:193). Forward is the reference's clamped arccos,
    bit-exact; the derivative -1/sqrt(1-x^2) is clamped away from the |x|=1
    pole (it is infinite there and turns any 0*inf in reverse mode into NaN
    — seen as NaN glossiness gradients whenever a lobe sample draws u ~ 1)."""
    return jnp.arccos(jnp.clip(x, -1.0, 1.0))


@acos_safe.defjvp
def _acos_safe_jvp(primals, tangents):
    (x,), (dx,) = primals, tangents
    xc = jnp.clip(x, -1.0 + 1e-6, 1.0 - 1e-6)
    return acos_safe(x), -dx / jnp.sqrt(1.0 - xc * xc)


def asin_safe(x):
    return jnp.arcsin(jnp.clip(x, -1.0, 1.0))


def mat_vec(m, v):
    """Batched (..., 3, 3) @ (..., 3)."""
    return jnp.einsum("...ij,...j->...i", m, v)


def mat_t_vec(m, v):
    """Batched transpose(m) @ v — the reference's TransposeMult
    (scene.h:238-245), used for normal transforms."""
    return jnp.einsum("...ji,...j->...i", m, v)
