"""Wavefront compaction primitives.

XLA lowers `jnp.argsort` on TPU to a bitonic sorting network — O(n log^2 n)
full-array passes. The integrator only ever needs two special cases, both
O(n):

  * stable mask-partition (live lanes first, original order preserved) —
    a prefix-sum over the mask plus one scatter;
  * permutation inverse — one scatter.

Both reproduce the corresponding `jnp.argsort(..., stable=True)` result
bit-for-bit, so RNG lane streams (threefry keyed by compacted position) and
golden images are unchanged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Stable-partition implementation: "scan" = cumsum + one N-sized scatter;
# "topk" = lax.top_k over a rank score (no scatter; XLA:TPU's TopK custom
# call vs its serialized per-element scatter). Both produce bit-identical
# index lists. "auto" (default) picks topk at wavefront widths and scan
# below: the round-4 honest 480K sweep (after the jit-cache fix — the r3
# "topk slower" reading was the cache artifact re-measuring baseline)
# has topk 9.3 ms/chunk faster at 480K.
_PARTITION_METHOD = "auto"
_TOPK_MIN_N = 1 << 17


def set_partition_method(method: str) -> None:
    global _PARTITION_METHOD
    assert method in ("scan", "topk", "auto")
    _PARTITION_METHOD = method


def partition_indices(mask: jnp.ndarray, k: int | None = None) -> jnp.ndarray:
    """Indices of the stable partition that places `mask` lanes first.

    Equivalent to ``jnp.argsort(~mask, stable=True)[:k]`` (ascending sort of
    the negated mask: True lanes first, ties in original order) at O(n) cost.
    `k` truncates the result (default n).
    """
    n = mask.shape[0]
    k = n if k is None else k
    method = _PARTITION_METHOD
    if method == "auto":
        method = "topk" if n >= _TOPK_MIN_N else "scan"
    if method == "topk":
        # Rank score: True lanes in [n+1, 2n] descending in i, False lanes
        # in [1, n] descending in i -> top_k (descending, stable) yields
        # True lanes in ascending-i order, then False lanes ascending.
        i = jnp.arange(n, dtype=jnp.int32)
        score = jnp.where(mask, 2 * n - i, n - i)
        return jax.lax.top_k(score, k)[1].astype(jnp.int32)
    m = mask.astype(jnp.int32)
    c_true = jnp.cumsum(m)
    n_true = c_true[-1]
    # Destination of each lane in the partitioned order.
    pos = jnp.where(mask, c_true - 1, n_true + jnp.cumsum(1 - m) - 1)
    # Inverse-scatter; destinations >= k fall outside and are dropped.
    return (
        jnp.zeros((k,), jnp.int32)
        .at[pos]
        .set(jnp.arange(n, dtype=jnp.int32), mode="drop")
    )


def lookup_rows(tab: jnp.ndarray, idx: jnp.ndarray,
                max_onehot_rows: int = 256) -> jnp.ndarray:
    """Row lookup `tab[idx]` (indices clamped), avoiding XLA's TPU gather
    for small tables.

    XLA fuses tiny-table gathers into consumer elementwise loops and pays
    ~1.6 ms for a (6,3,3) table at 102K lanes where the alternatives run
    the same lookup in ~0.7 ms (round-2 ledger; optimization_barrier does
    NOT help). Both alternatives are BIT-EXACT:
      - rows <= 16: an unrolled where-chain (pure VPU selects) — fastest;
      - rows <= max_onehot_rows: one-hot matmul at Precision.HIGHEST (the
        default TPU matmul precision rounds f32 operands to bf16 and is
        NOT bit-exact — measured); its VJP w.r.t. tab is the same
        scatter-add a gather would produce.
    Larger tables fall back to a plain gather.
    """
    rows = tab.shape[0]
    idx = jnp.clip(idx, 0, rows - 1)
    if rows <= 16 and tab.dtype in (jnp.int32, jnp.bool_):
        # Small int/bool tables take the same where-chain: XLA:TPU lowers
        # even a (K,) i32 gather at wavefront width to a serialized
        # per-element loop (~30ns/lane), so selects win by the same margin
        # as the f32 case (round-3 ledger).
        flat = tab.reshape(rows, -1)
        out = jnp.broadcast_to(flat[0][None], idx.shape + flat.shape[1:])
        for k in range(1, rows):
            out = jnp.where((idx == k).reshape(idx.shape + (1,) * (flat.ndim - 1)),
                            flat[k][None], out)
        return out.reshape(idx.shape + tab.shape[1:])
    if tab.dtype != jnp.float32 or rows > max_onehot_rows:
        return tab[idx]
    if rows <= 16:
        flat = tab.reshape(rows, -1)
        out = jnp.broadcast_to(flat[0][None], idx.shape + flat.shape[1:])
        for k in range(1, rows):
            out = jnp.where((idx == k).reshape(idx.shape + (1,) * (flat.ndim - 1)),
                            flat[k][None], out)
        return out.reshape(idx.shape + tab.shape[1:])
    flat = tab.reshape(rows, -1)
    oh = jax.nn.one_hot(idx, rows, dtype=tab.dtype)
    out = jax.lax.dot(oh, flat, precision=jax.lax.Precision.HIGHEST)
    return out.reshape(idx.shape + tab.shape[1:])


def inverse_permutation(order: jnp.ndarray) -> jnp.ndarray:
    """Inverse of a permutation: `inv[order[i]] = i`.

    Equivalent to ``jnp.argsort(order, stable=True)`` when `order` is a
    permutation, at one-scatter cost.
    """
    n = order.shape[0]
    return (
        jnp.zeros((n,), jnp.int32)
        .at[order]
        .set(jnp.arange(n, dtype=jnp.int32))
    )
