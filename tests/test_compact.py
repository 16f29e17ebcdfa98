"""ops/compact must reproduce the argsort-based compaction bit-for-bit
(RNG lane streams are positional: any order change would shift threefry
streams and break golden renders)."""

import jax
import jax.numpy as jnp
import numpy as np

from bhraytracer_tpu.ops.compact import inverse_permutation, partition_indices


def test_partition_matches_stable_argsort():
    rng = np.random.default_rng(0)
    for n in (1, 7, 128, 1000):
        for p in (0.0, 0.03, 0.5, 0.97, 1.0):
            mask = jnp.asarray(rng.random(n) < p)
            ref = jnp.argsort(~mask, stable=True)
            got = partition_indices(mask)
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
            for k in (1, n // 2 or 1, n):
                np.testing.assert_array_equal(
                    np.asarray(partition_indices(mask, k)),
                    np.asarray(ref[:k]))


def test_inverse_permutation():
    rng = np.random.default_rng(1)
    for n in (1, 5, 333, 4096):
        order = jnp.asarray(rng.permutation(n).astype(np.int32))
        ref = jnp.argsort(order, stable=True)
        got = inverse_permutation(order)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_lookup_rows_bitexact():
    rng = np.random.default_rng(2)
    for rows in (1, 2, 6, 16, 64, 257, 1000):
        for shape in ((3,), (3, 3), ()):
            tab = jnp.asarray(rng.random((rows,) + shape), jnp.float32)
            idx = jnp.asarray(rng.integers(-2, rows + 2, 500), jnp.int32)
            from bhraytracer_tpu.ops.compact import lookup_rows

            got = lookup_rows(tab, idx)
            ref = tab[jnp.clip(idx, 0, rows - 1)]
            np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # int tables fall back to gather
    tab_i = jnp.asarray(rng.integers(0, 9, (7, 3)), jnp.int32)
    idx = jnp.asarray(rng.integers(0, 7, 100), jnp.int32)
    from bhraytracer_tpu.ops.compact import lookup_rows

    np.testing.assert_array_equal(np.asarray(lookup_rows(tab_i, idx)),
                                  np.asarray(tab_i[idx]))


def test_lookup_rows_grad_matches_gather():
    from bhraytracer_tpu.ops.compact import lookup_rows

    rng = np.random.default_rng(3)
    tab = jnp.asarray(rng.random((6, 3)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, 6, 64), jnp.int32)
    w = jnp.asarray(rng.random((64, 3)), jnp.float32)
    g1 = jax.grad(lambda t: jnp.sum(lookup_rows(t, idx) * w))(tab)
    g2 = jax.grad(lambda t: jnp.sum(t[idx] * w))(tab)
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g2), rtol=1e-6)
