"""Streamed photon gather (ops/pallas_photon, interpret mode) vs the XLA
grid-bucket fold — identical accept sets, float sum order differs.

Includes a caustic-style DENSITY SKEW population (half the photons inside
one gather radius) — the case whose true max bucket occupancy degenerates
the grid fold's serialized loop and crashed the TPU worker (round-5 bench,
proj13)."""

import numpy as np
import pytest

import jax.numpy as jnp

from bhraytracer_tpu.models.photonmap import build_grid_index, gather_irradiance


def _map_and_queries(n_ph=4096, n_q=512, skew=False, seed=0):
    rng = np.random.default_rng(seed)
    pos = rng.uniform(-2, 2, (n_ph, 3)).astype(np.float32)
    if skew:
        # Focal cluster: half the photons inside one radius.
        pos[: n_ph // 2] = (0.3 + rng.normal(0, 0.02, (n_ph // 2, 3))
                            ).astype(np.float32)
    dirn = rng.normal(size=(n_ph, 3)).astype(np.float32)
    dirn /= np.linalg.norm(dirn, axis=1, keepdims=True)
    power = rng.uniform(0, 1, (n_ph, 3)).astype(np.float32)
    pmap = build_grid_index(jnp.asarray(pos), jnp.asarray(dirn),
                            jnp.asarray(power), radius=0.25)
    qp = rng.uniform(-2, 2, (n_q, 3)).astype(np.float32)
    if skew:
        qp[: n_q // 2] = (0.3 + rng.normal(0, 0.05, (n_q // 2, 3))
                          ).astype(np.float32)
    qn = rng.normal(size=(n_q, 3)).astype(np.float32)
    qn /= np.linalg.norm(qn, axis=1, keepdims=True)
    return pmap, jnp.asarray(qp), jnp.asarray(qn)


@pytest.mark.parametrize("skew", [False, True])
@pytest.mark.parametrize("k", [None, 32])
def test_stream_matches_grid_fold(skew, k):
    from bhraytracer_tpu.ops import trace as T

    pmap, qp, qn = _map_and_queries(skew=skew)
    irr0, ds0 = gather_irradiance(pmap, qp, qn, k=k)  # grid fold (auto=CPU)
    T.set_pallas_mode("on")  # interpret-mode stream kernels
    try:
        irr1, ds1 = gather_irradiance(pmap, qp, qn, k=k)
    finally:
        T.set_pallas_mode("auto")
    irr0, irr1 = np.asarray(irr0), np.asarray(irr1)
    np.testing.assert_allclose(irr1, irr0, rtol=2e-5, atol=1e-6)
    # Direction sums: normalize() of near-zero sums is noisy; compare only
    # where the unnormalized magnitude is meaningful on the fold side.
    np.testing.assert_allclose(np.asarray(ds1), np.asarray(ds0),
                               rtol=1e-3, atol=1e-3)


def test_skewed_cell_cap_is_pathological():
    """Documents WHY the stream path exists: the skewed map's true max
    bucket occupancy is a large fraction of the photon count."""
    pmap, _, _ = _map_and_queries(skew=True)
    assert pmap.cell_cap > 1000  # ~half of 4096 lands in one cell
