import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.io.photon_dat import (
    PHOTON_DTYPE,
    decode_photons,
    encode_photons,
    read_dat,
    write_dat,
)
from bhraytracer_tpu.models.photonmap import (
    build_grid_index,
    build_photon_map,
    gather_irradiance,
)


def test_dat_roundtrip(tmp_path, rng):
    n = 100
    pos = rng.normal(size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3))
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    power = rng.uniform(0.1, 2.0, size=(n, 3)).astype(np.float32)
    p = str(tmp_path / "pm.dat")
    write_dat(p, pos, d, power)
    assert (tmp_path / "pm.dat").stat().st_size == n * PHOTON_DTYPE.itemsize == n * 24
    pos2, d2, power2 = read_dat(p)
    np.testing.assert_allclose(pos2, pos, rtol=1e-6)
    # Power: Color24 quantization => ~1/255 relative error.
    np.testing.assert_allclose(power2, power, atol=np.abs(power).max() / 100)
    # Direction: x matches to short precision; z magnitude = sqrt(1-x^2)
    # (the reference's integer-decode quirk ignores y).
    np.testing.assert_allclose(d2[:, 0], d[:, 0], atol=1e-3)
    np.testing.assert_allclose(np.sign(d2[:, 2]), np.sign(d[:, 2]).astype(np.float32))
    np.testing.assert_allclose(
        np.abs(d2[:, 2]), np.sqrt(np.maximum(1 - d[:, 0] ** 2, 0)), atol=2e-3
    )


def test_grid_gather_matches_bruteforce(rng):
    n = 2000
    pos = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    dirn = np.tile(np.array([[0, 0, -1]], np.float32), (n, 1))
    power = rng.uniform(0, 1, size=(n, 3)).astype(np.float32) / n
    radius = 0.5
    pmap = build_grid_index(pos, dirn, power, radius, cell_cap=256)

    q = rng.uniform(-1, 1, size=(16, 3)).astype(np.float32)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (16, 1))
    irr, _ = jax.jit(gather_irradiance)(pmap, jnp.asarray(q), jnp.asarray(nrm))
    irr = np.asarray(irr)

    # Brute force: photons within radius whose dir . n < 0.
    for i in range(16):
        d2 = np.sum((pos - q[i]) ** 2, axis=1)
        sel = (d2 < radius * radius) & (dirn @ nrm[i] < 0)
        expect = power[sel].sum(axis=0) / (np.pi * radius * radius)
        np.testing.assert_allclose(irr[i], expect, rtol=1e-4, atol=1e-6)


def test_knn_radius_shrink_matches_bruteforce(rng):
    """kNN parity (cyPhotonMap.h:443-494): in a dense cluster the gather
    radius shrinks to the k-th-nearest distance and the estimate uses only
    the k nearest photons. Compare against a brute-force numpy kNN."""
    k = 100
    n = 5000
    # Dense Gaussian cluster: far more than k photons inside the radius.
    pos = rng.normal(0, 0.15, size=(n, 3)).astype(np.float32)
    dirn = np.tile(np.array([[0, 0, -1]], np.float32), (n, 1))
    power = rng.uniform(0, 1, size=(n, 3)).astype(np.float32) / n
    radius = 0.5
    pmap = build_grid_index(pos, dirn, power, radius)

    q = np.array([[0.0, 0.0, 0.0], [0.05, -0.02, 0.01],
                  [2.0, 2.0, 2.0]], np.float32)  # last: sparse (no shrink)
    nrm = np.tile(np.array([[0, 0, 1]], np.float32), (q.shape[0], 1))
    irr, _ = jax.jit(lambda p, qq, nn: gather_irradiance(p, qq, nn, k=k))(
        pmap, jnp.asarray(q), jnp.asarray(nrm))
    irr = np.asarray(irr)

    for i in range(q.shape[0]):
        d2 = np.sum((pos - q[i]) ** 2, axis=1)
        sel = (d2 < radius * radius) & (dirn @ nrm[i] < 0)
        if sel.sum() > k:
            d2s = np.sort(d2[sel])
            t = d2s[k - 1]  # k-th nearest distance^2
            take = sel & (d2 <= t)
            expect = power[take].sum(axis=0) / (np.pi * t)
        else:
            expect = power[sel].sum(axis=0) / (np.pi * radius * radius)
        # Histogram threshold resolves t to r^2/4096: a few boundary photons
        # and the slightly-larger area differ from exact kNN -> ~2% tol.
        np.testing.assert_allclose(irr[i], expect, rtol=0.02, atol=1e-7)


def test_grid_index_cap_covers_occupancy(rng):
    """build_grid_index's default cap equals the max bucket occupancy —
    nothing is silently dropped even with every photon in one cell."""
    pos = np.zeros((300, 3), np.float32) + rng.uniform(
        0, 0.01, size=(300, 3)).astype(np.float32)
    dirn = np.tile(np.array([[0, 0, -1]], np.float32), (300, 1))
    power = np.full((300, 3), 1.0 / 300, np.float32)
    pmap = build_grid_index(pos, dirn, power, 0.5)
    assert pmap.cell_cap >= 300
    irr, _ = gather_irradiance(pmap, jnp.zeros((1, 3)),
                               jnp.asarray([[0.0, 0.0, 1.0]]))
    # All 300 photons accepted: sum(power)/(pi r^2) == 1/(pi * 0.25).
    np.testing.assert_allclose(np.asarray(irr)[0], 1.0 / (np.pi * 0.25),
                               rtol=1e-4)


def test_hemisphere_rejection(rng):
    # Photons coming from *below* must be rejected for an up-facing normal.
    pos = np.zeros((10, 3), np.float32)
    dirn = np.tile(np.array([[0, 0, 1]], np.float32), (10, 1))  # dir . n > 0
    power = np.ones((10, 3), np.float32)
    pmap = build_grid_index(pos, dirn, power, 0.5)
    irr, _ = gather_irradiance(
        pmap, jnp.zeros((1, 3)), jnp.asarray([[0.0, 0.0, 1.0]])
    )
    np.testing.assert_allclose(np.asarray(irr), 0.0)


@pytest.fixture(scope="module")
def photon_scene():
    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene

    sd = D.SceneDesc()
    floor = D.MaterialDesc(name="floor")
    floor.diffuse = D.TexturedColorDesc(color=np.array([0.8, 0.8, 0.8]))
    floor.specular = D.TexturedColorDesc(color=np.zeros(3))
    glass = D.MaterialDesc(name="glass")
    glass.diffuse = D.TexturedColorDesc(color=np.zeros(3))
    glass.specular = D.TexturedColorDesc(color=np.zeros(3))
    glass.refraction = D.TexturedColorDesc(color=np.array([0.95, 0.95, 0.95]))
    glass.ior = 1.5
    sd.materials += [floor, glass]

    t = D.Transform()
    t.scale(20.0, 20.0, 20.0)
    sd.nodes.append(D.NodeDesc(kind="plane", name="floor", transform=t, material=0))
    t2 = D.Transform()
    t2.translate(np.array([0.0, 0.0, 3.0]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="ball", transform=t2, material=1))
    sd.lights.append(
        D.LightDesc(kind="point", intensity=np.full(3, 10.0),
                    position=np.array([0.0, 0.0, 8.0]), size=1.0)
    )
    return compile_scene(sd)


def test_build_caustic_map(photon_scene):
    cfg = RenderConfig(photon_count=1024, tir_bounces=4)
    pmap = build_photon_map(photon_scene, cfg, seed=0, caustic=True, batch=8192)
    pos = np.asarray(pmap.pos)
    power = np.asarray(pmap.power)
    assert pos.shape[0] >= 512  # photons actually deposited
    # Caustic photons land on the floor (z ~ 0), concentrated under the ball.
    assert np.abs(pos[:, 2]).max() < 1.0
    assert power.sum() > 0
    r_xy = np.linalg.norm(pos[:, :2], axis=1)
    # The glass sphere focuses light under itself.
    assert np.median(r_xy) < 4.0


def test_build_regular_map():
    """Regular (non-caustic) map needs indirect diffuse paths: a diffuse
    sphere above a floor gives floor deposits from sphere bounces."""
    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene

    sd = D.SceneDesc()
    diff = D.MaterialDesc(name="d")
    diff.diffuse = D.TexturedColorDesc(color=np.array([0.8, 0.8, 0.8]))
    diff.specular = D.TexturedColorDesc(color=np.zeros(3))
    sd.materials.append(diff)
    t = D.Transform()
    t.scale(20.0, 20.0, 20.0)
    sd.nodes.append(D.NodeDesc(kind="plane", name="floor", transform=t, material=0))
    t2 = D.Transform()
    t2.scale(2.0, 2.0, 2.0)
    t2.translate(np.array([0.0, 0.0, 4.0]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="ball", transform=t2, material=0))
    sd.lights.append(
        D.LightDesc(kind="point", intensity=np.full(3, 10.0),
                    position=np.array([0.0, 0.0, 8.0]), size=1.0)
    )
    pack = compile_scene(sd)
    cfg = RenderConfig(photon_count=1024, tir_bounces=4)
    pmap = build_photon_map(pack, cfg, seed=1, caustic=False, batch=8192)
    assert np.asarray(pmap.pos).shape[0] >= 256
