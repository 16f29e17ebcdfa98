"""Sub-packet (per-row-stack) BVH kernel vs the XLA reference traversal.

Runs interpreted on CPU (conftest); the kernels compile on TPU only.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bhraytracer_tpu.ops.linalg import BIG
from experiments.pallas_bvh_subpacket import (
    bvh_anyhit_subpacket,
    bvh_closest_subpacket,
)
from bhraytracer_tpu.ops.trace import MESH_SHADOW_BIAS, bvh_anyhit, bvh_closest


@pytest.fixture(scope="module")
def mesh_pack(gen_assets_root):
    import os

    from bhraytracer_tpu.scene import desc as D
    from bhraytracer_tpu.scene.compile import compile_scene
    from bhraytracer_tpu.scene.obj_loader import load_obj

    teapot = os.path.join(gen_assets_root, "Resource", "Data", "teapot.obj")
    sd = D.SceneDesc()
    sd.materials.append(D.MaterialDesc(name="m"))
    sd.meshes.append(load_obj(teapot))
    sd.nodes.append(D.NodeDesc(kind="mesh", name="t", transform=D.Transform(),
                               material=0, mesh=0))
    return compile_scene(sd)


def _rays(pack, n, seed):
    rng = np.random.default_rng(seed)
    bmin = np.asarray(pack.bvh_bmin[0])
    bmax = np.asarray(pack.bvh_bmax[0])
    o = jnp.asarray(rng.uniform(bmin - 3, bmax + 3, (n, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(bmin, bmax, (n, 3)), jnp.float32)
    return o, target - o


@pytest.mark.parametrize("side", ["front", "both"])
def test_subpacket_closest_matches_xla(mesh_pack, side):
    o, d = _rays(mesh_pack, 1024, 1)
    ti = jnp.full((o.shape[0],), BIG)
    t0, f0, fr0 = bvh_closest(mesh_pack, 0, o, d, side, ti)
    t1, f1, fr1 = bvh_closest_subpacket(mesh_pack, 0, o, d, side, ti)
    hit = np.asarray(t0) < BIG
    assert hit.sum() > 100  # the comparison must exercise real hits
    # rtol 1e-4: the two programs compile separately, so FMA contraction
    # differs in the last bits (observed 5e-6 relative on 1/657 lanes).
    np.testing.assert_allclose(np.asarray(t1)[hit], np.asarray(t0)[hit],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_array_equal(np.asarray(f1)[hit], np.asarray(f0)[hit])
    np.testing.assert_array_equal(np.asarray(fr1)[hit], np.asarray(fr0)[hit])
    assert (np.asarray(t1)[~hit] >= BIG).all()


def test_subpacket_anyhit_matches_xla(mesh_pack):
    o, d = _rays(mesh_pack, 1024, 2)
    tm = jnp.full((o.shape[0],), 1.0)
    a0 = bvh_anyhit(mesh_pack, 0, o, d, MESH_SHADOW_BIAS, tm)
    a1 = bvh_anyhit_subpacket(mesh_pack, 0, o, d, MESH_SHADOW_BIAS, tm)
    assert int(np.asarray(a0).sum()) > 50
    np.testing.assert_array_equal(np.asarray(a1), np.asarray(a0))


def test_subpacket_t_init_pruning(mesh_pack):
    """Lanes seeded with a nearer analytic hit must keep it."""
    o, d = _rays(mesh_pack, 512, 3)
    ti_open = jnp.full((o.shape[0],), BIG)
    t_open, _, _ = bvh_closest_subpacket(mesh_pack, 0, o, d, "front", ti_open)
    seed = jnp.where(jnp.arange(o.shape[0]) % 2 == 0, 1e-3, BIG)
    t_seeded, _, _ = bvh_closest_subpacket(mesh_pack, 0, o, d, "front",
                                           jnp.asarray(seed, jnp.float32))
    even = np.arange(o.shape[0]) % 2 == 0
    assert (np.asarray(t_seeded)[even] <= 1e-3 + 1e-9).all()
    np.testing.assert_allclose(np.asarray(t_seeded)[~even],
                               np.asarray(t_open)[~even], rtol=1e-5)
