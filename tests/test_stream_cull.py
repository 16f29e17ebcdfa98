"""Cluster-culled stream vs plain stream: bit-identical results.

The cull is a conservative per-row interval frustum test — a skipped
cluster cannot contain a face any lane in the row could accept — so
closest/anyhit results must be exactly equal, sorted or not. Runs
interpreted on CPU (conftest).
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bhraytracer_tpu.ops import trace as T
from bhraytracer_tpu.ops.linalg import BIG
from bhraytracer_tpu.ops.pallas_stream import stream_anyhit, stream_closest


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


def _rays(pack, n, seed, sort=True):
    rng = np.random.default_rng(seed)
    bmin = np.asarray(pack.bvh_bmin[0])
    bmax = np.asarray(pack.bvh_bmax[0])
    o = jnp.asarray(rng.uniform(bmin - 3, bmax + 3, (n, 3)), jnp.float32)
    target = jnp.asarray(rng.uniform(bmin, bmax, (n, 3)), jnp.float32)
    d = target - o
    if sort:
        from bhraytracer_tpu.ops.pallas_bvh import _coherence_order

        order = _coherence_order(pack, 0, o, d, jnp.full((n,), BIG))
        o, d = o[order], d[order]
    return o, d


@pytest.mark.parametrize("sort", [True, False])
def test_closest_cull_bit_identical(mesh_pack, sort):
    o, d = _rays(mesh_pack, 4096, 3, sort=sort)
    ti = jnp.full((o.shape[0],), BIG)
    t0, f0, fr0 = stream_closest(mesh_pack, o, d, "front", t_init=ti)
    t1, f1, fr1 = stream_closest(mesh_pack, o, d, "front", t_init=ti,
                                 cull=True)
    assert (np.asarray(t0) < BIG).sum() > 400
    np.testing.assert_array_equal(np.asarray(t0), np.asarray(t1))
    np.testing.assert_array_equal(np.asarray(f0), np.asarray(f1))
    np.testing.assert_array_equal(np.asarray(fr0), np.asarray(fr1))


def test_anyhit_cull_bit_identical(mesh_pack):
    o, d = _rays(mesh_pack, 4096, 5)
    tmax = jnp.full((o.shape[0],), 0.7)
    a = stream_anyhit(mesh_pack, o, d, 1e-4, tmax)
    b = stream_anyhit(mesh_pack, o, d, 1e-4, tmax, cull=True)
    assert np.asarray(a).sum() > 100
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.fixture
def _stream_routing():
    """Force pallas 'on' so reorder=True routes through the STREAM kernel
    (interpreted on CPU): under the conftest's 'auto' the CPU run takes the
    XLA while_loop path and set_stream_cull is a no-op — both legs would run
    identical code (round-4 advisor finding)."""
    T.set_pallas_mode("on")
    try:
        yield
    finally:
        T.set_pallas_mode("auto")


def test_trace_routing_cull_matches(mesh_pack, _stream_routing):
    """End-to-end trace_closest/trace_shadow with the cull switch on."""
    o, d = _rays(mesh_pack, 4096, 7, sort=False)
    h0 = T.trace_closest(mesh_pack, o, d, "front", reorder=True)
    T.set_stream_cull("on")
    try:
        h1 = T.trace_closest(mesh_pack, o, d, "front", reorder=True)
        occ0 = T.trace_shadow(mesh_pack, o, d, jnp.full((o.shape[0],), 0.7),
                              1e-4, reorder=True)
    finally:
        T.set_stream_cull("off")
    occ1 = T.trace_shadow(mesh_pack, o, d, jnp.full((o.shape[0],), 0.7),
                          1e-4, reorder=True)
    for a, b in zip(h0, h1):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(occ0), np.asarray(occ1))
