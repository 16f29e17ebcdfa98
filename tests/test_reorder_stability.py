"""Unstable coherence-reorder sort must be invisible in trace outputs.

The per-trace reorder is sort -> trace -> unsort and every traced quantity
is a per-lane function of that lane's own ray, so the sort's tie order
(stable vs unstable) cannot change active-lane results. These tests pin the
bit-equality that lets `_STABLE_REORDER = False` (the ~2x cheaper sort,
tools/drill_sort480.py) ship safely.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bhraytracer_tpu.ops import pallas_bvh as PB
from bhraytracer_tpu.ops import trace as T
from bhraytracer_tpu.ops.linalg import BIG
from bhraytracer_tpu.ops.trace import trace_closest, trace_shadow


@pytest.fixture(autouse=True)
def _packet_reorder_path():
    """Route reorder=True queries through the PACKET kernel (interpreted on
    CPU) so _coherence_order actually executes: with pallas 'auto' the CPU
    conftest takes the XLA while_loop path, and with stream 'on' (the
    shipped default) reorder=True skips the sort entirely — either way both
    A/B legs would run identical sort-free code and the test would pin
    nothing (round-4 advisor finding)."""
    T.set_pallas_mode("on")
    T.set_stream_mode("off")
    try:
        yield
    finally:
        T.set_pallas_mode("auto")
        T.set_stream_mode("on")


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


def _ab(fn):
    default = PB._STABLE_REORDER
    try:
        PB.set_stable_reorder(True)
        a = fn()
        PB.set_stable_reorder(False)
        b = fn()
    finally:
        PB.set_stable_reorder(default)  # loadscope workers share the module
    return a, b


def test_closest_bit_identical(mesh_pack):
    o, d = _rays(mesh_pack, 2048, 7)

    def run():
        h = trace_closest(mesh_pack, o, d, "front", reorder=True)
        return [np.asarray(x) for x in (h.t, h.kind, h.inst, h.face,
                                        h.front, h.hit)]

    a, b = _ab(run)
    n_hit = (a[0] < BIG).sum()
    assert n_hit > 200
    for xa, xb in zip(a, b):
        np.testing.assert_array_equal(xa, xb)


def test_shadow_bit_identical(mesh_pack):
    o, d = _rays(mesh_pack, 2048, 11)

    def run():
        return np.asarray(
            trace_shadow(mesh_pack, o, d, jnp.full((o.shape[0],), 1e4),
                         1e-4, reorder=True))

    a, b = _ab(run)
    assert a.sum() > 200
    np.testing.assert_array_equal(a, b)
