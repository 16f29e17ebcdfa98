"""resolve_hit fast_rows path: one packed row gather, bit-exact results.

pack.resolve_rows holds bit-identical copies of the verts/normals/uvs pool
entries per face (scene/compile.py); resolve_hit(fast_rows=True) must
therefore reproduce the pool-gather path EXACTLY (same f32 ops, same input
bits) for every Surface field. The fast path feeds non-differentiable
renders; the AD path keeps pool gathers so vertex grads reach pack.verts.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from bhraytracer_tpu.ops import trace as T
from bhraytracer_tpu.scene.xml_loader import load_scene
from tests.test_mesh_render import SCENE


@pytest.fixture(scope="module")
def pack(tmp_path_factory, gen_assets_root):
    scene = tmp_path_factory.mktemp("rows_scene") / "scene.xml"
    scene.write_text(SCENE)
    pk, _cam = load_scene(str(scene), resource_root=gen_assets_root)
    return pk


def _rays(rng, n=700):
    # Aim at the teapot (~unit scale at origin) from a shell of origins so a
    # healthy fraction hits mesh, some hit the ground plane, some miss.
    o = rng.normal(size=(n, 3)) * 3 + [0, -10, 5]
    aim = rng.normal(size=(n, 3)) * 1.2
    d = aim - o
    return jnp.asarray(o, jnp.float32), jnp.asarray(d, jnp.float32)


def test_rows_table_matches_pools(pack):
    """The packed table is a bit-identical copy of the pool entries."""
    rows = np.asarray(pack.resolve_rows)
    fv = np.asarray(pack.face_v)
    fn = np.asarray(pack.face_vn)
    ft = np.asarray(pack.face_vt)
    verts = np.asarray(pack.verts)
    normals = np.asarray(pack.normals)
    uvs = np.asarray(pack.uvs)
    nf = fv.shape[0]
    np.testing.assert_array_equal(rows[:, 0:9], verts[fv].reshape(nf, 9))
    np.testing.assert_array_equal(rows[:, 9:18], normals[fn].reshape(nf, 9))
    np.testing.assert_array_equal(rows[:, 18:27], uvs[ft].reshape(nf, 9))
    np.testing.assert_array_equal(rows[:, 27].astype(np.int32),
                                  np.asarray(pack.face_mtl))


@pytest.mark.parametrize("minimal", [False, True])
def test_fast_rows_bit_exact(pack, rng, minimal):
    o, d = _rays(rng)
    zero = jnp.zeros(3)
    hit = T.trace_closest(pack, o, d, "both")
    assert int(np.asarray(hit.hit).sum()) > 100
    slow = jax.jit(lambda: T.resolve_hit(pack, o, d, hit, zero, zero,
                                         minimal=minimal))()
    fast = jax.jit(lambda: T.resolve_hit(pack, o, d, hit, zero, zero,
                                         minimal=minimal, fast_rows=True))()
    for name in ("p", "n", "uvw", "duvw", "z"):
        np.testing.assert_array_equal(
            np.asarray(getattr(slow, name)), np.asarray(getattr(fast, name)),
            err_msg=name)
    np.testing.assert_array_equal(np.asarray(slow.mtl), np.asarray(fast.mtl))
