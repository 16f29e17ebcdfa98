import jax.numpy as jnp
import numpy as np

from bhraytracer_tpu.accel.bvh import build_bvh, _build_bvh_py
from bhraytracer_tpu.ops.intersect import (
    box_intersect,
    plane_intersect,
    sphere_intersect,
    triangle_intersect,
)
from bhraytracer_tpu.ops.linalg import BIG


def test_sphere_front_back():
    o = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 0.0], [0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    t, front = sphere_intersect(o, d, "front")
    np.testing.assert_allclose(t[0], 4.0, rtol=1e-6)  # outside, toward
    assert t[1] == BIG  # inside: back-face only -> miss for front
    assert t[2] == BIG  # pointing away
    t, front = sphere_intersect(o, d, "both")
    np.testing.assert_allclose(t[1], 1.0, rtol=1e-6)  # inside: exit at t=1
    assert not bool(front[1])
    t, front = sphere_intersect(o, d, "back")
    np.testing.assert_allclose(t[0], 6.0, rtol=1e-6)  # far intersection


def test_sphere_unnormalized_dir():
    o = jnp.array([[0.0, 0.0, 5.0]])
    d = jnp.array([[0.0, 0.0, -2.0]])
    t, _ = sphere_intersect(o, d, "front")
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)  # t in param units


def test_plane_extent_and_sides():
    o = jnp.array([[0.0, 0.0, 2.0], [5.0, 0.0, 2.0], [0.5, -0.5, -1.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0], [0.0, 0.0, 1.0]])
    t, front = plane_intersect(o, d, "front")
    np.testing.assert_allclose(t[0], 2.0, rtol=1e-6)
    assert t[1] == BIG  # outside the unit extent
    assert t[2] == BIG  # back-face hit rejected for "front"
    t, front = plane_intersect(o, d, "both")
    np.testing.assert_allclose(t[2], 1.0, rtol=1e-6)
    assert not bool(front[2])


def test_triangle_basic_and_sides():
    v0 = jnp.array([[0.0, 0.0, 0.0]])
    v1 = jnp.array([[1.0, 0.0, 0.0]])
    v2 = jnp.array([[0.0, 1.0, 0.0]])
    o = jnp.array([[0.2, 0.2, 1.0]])
    d = jnp.array([[0.0, 0.0, -1.0]])
    # normal = +z; dir -z => tdiv < 0 => front.
    t, front = triangle_intersect(v0, v1, v2, o, d, "front")
    np.testing.assert_allclose(t[0], 1.0, rtol=1e-6)
    assert bool(front[0])
    # From below: back face.
    t, front = triangle_intersect(v0, v1, v2, -o, -d * -1.0, "front")
    assert t[0] == BIG
    # Outside the triangle.
    t, _ = triangle_intersect(
        v0, v1, v2, jnp.array([[0.9, 0.9, 1.0]]), d, "front"
    )
    assert t[0] == BIG


def test_box_intersect():
    bmin = jnp.array([-1.0, -1.0, -1.0])
    bmax = jnp.array([1.0, 1.0, 1.0])
    o = jnp.array([[0.0, 0.0, 5.0], [0.0, 0.0, 5.0], [0.0, 0.0, 0.0]])
    d = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [1.0, 0.0, 0.0]])
    tmin, hit = box_intersect(bmin, bmax, o, d, BIG)
    assert bool(hit[0]) and np.isclose(tmin[0], 4.0)
    assert not bool(hit[1])  # behind
    assert bool(hit[2])  # origin inside


def _random_mesh(rng, ntri=64):
    v = rng.normal(size=(ntri * 3, 3)).astype(np.float32)
    f = np.arange(ntri * 3, dtype=np.int32).reshape(ntri, 3)
    return v, f


def test_bvh_matches_bruteforce(rng):
    """The reference's own oracle pattern: USE_BVH off vs on
    (TriObj.cpp:28-38)."""
    from bhraytracer_tpu.scene.desc import MeshDesc, NodeDesc, SceneDesc, MaterialDesc, Transform
    from bhraytracer_tpu.scene.compile import compile_scene
    from bhraytracer_tpu.ops.trace import trace_closest

    v, f = _random_mesh(rng)
    mesh = MeshDesc(
        name="m", verts=v, faces=f,
        normals=np.tile(np.array([[0, 0, 1]], np.float32), (v.shape[0], 1)),
        face_normals=f, uvs=np.zeros((1, 3), np.float32),
        face_uvs=np.zeros_like(f), face_mtl=np.full(f.shape[0], -1, np.int32),
    )
    sd = SceneDesc()
    sd.meshes.append(mesh)
    sd.materials.append(MaterialDesc(name="m0"))
    sd.nodes.append(NodeDesc(kind="mesh", name="m", transform=Transform(), material=0, mesh=0))
    pack = compile_scene(sd)

    n = 256
    o = jnp.asarray(rng.normal(size=(n, 3)) * 3.0, jnp.float32)
    d = jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)

    hit = trace_closest(pack, o, d, "both")

    # Brute force over all (reordered) faces.
    fv = np.asarray(pack.face_v)
    verts = np.asarray(pack.verts)
    v0 = jnp.asarray(verts[fv[:, 0]])
    v1 = jnp.asarray(verts[fv[:, 1]])
    v2 = jnp.asarray(verts[fv[:, 2]])
    t_all, _ = triangle_intersect(
        v0[None], v1[None], v2[None], o[:, None, :], d[:, None, :], "both"
    )
    t_ref = np.min(np.asarray(t_all), axis=1)
    np.testing.assert_allclose(np.asarray(hit.t), t_ref, rtol=1e-4, atol=1e-5)


def test_bvh_builders_agree(rng):
    v, f = _random_mesh(rng, 50)
    a = build_bvh(v, f)
    b = _build_bvh_py(v, f)
    # Same number of nodes and identical root bounds; identical leaf coverage.
    assert a.bmin.shape == b.bmin.shape
    np.testing.assert_allclose(a.bmin[0], b.bmin[0])
    np.testing.assert_allclose(a.bmax[0], b.bmax[0])
    assert sorted(a.face_order.tolist()) == sorted(b.face_order.tolist())
    assert a.depth == b.depth
