"""Streaming (brute-force face) kernel vs the XLA reference traversal.

Runs interpreted on CPU (conftest); the kernels compile on TPU only.

The streaming triangle test uses affine-barycentric row constants — the
same inside set as the dominant-axis signed-area test up to float rounding
at edges — so a seam-crossing ray may pick the adjacent face at equal t.
Assertions therefore allow a sub-percent tail of face-id swaps (with
matching t) instead of demanding bit-equality.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from bhraytracer_tpu.ops.linalg import BIG
from bhraytracer_tpu.ops.pallas_stream import (
    stream_anyhit,
    stream_closest,
    stream_traversable,
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


def test_gate(mesh_pack):
    assert stream_traversable(mesh_pack)


@pytest.mark.parametrize("side", ["front", "both"])
def test_stream_closest_matches_xla(mesh_pack, side):
    o, d = _rays(mesh_pack, 2048, 1)
    n = o.shape[0]
    ti = jnp.full((n,), BIG)
    t0, f0, fr0 = bvh_closest(mesh_pack, 0, o, d, side, ti)
    t1, f1, fr1 = stream_closest(mesh_pack, o, d, side, ti)
    t0, f0, fr0 = np.asarray(t0), np.asarray(f0), np.asarray(fr0)
    t1, f1, fr1 = np.asarray(t1), np.asarray(f1), np.asarray(fr1)
    hit0 = t0 < BIG
    hit1 = t1 < BIG
    assert hit0.sum() > 200
    # Hit sets agree except at most an edge-rounding tail.
    assert (hit0 != hit1).mean() < 0.005
    both = hit0 & hit1
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)
    face_match = f1[both] == f0[both]
    assert face_match.mean() > 0.99
    # Mismatched faces must be equal-t seam neighbors, not wrong hits.
    if not face_match.all():
        np.testing.assert_allclose(t1[both][~face_match],
                                   t0[both][~face_match],
                                   rtol=1e-3, atol=1e-4)
    np.testing.assert_array_equal(fr1[both][face_match],
                                  fr0[both][face_match])


def test_stream_anyhit_matches_xla(mesh_pack):
    o, d = _rays(mesh_pack, 2048, 2)
    tm = jnp.full((o.shape[0],), 1.0)
    a0 = np.asarray(bvh_anyhit(mesh_pack, 0, o, d, MESH_SHADOW_BIAS, tm))
    a1 = np.asarray(stream_anyhit(mesh_pack, o, d, MESH_SHADOW_BIAS, tm))
    assert a0.sum() > 100
    assert (a0 != a1).mean() < 0.005


def test_stream_t_init_pruning(mesh_pack):
    """Lanes seeded with a nearer hit must keep it."""
    o, d = _rays(mesh_pack, 512, 3)
    ti_open = jnp.full((o.shape[0],), BIG)
    t_open, _, _ = stream_closest(mesh_pack, o, d, "front", ti_open)
    seed = jnp.where(jnp.arange(o.shape[0]) % 2 == 0, 1e-3, BIG)
    t_seeded, _, _ = stream_closest(mesh_pack, o, d, "front",
                                    jnp.asarray(seed, jnp.float32))
    even = np.arange(o.shape[0]) % 2 == 0
    assert (np.asarray(t_seeded)[even] <= 1e-3 + 1e-9).all()
    np.testing.assert_allclose(np.asarray(t_seeded)[~even],
                               np.asarray(t_open)[~even], rtol=1e-5)


def test_stream_render_routing(gen_assets_root, tmp_path):
    """Full render with stream routing on matches the packet-kernel render
    to MC-decision tolerance (seam-edge hits can flip a GI/shadow sample).

    Forces pallas 'on' (interpreted) for BOTH legs — under the conftest's
    CPU 'auto' neither leg would route through any pallas kernel and the
    comparison would be vacuous — and toggles ONLY stream mode between
    legs, restoring the shipped defaults ('auto'/'on')."""
    from tests.test_divergent import SCENE

    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import render_image
    from bhraytracer_tpu.ops import trace as T
    from bhraytracer_tpu.scene.xml_loader import load_scene

    scene = tmp_path / "scene.xml"
    scene.write_text(SCENE)
    pack, cam = load_scene(str(scene), resource_root=gen_assets_root)
    cfg = RenderConfig(spp=1, gi_bounces=1, extra_refr_levels=0,
                       chunk_rays=2048, use_gamma=False,
                       texture_sample_count=1)
    T.set_pallas_mode("on")
    try:
        T.set_stream_mode("off")
        img_off = np.asarray(render_image(pack, cam, cfg, seed=0))
        T.set_stream_mode("on")
        img_on = np.asarray(render_image(pack, cam, cfg, seed=0))
    finally:
        T.set_pallas_mode("auto")
        T.set_stream_mode("on")
    close = np.isclose(img_on, img_off, rtol=1e-3, atol=2e-3)
    assert close.mean() > 0.995


# ---------------------------------------------------------------------------
# In-kernel analytic fold (sph_tab/pln_tab): the stream kernels carry the
# analytic instances themselves on mixed scenes (the headline bench config),
# so the fold needs its own XLA A/B — goldens/oracle run on CPU where pallas
# is auto-disabled (round-4 advisor finding).
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def mixed_pack(gen_assets_root):
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
    t1 = D.Transform()
    t1.scale(1.2, 1.2, 1.2)
    t1.translate(np.array([2.5, 0.0, 0.5]))
    sd.nodes.append(D.NodeDesc(kind="sphere", name="s", transform=t1,
                               material=0))
    t2 = D.Transform()
    t2.scale(8.0, 8.0, 8.0)
    t2.translate(np.array([0.0, 0.0, -1.5]))
    sd.nodes.append(D.NodeDesc(kind="plane", name="p", transform=t2,
                               material=0))
    return compile_scene(sd)


@pytest.mark.parametrize("side", ["front", "both"])
def test_analytic_fold_closest_matches_xla(mixed_pack, side):
    from bhraytracer_tpu.ops import trace as T

    o, d = _rays(mixed_pack, 2048, 9)
    T.set_pallas_mode("off")
    try:
        h0 = T.trace_closest(mixed_pack, o, d, side, reorder=True)
    finally:
        T.set_pallas_mode("auto")
    T.set_pallas_mode("on")  # stream default 'on' -> folded stream kernel
    try:
        h1 = T.trace_closest(mixed_pack, o, d, side, reorder=True)
    finally:
        T.set_pallas_mode("auto")
    t0, t1 = np.asarray(h0.t), np.asarray(h1.t)
    hit0, hit1 = np.asarray(h0.hit), np.asarray(h1.hit)
    assert hit0.sum() > 400
    assert np.asarray(h0.kind)[hit0].min() != np.asarray(h0.kind)[hit0].max()
    assert (hit0 != hit1).mean() < 0.005
    both = hit0 & hit1
    np.testing.assert_allclose(t1[both], t0[both], rtol=1e-4, atol=1e-5)
    same = (np.asarray(h0.kind)[both] == np.asarray(h1.kind)[both]) & (
        np.asarray(h0.inst)[both] == np.asarray(h1.inst)[both]) & (
        np.asarray(h0.face)[both] == np.asarray(h1.face)[both])
    assert same.mean() > 0.99  # seam-tie tail only
    np.testing.assert_array_equal(np.asarray(h0.front)[both][same],
                                  np.asarray(h1.front)[both][same])


@pytest.mark.parametrize("plane_bug", [False, True])
def test_analytic_fold_anyhit_matches_xla(mixed_pack, plane_bug):
    from bhraytracer_tpu.ops import trace as T

    o, d = _rays(mixed_pack, 2048, 10)
    tm = jnp.full((o.shape[0],), 1.0)
    T.set_pallas_mode("off")
    try:
        a0 = np.asarray(T.trace_shadow(mixed_pack, o, d, tm, 1e-5,
                                       plane_extent_bug=plane_bug,
                                       reorder=True))
    finally:
        T.set_pallas_mode("auto")
    T.set_pallas_mode("on")
    try:
        a1 = np.asarray(T.trace_shadow(mixed_pack, o, d, tm, 1e-5,
                                       plane_extent_bug=plane_bug,
                                       reorder=True))
    finally:
        T.set_pallas_mode("auto")
    assert a0.sum() > 200
    assert (a0 != a1).mean() < 0.005
