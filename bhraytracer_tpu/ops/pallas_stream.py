"""Pallas TPU streaming (brute-force) triangle intersection.

For INCOHERENT wavefronts over small-to-moderate meshes, hierarchical
traversal stops paying: a fully-incoherent (8,128) tile's union covers most
of the tree, so the packet kernel (ops/pallas_bvh.py) executes ~as many
vector tests as brute force WHILE ALSO paying, per visited node, a scalar
stack chain, a dynamic row fetch, any-hit vote reductions, and a
while_loop iteration sync.  Measured on the bench_incoherent population
(65K scattered rays, 1408-face teapot): the packet kernel performs ~1663
vector tests per tile (934 triangle + 729 box) vs exactly 1408 for brute
force — similar vector work, entirely different overhead.

This kernel just streams EVERY face past every ray with zero control flow:

  - rays are laid out (1, 1024) per block; face slabs are loaded 8 rows at
    a time with statically-striding `pl.ds`, so each vector op tests
    8 FACES x 1024 RAYS at once ((8,1024) = 8 vregs) — a static,
    software-pipelineable loop with no stack, no votes, no sync;
  - the triangle test uses precomputed AFFINE BARYCENTRIC row constants
    (unit plane equation + two barycentric gradient/offset pairs, built
    in-jit from the shared pallas_faces table): ~2/3 the arithmetic of the
    dominant-axis signed-area test, mathematically the same inside set
    (b0,b1,b2 >= 0 covers the all-neg orientation too, TriObj.cpp:105-168);
  - per-slab winners fold into the running best with one masked min over
    the 8-face sublane axis (face id and front flag packed into one int32
    so the tie rule stays consistent);
  - throughput is COHERENCE-INDEPENDENT — like the reference's per-ray
    ordered descent (TriObj.cpp:192-270), there is nothing to diverge —
    so no coherence sort is needed (saves the argsort too).

Boundary behavior: the affine-barycentric inside test agrees with the
dominant-axis test except within float rounding of an edge, so a
seam-crossing ray can pick the adjacent face (same t).  Parity tests
compare t everywhere and allow rare face-id swaps at equal t.

Use for reorder=True (secondary/GI/TIR/shadow) queries on scenes passing
`stream_traversable`; camera rays and big meshes keep the packet kernel.
Routed via trace.set_stream_mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bhraytracer_tpu.ops.intersect import PERP_EPS
from bhraytracer_tpu.ops.linalg import BIG
from bhraytracer_tpu.ops.pallas_analytic import analytic_anyhit, analytic_closest

# Round-4 480K TPU sweep (ms/chunk): (1024,8) 348.5, (2048,8) 311.1,
# (1024,16) 300.1, (2048,16) 299.2, (2048,32) 286.5 vs 294.1 same-run
# baseline (5-pass confirm; the first 3-pass read was noise), (4096,16)
# 366.1 (regression — row padding/register pressure). Bigger rows
# amortize the per-row analytic fold/loop setup and bigger slabs cut loop
# iterations; Mosaic pipelines the longer static bodies better than the
# op-count model predicts.
RLANES = 2048  # rays per block
SLAB = 32  # faces tested per slab fetch (sublane dim)


def set_stream_shape(rlanes: int | None = None, slab: int | None = None):
    """A/B knob (tools/sweep_variants.py; requires jax.clear_caches to
    re-trace): rays per grid row / faces per slab fetch. Bigger rows
    amortize the per-row analytic fold + loop setup; bigger slabs halve
    fori_loop iterations at the cost of register pressure."""
    global RLANES, SLAB
    if rlanes is not None:
        assert rlanes % 1024 == 0
        RLANES = rlanes
    if slab is not None:
        assert slab in (8, 16, 32, 64)
        SLAB = slab
# Above this face count the O(F) stream loses to the packet kernel's
# culling even on incoherent rays (the union stops saturating the tree).
STREAM_MAX_FACES = 8192

# Python int (NOT a jnp scalar: importing this module must not touch the
# device backend); weak-typed promotion keeps int32 in the kernels below.
_BIGI = 2 ** 30


def stream_traversable(pack) -> bool:
    return (not pack.treelets
            and int(pack.pallas_faces.shape[0]) <= STREAM_MAX_FACES)


def _stream_table(pack):
    """(F_pad, 16) f32 streaming rows from the packed face table:
    [n_hat (3), nhat_dot_v0 (1), g0 (3), c0 (1), g1 (3), c1 (1), pad (4)]
    where b0(P) = g0.P + c0 and b1(P) = g1.P + c1 are the affine
    barycentric weights of v0 and v1 (b2 = 1 - b0 - b1)."""
    f = pack.pallas_faces
    v0, v1, v2 = f[:, 0:3], f[:, 3:6], f[:, 6:9]
    n = f[:, 9:12]
    inv_nlen = f[:, 13:14]
    nn = jnp.maximum(jnp.sum(n * n, axis=1, keepdims=True), 1e-30)
    g0 = jnp.cross(n, v2 - v1) / nn
    c0 = -jnp.sum(g0 * v1, axis=1, keepdims=True)
    g1 = jnp.cross(n, v0 - v2) / nn
    c1 = -jnp.sum(g1 * v2, axis=1, keepdims=True)
    nhat = n * inv_nlen
    ndot0 = jnp.sum(nhat * v0, axis=1, keepdims=True)
    rows = jnp.concatenate(
        [nhat, ndot0, g0, c0, g1, c1, jnp.zeros((f.shape[0], 4), f.dtype)], 1)
    pad = (-rows.shape[0]) % SLAB
    if pad:
        # Padding rows have nhat = 0 -> pd = 0 -> grazing-culled everywhere.
        rows = jnp.concatenate([rows, jnp.zeros((pad, 16), rows.dtype)])
    return rows


# Slabs per cull cluster: clusters of CL_SLABS*SLAB consecutive faces
# (pallas_faces is in BVH leaf order, so consecutive runs are spatially
# tight — measured mean extent 15-28% of the scene per axis at 64 faces).
# MEASURED NEGATIVE on TPU (round 4, 480K fused, trace.set_stream_cull):
# 526.8 vs 297.3 ms/chunk. The conservative interval test is cheap and
# the cull is bit-identical (tests/test_stream_cull.py), but putting the
# slab loop inside a data-dependent pl.when per cluster destroys the
# software pipelining that the static loop enjoys — the same effect that
# made (2048,16) shapes 17% faster than (1024,8). Kept off by default as
# a documented negative; a future treelet-stream for >STREAM_MAX_FACES
# scenes should prefetch/pipeline explicitly instead.
CL_SLABS = 4


def _cluster_table(pack, n_slabs: int):
    """(C, 8) f32 cluster AABBs [bmin(3), bmax(3), pad(2)] over groups of
    CL_SLABS*SLAB consecutive faces of the (padded) stream table order.
    Padding faces are excluded from the boxes (an empty tail cluster gets
    an inverted box that can never pass the interval test)."""
    f = pack.pallas_faces
    v = f[:, 0:9].reshape(-1, 3, 3)
    n_faces = v.shape[0]
    per = CL_SLABS * SLAB
    n_clusters = -(-n_slabs // CL_SLABS)
    pad_to = n_clusters * per
    big = jnp.float32(BIG)
    vmin = jnp.min(v, axis=1)
    vmax = jnp.max(v, axis=1)
    if pad_to > n_faces:
        pad = pad_to - n_faces
        vmin = jnp.concatenate([vmin, jnp.full((pad, 3), big)])
        vmax = jnp.concatenate([vmax, jnp.full((pad, 3), -big)])
    bmin = jnp.min(vmin.reshape(n_clusters, per, 3), axis=1)
    bmax = jnp.max(vmax.reshape(n_clusters, per, 3), axis=1)
    return jnp.concatenate(
        [bmin, bmax, jnp.zeros((n_clusters, 2), jnp.float32)], axis=1)


def _pack_rays(o, d, aux):
    """Pack (o, d, aux) into ONE (8, N_pad) f32 array — rows [ox, oy, oz,
    dx, dy, dz, aux, 0] — consumed as aligned (8, RLANES) blocks.

    Replaces the old 6x strided (N,3)->(N,) slice + per-component reshape
    glue (round-5 top lever): two transposes + one concat, and the 8-row
    sublane dim is tile-aligned so Mosaic slices rows without relayout.
    Padding lanes are all-zero: d = 0 fails every ok test in the kernels
    and aux (t_init/t_max) = 0 retires them."""
    n = o.shape[0]
    g = -(-n // RLANES)
    rows = jnp.concatenate(
        [o.T, d.T, aux[None, :].astype(jnp.float32),
         jnp.zeros((1, n), jnp.float32)], axis=0)
    pad = g * RLANES - n
    if pad:
        rows = jnp.concatenate([rows, jnp.zeros((8, pad), jnp.float32)], 1)
    return rows, n, g


def _slab_test(slab, pox, poy, poz, pdx, pdy, pdz, inv_dlen, side: int):
    """Test SLAB faces against the (1,RLANES) ray row -> (SLAB,RLANES)
    (t, front_i32, ok)."""
    nx, ny, nz = slab[:, 0:1], slab[:, 1:2], slab[:, 2:3]
    nd0 = slab[:, 3:4]
    tdiv = nx * pdx + ny * pdy + nz * pdz  # n_hat . d
    pd = tdiv * inv_dlen
    ok = jnp.abs(pd) >= PERP_EPS
    ndoto = nx * pox + ny * poy + nz * poz
    t = (nd0 - ndoto) / jnp.where(tdiv == 0.0, 1e-30, tdiv)
    ok &= t > 0.0
    front = tdiv < 0.0
    if side == 0:
        ok &= front
    elif side == 1:
        ok &= ~front
    hx = pox + t * pdx
    hy = poy + t * pdy
    hz = poz + t * pdz
    b0 = slab[:, 4:5] * hx + slab[:, 5:6] * hy + slab[:, 6:7] * hz \
        + slab[:, 7:8]
    b1 = slab[:, 8:9] * hx + slab[:, 9:10] * hy + slab[:, 10:11] * hz \
        + slab[:, 11:12]
    b2 = 1.0 - b0 - b1
    ok &= (b0 >= 0.0) & (b1 >= 0.0) & (b2 >= 0.0)
    return t, front.astype(jnp.int32), ok


def _cluster_window(clusters, c, lo, hi, dlo, dhi):
    """Conservative scalar [t_lo, t_hi] over every ray in the row for
    crossing cluster c's AABB: interval-arithmetic slab test on the row's
    origin box `lo/hi` and direction box `dlo/dhi` (3 scalars each). An
    axis whose direction interval spans 0 contributes (-BIG, BIG)."""
    row = clusters[pl.ds(c, 1), :]
    t_lo = jnp.float32(-BIG)
    t_hi = jnp.float32(BIG)
    for ax in range(3):
        blo, bhi = row[0, ax], row[0, 3 + ax]
        dl, dh = dlo[ax], dhi[ax]
        mixed = (dl <= 0.0) & (dh >= 0.0)
        rl = 1.0 / jnp.where(dl == 0.0, 1e-30, dl)
        rh = 1.0 / jnp.where(dh == 0.0, 1e-30, dh)
        a1, a2 = blo - lo[ax], blo - hi[ax]
        b1, b2 = bhi - lo[ax], bhi - hi[ax]
        qs = (a1 * rl, a1 * rh, a2 * rl, a2 * rh,
              b1 * rl, b1 * rh, b2 * rl, b2 * rh)
        q_lo = qs[0]
        q_hi = qs[0]
        for q in qs[1:]:
            q_lo = jnp.minimum(q_lo, q)
            q_hi = jnp.maximum(q_hi, q)
        t_lo = jnp.maximum(t_lo, jnp.where(mixed, -BIG, q_lo))
        t_hi = jnp.minimum(t_hi, jnp.where(mixed, BIG, q_hi))
    return t_lo, t_hi


def _row_boxes(pox, poy, poz, pdx, pdy, pdz):
    lo = (jnp.min(pox), jnp.min(poy), jnp.min(poz))
    hi = (jnp.max(pox), jnp.max(poy), jnp.max(poz))
    dlo = (jnp.min(pdx), jnp.min(pdy), jnp.min(pdz))
    dhi = (jnp.max(pdx), jnp.max(pdy), jnp.max(pdz))
    return lo, hi, dlo, dhi


def _closest_kernel(side: int, n_slabs: int, n_clusters: int,
                    n_sph: int, n_pln: int,
                    faces, clusters, sph_ref, pln_ref,
                    rays,
                    t_out, key_out,
                    t8_ref, k8_ref):
    pox, poy, poz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    pdx, pdy, pdz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    inv_dlen = jax.lax.rsqrt(
        jnp.maximum(pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))
    siota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, 1), 0)

    # Analytic instances first (packet-fold face coding); their best-t
    # seeds the final merge and, in the culled path, the per-row t cap.
    t0 = rays[6:7, :]
    ana_t, ana_face, ana_front = analytic_closest(
        side, n_sph, n_pln, sph_ref, pln_ref,
        pox, poy, poz, pdx, pdy, pdz, t0)

    # Deferred best reduction: keep a per-sublane-slot running best
    # (SLAB,RLANES) across the whole loop and reduce ONCE at the end —
    # ~6 fewer vector ops per slab than reducing in-loop. Tie order among
    # EXACTLY equal t across slots differs from the in-loop reduction only
    # within the documented equal-t seam family (the final min-key rule
    # still picks the lowest face id among tied slots).
    t8_0 = jnp.broadcast_to(t0, (SLAB,) + t0.shape[1:]).astype(jnp.float32)
    k8_0 = jnp.full(t8_0.shape, _BIGI, jnp.int32)

    def slab_step(s, t8, k8):
        slab = faces[pl.ds(s * SLAB, SLAB), :]
        t, front, ok = _slab_test(slab, pox, poy, poz, pdx, pdy, pdz,
                                  inv_dlen, side)
        tc = jnp.where(ok, t, BIG)
        key = (s * SLAB + siota) * 2 + front  # face id * 2 + front
        upd = tc < t8
        return jnp.where(upd, tc, t8), jnp.where(upd, key, k8)

    if n_clusters == 0:
        def body(s, carry):
            return slab_step(s, *carry)

        t8, k8 = jax.lax.fori_loop(0, n_slabs, body, (t8_0, k8_0))
    else:
        # Cluster culling (sorted rows): a conservative per-row interval
        # test skips whole CL_SLABS runs a coherent row cannot hit before
        # its current-best t. Results are bit-identical — a skipped
        # cluster could not have produced t below any lane's cap.
        t8_ref[...] = t8_0
        k8_ref[...] = k8_0
        t_cap = jnp.max(jnp.minimum(t0, ana_t))
        lo, hi, dlo, dhi = _row_boxes(pox, poy, poz, pdx, pdy, pdz)

        def cl_body(c, carry):
            t_lo, t_hi = _cluster_window(clusters, c, lo, hi, dlo, dhi)
            ok = (t_lo <= t_hi) & (t_hi > 0.0) & (t_lo < t_cap)

            @pl.when(ok)
            def _():
                t8 = t8_ref[...]
                k8 = k8_ref[...]
                for k in range(CL_SLABS):
                    t8, k8 = slab_step(c * CL_SLABS + k, t8, k8)
                t8_ref[...] = t8
                k8_ref[...] = k8

            return carry

        jax.lax.fori_loop(0, n_clusters, cl_body, 0)
        t8, k8 = t8_ref[...], k8_ref[...]
    t_best = jnp.min(t8, axis=0, keepdims=True)
    bkey = jnp.min(jnp.where((t8 == t_best) & (k8 < _BIGI), k8, _BIGI),
                   axis=0, keepdims=True)
    mesh_hit = bkey < _BIGI
    # Merge with the analytic winner: strict < keeps the packet fold's
    # tie rule (mesh updates only when strictly closer than analytic).
    # ONE packed key output (face*2 + front; arithmetic >>1 recovers
    # negative analytic face codes exactly) replaces the separate
    # face/front buffers — one fewer (N,) output + reshape of glue.
    mesh_wins = mesh_hit & (t_best < ana_t)
    t_out[0] = jnp.where(mesh_wins, t_best, ana_t)
    key_out[0] = jnp.where(mesh_wins, bkey, ana_face * 2 + ana_front)


def _anyhit_kernel(n_slabs: int, n_clusters: int, bias: float,
                   n_sph: int, n_pln: int,
                   ana_bias: float, plane_world_bug: bool,
                   faces, clusters, sph_ref, pln_ref,
                   rays,
                   occ_out, occ_ref):
    pox, poy, poz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    pdx, pdy, pdz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    tm = rays[6:7, :]
    inv_dlen = jax.lax.rsqrt(
        jnp.maximum(pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))

    # Analytic occlusion first (shared fold, pallas_analytic).
    occ0 = analytic_anyhit(n_sph, n_pln, sph_ref, pln_ref,
                           pox, poy, poz, pdx, pdy, pdz, tm,
                           ana_bias, plane_world_bug)

    def slab_step(s, occ):
        slab = faces[pl.ds(s * SLAB, SLAB), :]
        t, _, ok = _slab_test(slab, pox, poy, poz, pdx, pdy, pdz,
                              inv_dlen, 0)  # front-only (TraceBVHShadow)
        hit = ok & (t > bias) & (t < tm)
        return jnp.maximum(occ, jnp.max(hit.astype(jnp.int32), axis=0,
                                        keepdims=True))

    if n_clusters == 0:
        occ = jax.lax.fori_loop(0, n_slabs, slab_step, occ0)
    else:
        # Cluster culling (sorted rows): shadow segments are short
        # (t_max = 1 toward point lights), so the [0, t_cap] window culls
        # hard; already-occluded lanes contribute t_cap 0.
        occ_ref[...] = occ0
        t_cap = jnp.max(jnp.where(occ0 > 0, 0.0, tm))
        lo, hi, dlo, dhi = _row_boxes(pox, poy, poz, pdx, pdy, pdz)

        def cl_body(c, carry):
            t_lo, t_hi = _cluster_window(clusters, c, lo, hi, dlo, dhi)
            ok = (t_lo <= t_hi) & (t_hi > 0.0) & (t_lo < t_cap)

            @pl.when(ok)
            def _():
                occ = occ_ref[...]
                for k in range(CL_SLABS):
                    occ = slab_step(c * CL_SLABS + k, occ)
                occ_ref[...] = occ

            return carry

        jax.lax.fori_loop(0, n_clusters, cl_body, 0)
        occ = occ_ref[...]
    occ_out[0] = occ


def _cull_tables(pack, faces):
    """(padded faces, clusters, n_clusters) for the culled kernels: the
    face table is padded to whole clusters (zero rows are grazing-culled
    everywhere)."""
    n_slabs = faces.shape[0] // SLAB
    n_clusters = -(-n_slabs // CL_SLABS)
    pad_rows = n_clusters * CL_SLABS * SLAB - faces.shape[0]
    if pad_rows:
        faces = jnp.concatenate(
            [faces, jnp.zeros((pad_rows, faces.shape[1]), faces.dtype)])
    return faces, _cluster_table(pack, n_slabs), n_clusters


def stream_closest(pack, o, d, hit_side: str, t_init=None,
                   sph_tab=None, pln_tab=None, cull: bool = False):
    """Streaming closest hit; same contract as bvh_closest_pallas. With
    sph_tab/pln_tab the analytic instances are folded into the SAME kernel
    (one launch + one padding layout + no XLA combine per trace) using the
    packet fold's face coding. t_init seeds the final compare only — every
    face is tested regardless, that is the point."""
    if t_init is None:
        t_init = jnp.full((o.shape[0],), BIG)
    rays, n, g = _pack_rays(o, d, t_init)
    side = {"front": 0, "back": 1, "both": 2}[hit_side]
    faces = _stream_table(pack)
    if cull:
        faces, clusters, n_clusters = _cull_tables(pack, faces)
    else:
        clusters, n_clusters = jnp.zeros((1, 8), jnp.float32), 0
    n_slabs = faces.shape[0] // SLAB
    n_sph = int(sph_tab.shape[0]) if sph_tab is not None else 0
    n_pln = int(pln_tab.shape[0]) if pln_tab is not None else 0
    sph_tab = sph_tab if n_sph else jnp.zeros((1, 12), jnp.float32)
    pln_tab = pln_tab if n_pln else jnp.zeros((1, 12), jnp.float32)
    kernel = functools.partial(_closest_kernel, side, n_slabs, n_clusters,
                               n_sph, n_pln)
    ray_spec = pl.BlockSpec((8, RLANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, RLANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    arr = pl.BlockSpec(memory_space=pltpu.VMEM)
    t, key = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[arr, arr, arr, arr, ray_spec],
        out_specs=(out_spec, out_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, 1, RLANES), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, RLANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.VMEM((SLAB, RLANES), jnp.float32),
                        pltpu.VMEM((SLAB, RLANES), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(faces, clusters, sph_tab, pln_tab, rays)
    key = key.reshape(-1)[:n]
    return (
        t.reshape(-1)[:n],
        key >> 1,
        (key & 1).astype(bool),
    )


def stream_anyhit(pack, o, d, t_min: float, t_max,
                  sph_tab=None, pln_tab=None, ana_bias: float = 0.0,
                  plane_world_bug: bool = False, cull: bool = False):
    """Streaming any-hit (front-only mesh shadows, TriObj.cpp:272-307).
    With sph_tab/pln_tab the analytic occluders fold into the kernel
    (ShadowRayRecursive semantics: ana_bias/t_max bounds, optional
    plane_world_bug frame mix-up)."""
    tmax_full = jnp.broadcast_to(t_max, (o.shape[0],))
    rays, n, g = _pack_rays(o, d, tmax_full)
    faces = _stream_table(pack)
    if cull:
        faces, clusters, n_clusters = _cull_tables(pack, faces)
    else:
        clusters, n_clusters = jnp.zeros((1, 8), jnp.float32), 0
    n_slabs = faces.shape[0] // SLAB
    n_sph = int(sph_tab.shape[0]) if sph_tab is not None else 0
    n_pln = int(pln_tab.shape[0]) if pln_tab is not None else 0
    sph_tab = sph_tab if n_sph else jnp.zeros((1, 12), jnp.float32)
    pln_tab = pln_tab if n_pln else jnp.zeros((1, 12), jnp.float32)
    kernel = functools.partial(_anyhit_kernel, n_slabs, n_clusters, t_min,
                               n_sph, n_pln, ana_bias, plane_world_bug)
    ray_spec = pl.BlockSpec((8, RLANES), lambda i: (0, i),
                            memory_space=pltpu.VMEM)
    out_spec = pl.BlockSpec((1, 1, RLANES), lambda i: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    arr = pl.BlockSpec(memory_space=pltpu.VMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(g,),
        in_specs=[arr, arr, arr, arr, ray_spec],
        out_specs=out_spec,
        out_shape=jax.ShapeDtypeStruct((g, 1, RLANES), jnp.int32),
        scratch_shapes=[pltpu.VMEM((1, RLANES), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(faces, clusters, sph_tab, pln_tab, rays)
    return occ.reshape(-1)[:n].astype(bool)
