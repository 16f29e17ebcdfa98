"""Grouped HBM-streamed triangle intersection for BIG meshes.

The flat stream kernel (ops/pallas_stream.py) holds the whole face table in
VMEM and gates itself out above STREAM_MAX_FACES; beyond that the packet
kernel's treelet scan re-traverses every ray through every treelet subtree
(36 launches x full wavefront on the 112K-face bench scene — measured
24K segs/s, ~1000x below the small-scene headline).

This kernel is the designed round-5 "pipelined HBM treelet-stream":

  - 2-D grid (ray_block, face_group): the face table stays in HBM and
    Pallas's own grid pipeline double-buffers one (GROUP, 16) block into
    VMEM per step — explicit prefetch with a STATIC DMA chain (the DMA
    happens whether or not the group is culled; bandwidth is cheap
    (~7 MB/sweep), compute is not);
  - per ray block a conservative interval test (the cluster-cull window
    from pallas_stream, lifted to GROUP granularity) skips the group's
    whole slab loop with ONE pl.when — faces are in BVH leaf order, so
    consecutive groups are spatially tight boxes and coherence-sorted ray
    blocks hit few of them;
  - inside a surviving group the body is the flat kernel's static slab
    loop (software-pipelineable, no per-node control flow), with the same
    affine-barycentric face rows and deferred (SLAB, RLANES) best
    reduction carried in scratch across the group sweep;
  - analytic instances fold in exactly like the flat kernel (computed at
    the j == 0 step for seeding and re-derived at the final step for the
    strict-< merge — pure recompute, bit-identical).

Same contract and tie semantics as stream_closest/stream_anyhit: results
match the XLA reference up to the documented equal-t seam family; the
reference loop being replaced is the per-ray ordered BVH descent
(TriObj.cpp:192-270), which this beats by never diverging.

Routed by ops/trace for reorder=True queries on meshes ABOVE
STREAM_MAX_FACES (the flat kernel keeps small scenes); the coherence sort
is REQUIRED here (culling only pays on spatially-tight blocks) and is
applied by the router.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bhraytracer_tpu.ops.linalg import BIG
from bhraytracer_tpu.ops.pallas_analytic import analytic_anyhit, analytic_closest
from bhraytracer_tpu.ops.pallas_stream import (
    RLANES,
    SLAB,
    _BIGI,
    _pack_rays,
    _slab_test,
    _stream_table,
)

# Faces per culled group (= per HBM->VMEM block). Bigger groups amortize
# the per-grid-step overhead and pipeline longer static slab loops;
# smaller groups cull tighter. Sweepable via set_group_faces.
GROUP = 2048


def set_group_faces(n: int) -> None:
    """A/B knob (requires jax.clear_caches to re-trace)."""
    global GROUP
    assert n % SLAB == 0
    GROUP = n


def _unpadded_faces(pack):
    """(F, 16) packed face rows in ORIGINAL (global) face order.

    Treelet packs store uniform PADDED per-treelet blocks; the HBM stream
    wants the contiguous unpadded table so the in-kernel face key is the
    global face row directly. Static slices + one concat (~7 MB at 112K
    faces, negligible next to a trace)."""
    if not pack.treelets:
        return pack.pallas_faces
    t_c = len(pack.treelets)
    fb = pack.pallas_faces.shape[0] // t_c
    f3 = pack.pallas_faces.reshape(t_c, fb, pack.pallas_faces.shape[1])
    parts = [f3[t, : fe - fs] for t, (fs, fe) in enumerate(pack.treelets)]
    return jnp.concatenate(parts, axis=0)


def _group_tables(pack):
    """(faces_padded (G*GROUP, 16) stream rows, aabb (G, 8), n_groups).

    aabb rows are [bmin(3), bmax(3), 0, 0] over each group's source
    vertices; padding rows get an inverted box that fails every window."""
    raw = _unpadded_faces(pack)
    n_faces = raw.shape[0]
    v = raw[:, 0:9].reshape(-1, 3, 3)
    vmin = jnp.min(v, axis=1)
    vmax = jnp.max(v, axis=1)
    n_groups = -(-n_faces // GROUP)
    pad = n_groups * GROUP - n_faces
    if pad:
        big = jnp.float32(BIG)
        vmin = jnp.concatenate([vmin, jnp.full((pad, 3), big)])
        vmax = jnp.concatenate([vmax, jnp.full((pad, 3), -big)])
    bmin = jnp.min(vmin.reshape(n_groups, GROUP, 3), axis=1)
    bmax = jnp.max(vmax.reshape(n_groups, GROUP, 3), axis=1)
    aabb = jnp.concatenate(
        [bmin, bmax, jnp.zeros((n_groups, 2), jnp.float32)], axis=1)
    faces = _stream_table_raw(raw, n_groups * GROUP)
    return faces, aabb, n_groups


def _stream_table_raw(raw, pad_to: int):
    """_stream_table on an explicit face-row table, padded to pad_to rows
    (zero rows are grazing-culled everywhere, same convention)."""

    class _P:  # tiny adapter: _stream_table only reads .pallas_faces
        pallas_faces = raw

    rows = _stream_table(_P)
    if rows.shape[0] < pad_to:
        rows = jnp.concatenate(
            [rows, jnp.zeros((pad_to - rows.shape[0], 16), rows.dtype)])
    return rows


def _window(aabb_row, boxes):
    """Conservative [t_lo, t_hi] for ANY ray in the block crossing the
    group AABB: interval slab test on the block's origin box lo/hi and
    direction box dlo/dhi (12 SMEM scalars). Same arithmetic as
    pallas_stream._cluster_window."""
    t_lo = jnp.float32(-BIG)
    t_hi = jnp.float32(BIG)
    for ax in range(3):
        blo, bhi = aabb_row[0, ax], aabb_row[0, 3 + ax]
        lo_a, hi_a = boxes[ax], boxes[3 + ax]
        dl, dh = boxes[6 + ax], boxes[9 + ax]
        mixed = (dl <= 0.0) & (dh >= 0.0)
        rl = 1.0 / jnp.where(dl == 0.0, 1e-30, dl)
        rh = 1.0 / jnp.where(dh == 0.0, 1e-30, dh)
        a1, a2 = blo - lo_a, blo - hi_a
        b1, b2 = bhi - lo_a, bhi - hi_a
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


def _store_boxes(boxes_ref, pox, poy, poz, pdx, pdy, pdz):
    boxes_ref[0] = jnp.min(pox)
    boxes_ref[1] = jnp.min(poy)
    boxes_ref[2] = jnp.min(poz)
    boxes_ref[3] = jnp.max(pox)
    boxes_ref[4] = jnp.max(poy)
    boxes_ref[5] = jnp.max(poz)
    boxes_ref[6] = jnp.min(pdx)
    boxes_ref[7] = jnp.min(pdy)
    boxes_ref[8] = jnp.min(pdz)
    boxes_ref[9] = jnp.max(pdx)
    boxes_ref[10] = jnp.max(pdy)
    boxes_ref[11] = jnp.max(pdz)


def _closest_kernel(side: int, n_groups: int, n_sph: int, n_pln: int,
                    faces_blk, aabb, sph_ref, pln_ref, rays,
                    t_out, key_out,
                    t8_ref, k8_ref, cap_ref, boxes_ref):
    j = pl.program_id(1)
    pox, poy, poz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    pdx, pdy, pdz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    inv_dlen = jax.lax.rsqrt(
        jnp.maximum(pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))
    t0 = rays[6:7, :]
    # Analytic fold is a pure per-block function: evaluated at the first
    # and last steps only (seed / strict-< merge), identical both times.
    ana = functools.partial(analytic_closest, side, n_sph, n_pln,
                            sph_ref, pln_ref,
                            pox, poy, poz, pdx, pdy, pdz, t0)
    slabs_per_group = GROUP // SLAB
    siota = jax.lax.broadcasted_iota(jnp.int32, (SLAB, 1), 0)

    @pl.when(j == 0)
    def _init():
        ana_t, _, _ = ana()
        seed = jnp.minimum(t0, ana_t).astype(jnp.float32)
        t8_ref[...] = jnp.broadcast_to(seed, (SLAB,) + seed.shape[1:])
        k8_ref[...] = jnp.full((SLAB, RLANES), _BIGI, jnp.int32)
        cap_ref[0] = jnp.max(seed)
        _store_boxes(boxes_ref, pox, poy, poz, pdx, pdy, pdz)

    t_lo, t_hi = _window(aabb[pl.ds(j, 1), :], boxes_ref)
    hit_ok = (t_lo <= t_hi) & (t_hi > 0.0) & (t_lo < cap_ref[0])

    @pl.when(hit_ok)
    def _compute():
        base = j * slabs_per_group

        def body(s, carry):
            t8, k8 = carry
            slab = faces_blk[pl.ds(s * SLAB, SLAB), :]
            t, front, ok = _slab_test(slab, pox, poy, poz, pdx, pdy, pdz,
                                      inv_dlen, side)
            tc = jnp.where(ok, t, BIG)
            key = ((base + s) * SLAB + siota) * 2 + front
            upd = tc < t8
            return jnp.where(upd, tc, t8), jnp.where(upd, key, k8)

        t8, k8 = jax.lax.fori_loop(0, slabs_per_group, body,
                                   (t8_ref[...], k8_ref[...]))
        t8_ref[...] = t8
        k8_ref[...] = k8
        cap_ref[0] = jnp.max(jnp.min(t8, axis=0))

    @pl.when(j == n_groups - 1)
    def _finalize():
        ana_t, ana_face, ana_front = ana()
        t8 = t8_ref[...]
        k8 = k8_ref[...]
        t_best = jnp.min(t8, axis=0, keepdims=True)
        bkey = jnp.min(jnp.where((t8 == t_best) & (k8 < _BIGI), k8, _BIGI),
                       axis=0, keepdims=True)
        # Seeding t8 with min(t0, ana_t) preserves the flat kernel's
        # strict-< rule: a mesh face entered a slot only by strictly
        # beating the analytic/t_init seed.
        mesh_wins = (bkey < _BIGI) & (t_best < ana_t)
        t_out[0] = jnp.where(mesh_wins, t_best, ana_t)
        key_out[0] = jnp.where(mesh_wins, bkey, ana_face * 2 + ana_front)


def _anyhit_kernel(n_groups: int, bias: float, n_sph: int, n_pln: int,
                   ana_bias: float, plane_world_bug: bool,
                   faces_blk, aabb, sph_ref, pln_ref, rays,
                   occ_out,
                   occ_ref, cap_ref, boxes_ref):
    j = pl.program_id(1)
    pox, poy, poz = rays[0:1, :], rays[1:2, :], rays[2:3, :]
    pdx, pdy, pdz = rays[3:4, :], rays[4:5, :], rays[5:6, :]
    tm = rays[6:7, :]
    inv_dlen = jax.lax.rsqrt(
        jnp.maximum(pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))
    slabs_per_group = GROUP // SLAB

    @pl.when(j == 0)
    def _init():
        occ0 = analytic_anyhit(n_sph, n_pln, sph_ref, pln_ref,
                               pox, poy, poz, pdx, pdy, pdz, tm,
                               ana_bias, plane_world_bug)
        occ_ref[...] = occ0
        cap_ref[0] = jnp.max(jnp.where(occ0 > 0, 0.0, tm))
        _store_boxes(boxes_ref, pox, poy, poz, pdx, pdy, pdz)

    t_lo, t_hi = _window(aabb[pl.ds(j, 1), :], boxes_ref)
    hit_ok = (t_lo <= t_hi) & (t_hi > 0.0) & (t_lo < cap_ref[0])

    @pl.when(hit_ok)
    def _compute():
        def body(s, occ):
            slab = faces_blk[pl.ds(s * SLAB, SLAB), :]
            t, _, ok = _slab_test(slab, pox, poy, poz, pdx, pdy, pdz,
                                  inv_dlen, 0)  # front-only shadows
            hit = ok & (t > bias) & (t < tm)
            return jnp.maximum(occ, jnp.max(hit.astype(jnp.int32), axis=0,
                                            keepdims=True))

        occ = jax.lax.fori_loop(0, slabs_per_group, body, occ_ref[...])
        occ_ref[...] = occ
        cap_ref[0] = jnp.max(jnp.where(occ > 0, 0.0, tm))

    @pl.when(j == n_groups - 1)
    def _finalize():
        occ_out[0] = occ_ref[...]


def stream_closest_hbm(pack, o, d, hit_side: str, t_init=None,
                       sph_tab=None, pln_tab=None):
    """Grouped HBM-streaming closest hit; contract of stream_closest
    (t, GLOBAL face row, front), face coded -(2+...) for analytic winners.
    Callers must pass coherence-SORTED rays for the culling to pay."""
    if t_init is None:
        t_init = jnp.full((o.shape[0],), BIG)
    rays, n, g = _pack_rays(o, d, t_init)
    side = {"front": 0, "back": 1, "both": 2}[hit_side]
    faces, aabb, n_groups = _group_tables(pack)
    n_sph = int(sph_tab.shape[0]) if sph_tab is not None else 0
    n_pln = int(pln_tab.shape[0]) if pln_tab is not None else 0
    sph_tab = sph_tab if n_sph else jnp.zeros((1, 12), jnp.float32)
    pln_tab = pln_tab if n_pln else jnp.zeros((1, 12), jnp.float32)
    kernel = functools.partial(_closest_kernel, side, n_groups, n_sph, n_pln)
    t, key = pl.pallas_call(
        kernel,
        grid=(g, n_groups),
        in_specs=[
            pl.BlockSpec((GROUP, 16), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RLANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, 1, RLANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, RLANES), lambda i, j: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((g, 1, RLANES), jnp.float32),
            jax.ShapeDtypeStruct((g, 1, RLANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.VMEM((SLAB, RLANES), jnp.float32),
            pltpu.VMEM((SLAB, RLANES), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((12,), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(faces, aabb, sph_tab, pln_tab, rays)
    key = key.reshape(-1)[:n]
    return t.reshape(-1)[:n], key >> 1, (key & 1).astype(bool)


def stream_anyhit_hbm(pack, o, d, t_min: float, t_max,
                      sph_tab=None, pln_tab=None, ana_bias: float = 0.0,
                      plane_world_bug: bool = False):
    """Grouped HBM-streaming any-hit; contract of stream_anyhit."""
    tmax_full = jnp.broadcast_to(t_max, (o.shape[0],))
    rays, n, g = _pack_rays(o, d, tmax_full)
    faces, aabb, n_groups = _group_tables(pack)
    n_sph = int(sph_tab.shape[0]) if sph_tab is not None else 0
    n_pln = int(pln_tab.shape[0]) if pln_tab is not None else 0
    sph_tab = sph_tab if n_sph else jnp.zeros((1, 12), jnp.float32)
    pln_tab = pln_tab if n_pln else jnp.zeros((1, 12), jnp.float32)
    kernel = functools.partial(_anyhit_kernel, n_groups, t_min, n_sph,
                               n_pln, ana_bias, plane_world_bug)
    occ = pl.pallas_call(
        kernel,
        grid=(g, n_groups),
        in_specs=[
            pl.BlockSpec((GROUP, 16), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec((8, RLANES), lambda i, j: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 1, RLANES), lambda i, j: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((g, 1, RLANES), jnp.int32),
        scratch_shapes=[
            pltpu.VMEM((1, RLANES), jnp.int32),
            pltpu.SMEM((1,), jnp.float32),
            pltpu.SMEM((12,), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(faces, aabb, sph_tab, pln_tab, rays)
    return occ.reshape(-1)[:n].astype(bool)


def stream_hbm_traversable(pack) -> bool:
    """Big-mesh gate: any mesh the flat stream kernel refuses (face count
    above STREAM_MAX_FACES, with or without a treelet layout)."""
    from bhraytracer_tpu.ops.pallas_stream import STREAM_MAX_FACES

    if not pack.n_msh:
        return False
    if pack.treelets:
        return True
    return int(pack.pallas_faces.shape[0]) > STREAM_MAX_FACES
