"""Pallas TPU divergent (per-row) BVH traversal.

The packet kernel (ops/pallas_bvh.py) shares ONE stack across a (8,128)
tile: every iteration visits one node for all 1024 rays, so an incoherent
tile pays for the UNION of its rays' paths.  The first sub-packet attempt
(ops/pallas_bvh_subpacket.py) gave each sublane row its own stack but
fetched node/face rows with one-hot matmuls over the whole table — measured
SLOWER (2.0M vs 5.9M rays/s) because the fetch cost scales with table size.

This kernel keeps the per-row stacks but moves every scalar decision into
the scalar core, where fetches are O(1):

  - per-row stacks live in SMEM (like the packet kernel's shared stack);
    pops/pushes are plain scalar reads/writes, so each row's current node
    id is ALREADY a scalar usable as a `pl.ds` dynamic row index;
  - node metadata (left child, leaf count, split-axis code) is packed into
    one int32 per node in an SMEM table — scalar-indexable, no VMEM gather;
  - per-row child-bounds / face rows are copied with 8 dynamic `pl.ds` row
    loads into an (8,16) VMEM scratch, then tested VECTORIZED against the
    whole tile exactly like the sub-packet kernel (each (8,1) column
    broadcasts against the (8,128) ray tile);
  - the only vector->scalar crossings are the per-row any-hit votes
    (masked max reductions over one (8,128) vreg);
  - hit accumulators (t/face/front or occlusion) live in VMEM scratch refs
    so whole phases (leaf / internal) are `pl.when`-skipped when NO row
    needs them — coherence-sorted tiles usually agree on the phase.

Net effect: one iteration advances 8 INDEPENDENT descents at the same
vector cost the packet kernel pays to advance one shared descent, cutting
union divergence 8x (each row is one (octant, origin-cell) sort bucket).

Same results as TraceBVHNode / TraceBVHShadow (TriObj.cpp:192-307); the
reference's per-ray ordered descent has no coherence dependence at all —
this is the TPU step toward that behavior (VERDICT r1, next-round item 2).

Gating: the meta table must fit SMEM (`divergent_traversable`); treelet-
streamed scenes keep the packet path.  Routing is controlled by
`set_divergent_mode` in ops/trace.py — OFF by default until measured
faster on hardware (tools/bench_incoherent.py compares all kernels).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bhraytracer_tpu.ops.compact import inverse_permutation
from bhraytracer_tpu.ops.intersect import PERP_EPS
from bhraytracer_tpu.ops.linalg import BIG
from bhraytracer_tpu.ops.pallas_bvh import (
    LANES,
    LEAF_SIZE,
    STACK_DEPTH,
    SUBL,
    _coherence_order,
    _pad_rays,
)

# Packed SMEM metadata: meta = (lft << 6) | (cnt << 3) | code.
# lft < 2^24 nodes, cnt in 0..LEAF_SIZE, code in 0..5.
SMEM_META_MAX = 8192  # int32 rows (32 KB) — conservative SMEM budget


def divergent_traversable(pack) -> bool:
    """This scene can run the divergent kernel: single-shot (non-treelet)
    layout with an SMEM-resident metadata table."""
    from bhraytracer_tpu.ops.pallas_bvh import fits_vmem

    return (not pack.treelets and fits_vmem(pack)
            and pack.pallas_nodes.shape[0] <= SMEM_META_MAX)


def _pack_meta(nodes) -> jnp.ndarray:
    """(n_nodes,) int32: lft<<6 | cnt<<3 | code from the f32 row table."""
    lft = nodes[:, 6].astype(jnp.int32)
    cnt = nodes[:, 7].astype(jnp.int32)
    code = nodes[:, 8].astype(jnp.int32)
    return (lft << 6) | (cnt << 3) | code


def _row_scalar_any(x_i32, riota, r: int):
    """Scalar: 1 iff any lane of row r of the (8,128) int32 tile is > 0."""
    return jnp.max(jnp.where(riota == r, x_i32, 0))


def _tri_test_rows(frow, pox, poy, poz, pdx, pdy, pdz, inv_dlen, side: int):
    """Vector triangle test with PER-ROW face data from the (8,16) scratch
    (each (8,1) column broadcasts against the (8,128) ray tile).  Uses the
    precomputed per-face constants in slots 9:14 (normal, n.v0, 1/|n|) like
    the packet kernel's _tri_test.  Same math as IntersectTriangle
    (TriObj.cpp:68-189).  Returns (t, front, ok)."""
    c = [frow[:, j:j + 1] for j in range(14)]
    v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = c[:9]
    nx, ny, nz, ndot0, inv_nlen = c[9:14]

    tdiv = nx * pdx + ny * pdy + nz * pdz
    pd = tdiv * (inv_nlen * inv_dlen)
    ok = jnp.abs(pd) >= PERP_EPS
    ndoto = nx * pox + ny * poy + nz * poz
    t = (ndot0 - ndoto) / jnp.where(tdiv == 0.0, 1e-30, tdiv)
    ok &= t > 0.0
    front = tdiv < 0.0
    if side == 0:
        ok &= front
    elif side == 1:
        ok &= ~front

    hx = pox + t * pdx
    hy = poy + t * pdy
    hz = poz + t * pdz

    anx, any_, anz = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
    use_x = (anx >= any_) & (anx >= anz)
    use_y = jnp.logical_and(jnp.logical_not(use_x),
                            (any_ >= anx) & (any_ >= anz))

    def pick(ax, ay, az):
        return jnp.where(use_x, ax, jnp.where(use_y, ay, az))

    p0u = pick(v0y, v0x, v0x)
    p0v = pick(v0z, v0z, v0y)
    p1u = pick(v1y, v1x, v1x)
    p1v = pick(v1z, v1z, v1y)
    p2u = pick(v2y, v2x, v2x)
    p2v = pick(v2z, v2z, v2y)
    pxu = pick(hy, hx, hx)
    pxv = pick(hz, hz, hy)

    a0 = (p1u - pxu) * (p2v - pxv) - (p1v - pxv) * (p2u - pxu)
    a1 = (p2u - pxu) * (p0v - pxv) - (p2v - pxv) * (p0u - pxu)
    a2 = (p0u - pxu) * (p1v - pxv) - (p0v - pxv) * (p1u - pxu)
    all_nonneg = (a0 >= 0.0) & (a1 >= 0.0) & (a2 >= 0.0)
    all_neg = (a0 < 0.0) & (a1 < 0.0) & (a2 < 0.0)
    ok &= all_nonneg | all_neg
    return t, front, ok


def _box_test_rows(nrow, pox, poy, poz, idx, idy, idz, t_best):
    """Vector slab test with per-row bounds nrow[:, 0:6] vs the ray tile."""
    t_lo = jnp.full(pox.shape, -BIG)
    t_hi = jnp.full(pox.shape, BIG)
    for ax, (po, inv) in enumerate(((pox, idx), (poy, idy), (poz, idz))):
        ta = (nrow[:, ax:ax + 1] - po) * inv
        tb = (nrow[:, 3 + ax:3 + ax + 1] - po) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(ta, tb))
        t_hi = jnp.minimum(t_hi, jnp.maximum(ta, tb))
    hit = (t_lo <= t_hi) & (t_lo < t_best) & (t_hi >= 0.0)
    return t_lo, hit


def _closest_kernel(side: int, n_faces: int, n_nodes: int,
                    root_ref, meta_ref, nodes, faces,
                    ox, oy, oz, dx, dy, dz, tinit,
                    t_out, face_out, front_out,
                    stack, sp_ref, t_ref, f_ref, fr_ref, scr1, scr2):
    pox, poy, poz = ox[...], oy[...], oz[...]
    pdx, pdy, pdz = dx[...], dy[...], dz[...]
    idx = 1.0 / jnp.where(pdx == 0.0, 1e-30, pdx)
    idy = 1.0 / jnp.where(pdy == 0.0, 1e-30, pdy)
    idz = 1.0 / jnp.where(pdz == 0.0, 1e-30, pdz)
    inv_dlen = jax.lax.rsqrt(
        jnp.maximum(pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))
    riota = jax.lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 0)
    riota1 = jax.lax.broadcasted_iota(jnp.int32, (SUBL, 1), 0)
    root = root_ref[0]

    t_ref[...] = tinit[...]
    f_ref[...] = jnp.full(pox.shape, -1, jnp.int32)
    fr_ref[...] = jnp.zeros(pox.shape, jnp.int32)

    # Per-row majority direction signs (rows are octant-sorted, so the vote
    # is unanimous except in boundary rows): scalars reused every iteration
    # for the ordered-descent near/far pick.
    half = LANES // 2
    dneg = []
    for comp in (pdx, pdy, pdz):
        neg = (comp < 0.0).astype(jnp.int32)
        dneg.append([
            (jnp.sum(jnp.where(riota == r, neg, 0)) > half).astype(jnp.int32)
            for r in range(SUBL)
        ])

    # Push the root unconditionally (no pre-loop root box test: broadcasting
    # one fetched row to all 8 sublanes constant-folds to a (1,1)->(8,128)
    # broadcast Mosaic rejects; the loop's internal phase tests children with
    # genuinely distinct rows, and an all-miss row just pops root once).
    go0 = jnp.int32(1)
    for r in range(SUBL):
        stack[r * STACK_DEPTH] = root
        sp_ref[r] = 1

    def cond(go):
        return go > 0

    def body(_):
        # --- scalar pops + metadata (one per row); sp lives in SMEM so the
        # pl.when-gated phases below can push without leaking traced values
        # out of their conditional regions ---
        lft, cnt, code, act = [], [], [], []
        any_leaf = jnp.int32(0)
        any_int = jnp.int32(0)
        for r in range(SUBL):
            sp = sp_ref[r]
            a = (sp > 0).astype(jnp.int32)
            node = stack[r * STACK_DEPTH + jnp.maximum(sp - 1, 0)] * a
            sp_ref[r] = sp - a
            m = meta_ref[node]
            c_ = (m >> 3) & 7
            lft.append(m >> 6)
            cnt.append(c_ * a)  # inactive rows contribute no leaf tests
            code.append(m & 7)
            act.append(a)
            is_l = a * (c_ > 0).astype(jnp.int32)
            any_leaf = jnp.maximum(any_leaf, is_l)
            any_int = jnp.maximum(any_int, a - is_l)

        # --- leaf phase (skipped when no row is at a leaf) ---
        @pl.when(any_leaf > 0)
        def _():
            t_best = t_ref[...]
            bface = f_ref[...]
            bfront = fr_ref[...]
            cnt_vec = jnp.zeros((SUBL, 1), jnp.int32)
            for r in range(SUBL):
                cnt_vec = jnp.where(riota1 == r, cnt[r], cnt_vec)
            for k in range(LEAF_SIZE):
                fvec = jnp.zeros((SUBL, 1), jnp.int32)
                for r in range(SUBL):
                    fidx = jnp.clip(lft[r] + k, 0, n_faces - 1)
                    scr1[pl.ds(r, 1), :] = faces[pl.ds(fidx, 1), :]
                    fvec = jnp.where(riota1 == r, fidx, fvec)
                t, fr, ok = _tri_test_rows(scr1[...], pox, poy, poz,
                                           pdx, pdy, pdz, inv_dlen, side)
                upd = ok & (t < t_best) & (k < cnt_vec)
                t_best = jnp.where(upd, t, t_best)
                bface = jnp.where(upd, jnp.broadcast_to(fvec, t.shape), bface)
                bfront = jnp.where(upd, fr.astype(jnp.int32), bfront)
            t_ref[...] = t_best
            f_ref[...] = bface
            fr_ref[...] = bfront

        # --- internal phase (skipped when no row is at an internal node) ---
        @pl.when(any_int > 0)
        def _():
            for r in range(SUBL):
                c1 = jnp.clip(lft[r], 0, n_nodes - 1)
                scr1[pl.ds(r, 1), :] = nodes[pl.ds(c1, 1), :]
                scr2[pl.ds(r, 1), :] = nodes[
                    pl.ds(jnp.minimum(c1 + 1, n_nodes - 1), 1), :]
            t_best = t_ref[...]
            _, h1 = _box_test_rows(scr1[...], pox, poy, poz, idx, idy, idz,
                                   t_best)
            _, h2 = _box_test_rows(scr2[...], pox, poy, poz, idx, idy, idz,
                                   t_best)
            h1i = h1.astype(jnp.int32)
            h2i = h2.astype(jnp.int32)
            for r in range(SUBL):
                is_int = act[r] * (cnt[r] == 0).astype(jnp.int32)
                h1a = _row_scalar_any(h1i, riota, r) * is_int
                h2a = _row_scalar_any(h2i, riota, r) * is_int
                # Ordered descent by this ROW's direction sign along the
                # node's child-separation axis (code: +3 = left child on
                # the high side) — same rule as the packet kernel but with
                # a per-row sign instead of a tile-wide vote.
                flip = (code[r] >= 3).astype(jnp.int32)
                ax = code[r] - 3 * flip
                dneg_r = jnp.where(ax == 0, dneg[0][r],
                                   jnp.where(ax == 1, dneg[1][r], dneg[2][r]))
                nil = (dneg_r == flip).astype(jnp.int32)  # near is left
                c1 = lft[r]
                near = c1 + (1 - nil)
                far = c1 + nil
                near_hit = nil * h1a + (1 - nil) * h2a
                far_hit = nil * h2a + (1 - nil) * h1a

                @pl.when(far_hit > 0)
                def _(r=r, far=far):
                    sp = sp_ref[r]
                    stack[r * STACK_DEPTH
                          + jnp.minimum(sp, STACK_DEPTH - 1)] = far
                    sp_ref[r] = sp + 1

                @pl.when(near_hit > 0)
                def _(r=r, near=near):
                    sp = sp_ref[r]
                    stack[r * STACK_DEPTH
                          + jnp.minimum(sp, STACK_DEPTH - 1)] = near
                    sp_ref[r] = sp + 1

        go = jnp.int32(0)
        for r in range(SUBL):
            go = jnp.maximum(go, sp_ref[r])
        return (go > 0).astype(jnp.int32)

    jax.lax.while_loop(cond, body, go0)
    t_out[...] = t_ref[...]
    face_out[...] = f_ref[...]
    front_out[...] = fr_ref[...]


def _anyhit_kernel(n_faces: int, n_nodes: int, bias: float,
                   root_ref, meta_ref, nodes, faces,
                   ox, oy, oz, dx, dy, dz, tmax,
                   occ_out, stack, sp_ref, occ_ref, scr1, scr2):
    pox, poy, poz = ox[...], oy[...], oz[...]
    pdx, pdy, pdz = dx[...], dy[...], dz[...]
    tm = tmax[...]
    idx = 1.0 / jnp.where(pdx == 0.0, 1e-30, pdx)
    idy = 1.0 / jnp.where(pdy == 0.0, 1e-30, pdy)
    idz = 1.0 / jnp.where(pdz == 0.0, 1e-30, pdz)
    inv_dlen = jax.lax.rsqrt(
        jnp.maximum(pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))
    riota = jax.lax.broadcasted_iota(jnp.int32, (SUBL, LANES), 0)
    riota1 = jax.lax.broadcasted_iota(jnp.int32, (SUBL, 1), 0)
    root = root_ref[0]

    occ_ref[...] = jnp.zeros(pox.shape, jnp.int32)

    # Root pushed unconditionally — see _closest_kernel for why there is no
    # pre-loop root box test (Mosaic rejects the folded dual broadcast).
    go0 = jnp.int32(1)
    for r in range(SUBL):
        stack[r * STACK_DEPTH] = root
        sp_ref[r] = 1

    def cond(go):
        return go > 0

    def body(_):
        # Retire rows whose every lane is occluded (shadow rays toward
        # point lights saturate fast).
        occ = occ_ref[...]
        not_occ = 1 - occ
        lft, cnt, act = [], [], []
        any_leaf = jnp.int32(0)
        any_int = jnp.int32(0)
        for r in range(SUBL):
            live = _row_scalar_any(not_occ, riota, r)
            sp = sp_ref[r] * live  # retired row drains its stack
            a = (sp > 0).astype(jnp.int32)
            node = stack[r * STACK_DEPTH + jnp.maximum(sp - 1, 0)] * a
            sp_ref[r] = sp - a
            m = meta_ref[node]
            c_ = (m >> 3) & 7
            lft.append(m >> 6)
            cnt.append(c_ * a)
            act.append(a)
            is_l = a * (c_ > 0).astype(jnp.int32)
            any_leaf = jnp.maximum(any_leaf, is_l)
            any_int = jnp.maximum(any_int, a - is_l)

        @pl.when(any_leaf > 0)
        def _():
            o_ = occ_ref[...]
            cnt_vec = jnp.zeros((SUBL, 1), jnp.int32)
            for r in range(SUBL):
                cnt_vec = jnp.where(riota1 == r, cnt[r], cnt_vec)
            for k in range(LEAF_SIZE):
                for r in range(SUBL):
                    fidx = jnp.clip(lft[r] + k, 0, n_faces - 1)
                    scr1[pl.ds(r, 1), :] = faces[pl.ds(fidx, 1), :]
                t, _, ok = _tri_test_rows(scr1[...], pox, poy, poz,
                                          pdx, pdy, pdz, inv_dlen, 0)
                hit = ok & (t > bias) & (t < tm) & (k < cnt_vec)
                o_ = jnp.maximum(o_, hit.astype(jnp.int32))
            occ_ref[...] = o_

        @pl.when(any_int > 0)
        def _():
            for r in range(SUBL):
                c1 = jnp.clip(lft[r], 0, n_nodes - 1)
                scr1[pl.ds(r, 1), :] = nodes[pl.ds(c1, 1), :]
                scr2[pl.ds(r, 1), :] = nodes[
                    pl.ds(jnp.minimum(c1 + 1, n_nodes - 1), 1), :]
            live = (occ_ref[...] < 1)
            _, h1 = _box_test_rows(scr1[...], pox, poy, poz, idx, idy, idz,
                                   tm)
            _, h2 = _box_test_rows(scr2[...], pox, poy, poz, idx, idy, idz,
                                   tm)
            h1i = (h1 & live).astype(jnp.int32)
            h2i = (h2 & live).astype(jnp.int32)
            for r in range(SUBL):
                is_int = act[r] * (cnt[r] == 0).astype(jnp.int32)
                h1a = _row_scalar_any(h1i, riota, r) * is_int
                h2a = _row_scalar_any(h2i, riota, r) * is_int
                c1 = lft[r]

                @pl.when(h1a > 0)
                def _(r=r, c1=c1):
                    sp = sp_ref[r]
                    stack[r * STACK_DEPTH
                          + jnp.minimum(sp, STACK_DEPTH - 1)] = c1
                    sp_ref[r] = sp + 1

                @pl.when(h2a > 0)
                def _(r=r, c1=c1):
                    sp = sp_ref[r]
                    stack[r * STACK_DEPTH
                          + jnp.minimum(sp, STACK_DEPTH - 1)] = c1 + 1
                    sp_ref[r] = sp + 1

        go = jnp.int32(0)
        for r in range(SUBL):
            go = jnp.maximum(go, sp_ref[r])
        return (go > 0).astype(jnp.int32)

    jax.lax.while_loop(cond, body, go0)
    occ_out[...] = occ_ref[...]


def bvh_closest_divergent(pack, root, o, d, hit_side: str, t_init=None,
                          reorder: bool = True):
    """Divergent closest hit; drop-in for pallas_bvh.bvh_closest_pallas
    (without the analytic fold — callers combine analytic hits via t_init /
    the XLA side, as the non-folded packet path does)."""
    if t_init is None:
        t_init = jnp.full((o.shape[0],), BIG)
    if reorder:
        order = _coherence_order(pack, root, o, d, t_init)
        inv = inverse_permutation(order)
        t, face, front = bvh_closest_divergent(
            pack, root, o[order], d[order], hit_side, t_init[order],
            reorder=False,
        )
        return t[inv], face[inv], front[inv]
    comps, n = _pad_rays(o, d)
    g = comps[0].shape[0]
    side = {"front": 0, "back": 1, "both": 2}[hit_side]
    pad = g * LANES - n
    ti = (
        jnp.concatenate([t_init.astype(jnp.float32),
                         jnp.zeros((pad,), jnp.float32)])
        if pad else t_init.astype(jnp.float32)
    ).reshape(g, LANES)
    nodes = pack.pallas_nodes
    faces = pack.pallas_faces
    meta = _pack_meta(nodes)
    kernel = functools.partial(_closest_kernel, side,
                               int(faces.shape[0]), int(nodes.shape[0]))
    ray_spec = pl.BlockSpec((SUBL, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    arr = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    w = nodes.shape[1]
    t, face, front = pl.pallas_call(
        kernel,
        grid=(g // SUBL,),
        in_specs=[smem, smem, arr, arr] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, LANES), jnp.int32),
            jax.ShapeDtypeStruct((g, LANES), jnp.int32),
        ),
        scratch_shapes=[
            pltpu.SMEM((SUBL * STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((SUBL,), jnp.int32),
            pltpu.VMEM((SUBL, LANES), jnp.float32),
            pltpu.VMEM((SUBL, LANES), jnp.int32),
            pltpu.VMEM((SUBL, LANES), jnp.int32),
            pltpu.VMEM((SUBL, w), jnp.float32),
            pltpu.VMEM((SUBL, w), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(
        jnp.asarray([root], jnp.int32), meta,
        nodes, faces,
        *comps, ti,
    )
    return (
        t.reshape(-1)[:n],
        face.reshape(-1)[:n],
        front.reshape(-1)[:n].astype(bool),
    )


def bvh_anyhit_divergent(pack, root, o, d, t_min: float, t_max,
                         reorder: bool = True):
    """Divergent any-hit; drop-in for pallas_bvh.bvh_anyhit_pallas (no
    analytic fold — see bvh_closest_divergent)."""
    if reorder:
        tm = jnp.broadcast_to(t_max, (o.shape[0],))
        order = _coherence_order(pack, root, o, d, tm)
        inv = inverse_permutation(order)
        occ = bvh_anyhit_divergent(
            pack, root, o[order], d[order], t_min, tm[order], reorder=False
        )
        return occ[inv]
    comps, n = _pad_rays(o, d)
    g = comps[0].shape[0]
    tmax_full = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    pad = g * LANES - n
    tmax_p = (
        jnp.concatenate([tmax_full, jnp.zeros((pad,), jnp.float32)])
        if pad else tmax_full
    ).reshape(g, LANES)
    nodes = pack.pallas_nodes
    faces = pack.pallas_faces
    meta = _pack_meta(nodes)
    kernel = functools.partial(_anyhit_kernel, int(faces.shape[0]),
                               int(nodes.shape[0]), t_min)
    ray_spec = pl.BlockSpec((SUBL, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    arr = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    w = nodes.shape[1]
    occ = pl.pallas_call(
        kernel,
        grid=(g // SUBL,),
        in_specs=[smem, smem, arr, arr] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((g, LANES), jnp.int32),
        scratch_shapes=[
            pltpu.SMEM((SUBL * STACK_DEPTH,), jnp.int32),
            pltpu.SMEM((SUBL,), jnp.int32),
            pltpu.VMEM((SUBL, LANES), jnp.int32),
            pltpu.VMEM((SUBL, w), jnp.float32),
            pltpu.VMEM((SUBL, w), jnp.float32),
        ],
        interpret=jax.default_backend() != "tpu",
    )(
        jnp.asarray([root], jnp.int32), meta,
        nodes, faces,
        *comps, tmax_p,
    )
    return occ.reshape(-1)[:n].astype(bool)
