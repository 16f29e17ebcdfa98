"""Pallas TPU packet BVH traversal.

The XLA traversal (ops/trace.py bvh_closest) is a lax.while_loop whose every
iteration round-trips per-ray node gathers through HBM. This kernel keeps an
entire 8x128 ray tile resident and traverses with a SHARED scalar stack in
SMEM (classic packet traversal): a node is visited if ANY ray in the tile
wants it; node and face data live in (rows, 16) f32 VMEM tables fetched with
dynamic `pl.ds` row slices (Mosaic cannot scalar-gather 1-D VMEM arrays);
triangle and slab tests are vector ops over the tile.

Trade-offs (documented):
  - coherent tiles (camera rays) traverse near-optimally; incoherent tiles
    visit the union of their rays' paths — still correct, just less pruning;
  - node/face tables must fit in VMEM (the 16-wide rows pad to 128 lanes
    physically); `fits_vmem` gates the kernel with the XLA path as fallback.

Replaces (same results): TraceBVHNode / TraceBVHShadow (TriObj.cpp:192-307)
with the reference's ordered-descent pruning expressed per tile.
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
from bhraytracer_tpu.ops.pallas_analytic import analytic_anyhit, analytic_closest

LANES = 128
SUBL = 8
BLOCK = SUBL * LANES
LEAF_SIZE = 4
STACK_DEPTH = 64
VMEM_BUDGET = 8 << 20  # physical bytes for node+face tables (single-shot)
# Per-treelet row budget for STREAMED traversal of bigger scenes (each
# 16-wide row pads to 128 lanes physically: 512 B/row -> 4 MB/treelet).
TREELET_BUDGET_ROWS = (4 << 20) // (LANES * 4)


# Coherence-sort origin-cell resolution per axis. 4 (=4x4x4 cells) was
# tuned on 65K-lane chunks (round-2 ledger: 8x8x8 "no better" there); at
# 480K-lane whole-image chunks each (octant, cell) bucket holds ~7x more
# lanes, so finer cells might have paid — MEASURED on TPU (round 4, 480K
# fused, proj12_backfaceTest): baseline 599.9 ms/chunk, cells8 603.4,
# cells16 601.5 — a wash. Direction octant dominates; keep 4.
_CELL_RES = 4


def set_cell_res(res: int) -> None:
    global _CELL_RES
    assert res in (2, 4, 8, 16)
    _CELL_RES = res


# Sort stability of the per-trace coherence reorder (A/B toggle; see
# _coherence_order). False is SAFE (sort->trace->unsort; results identical
# up to equal-t seam ties) and ~2x cheaper in isolation (drill_sort480:
# 0.35 vs 0.79 ms at 480K) — but the image-level 480K sweep measured
# stable FASTER in context (593.7 vs 601.7 ms/chunk), so the default
# follows the in-context number (attribution must stay image-level).
_STABLE_REORDER = True


def set_stable_reorder(stable: bool) -> None:
    global _STABLE_REORDER
    _STABLE_REORDER = stable


def fits_vmem(pack) -> bool:
    rows = pack.pallas_nodes.shape[0] + pack.pallas_faces.shape[0]
    return rows * LANES * 4 <= VMEM_BUDGET  # 16-wide rows pad to 128 lanes


def pallas_traversable(pack) -> bool:
    """The packet kernel covers this scene: either the whole tree is VMEM-
    resident or compile_scene built a streamed treelet layout."""
    return bool(pack.treelets) or fits_vmem(pack)


def _pad_rays(o, d):
    n = o.shape[0]
    g = -(-n // BLOCK) * SUBL
    pad = g * LANES - n

    def prep(x):
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) if pad else x
        return x.reshape(g, LANES)

    return [prep(o[:, k]) for k in range(3)] + [prep(d[:, k]) for k in range(3)], n


def _row(ref, idx, upto: int = 16):
    """Dynamic row fetch -> tuple of the first `upto` scalars."""
    r = ref[pl.ds(idx, 1), :]
    return [r[0, j] for j in range(upto)]


def _tri_test(faces_ref, fidx, pox, poy, poz, pdx, pdy, pdz, inv_dlen,
              side: int):
    """Vector triangle test of face row `fidx` against the tile.

    Mirrors IntersectTriangle (TriObj.cpp:68-189) incl. the grazing cull and
    dominant-axis projected signed areas. The face normal, n.v0, and 1/|n|
    are per-face invariants precomputed into row slots 9:14 (scene/compile);
    inv_dlen = 1/|d| is the per-ray invariant hoisted out by the caller.
    Returns (t, front, ok)."""
    f = _row(faces_ref, fidx, upto=14)
    v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = f[:9]
    nx, ny, nz, ndot0, inv_nlen = f[9:14]

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

    # Dominant-axis projection by |n| (scalar choice per face).
    anx, any_, anz = jnp.abs(nx), jnp.abs(ny), jnp.abs(nz)
    use_x = (anx >= any_) & (anx >= anz)
    use_y = jnp.logical_and(jnp.logical_not(use_x), (any_ >= anx) & (any_ >= anz))

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


def _box_test(row, lo, pox, poy, poz, idx, idy, idz, t_best):
    """Vector slab test against node bounds scalars row[lo:lo+6]."""
    t_lo = jnp.full(pox.shape, -BIG)
    t_hi = jnp.full(pox.shape, BIG)
    for ax, (po, inv) in enumerate(((pox, idx), (poy, idy), (poz, idz))):
        ta = (row[lo + ax] - po) * inv
        tb = (row[lo + 3 + ax] - po) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(ta, tb))
        t_hi = jnp.minimum(t_hi, jnp.maximum(ta, tb))
    hit = (t_lo <= t_hi) & (t_lo < t_best) & (t_hi >= 0.0)
    return t_lo, hit


def _closest_kernel(side: int, n_faces: int, n_sph: int, n_pln: int,
                    root_ref, nodes, faces, sph_ref, pln_ref,
                    ox, oy, oz, dx, dy, dz, tinit,
                    t_out, face_out, front_out,
                    stack):
    pox, poy, poz = ox[...], oy[...], oz[...]
    pdx, pdy, pdz = dx[...], dy[...], dz[...]
    idx = 1.0 / jnp.where(pdx == 0.0, 1e-30, pdx)
    idy = 1.0 / jnp.where(pdy == 0.0, 1e-30, pdy)
    idz = 1.0 / jnp.where(pdz == 0.0, 1e-30, pdz)
    inv_dlen = jax.lax.rsqrt(
        jnp.maximum(pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))
    # Majority direction sign per tile (tiles are octant-sorted, so the vote
    # is unanimous except in boundary tiles): drives the near/far child pick
    # as one scalar select per node instead of two masked min-reductions.
    half = (SUBL * LANES) // 2
    dneg_x = jnp.sum((pdx < 0.0).astype(jnp.int32)) > half
    dneg_y = jnp.sum((pdy < 0.0).astype(jnp.int32)) > half
    dneg_z = jnp.sum((pdz < 0.0).astype(jnp.int32)) > half
    root = root_ref[0]

    # Analytic instances FIRST via the shared fold (pallas_analytic —
    # also used by the stream kernel; same formulas and face coding as
    # ops/pallas_trace's dedicated kernels): their best-t then prunes the
    # mesh traversal below per lane.
    t0, bface0, bfront0 = analytic_closest(
        side, n_sph, n_pln, sph_ref, pln_ref,
        pox, poy, poz, pdx, pdy, pdz, tinit[...])

    root_row = _row(nodes, root, upto=8)
    _, root_hit = _box_test(root_row, 0, pox, poy, poz, idx, idy, idz, t0)
    stack[0] = root
    sp0 = jnp.where(jnp.any(root_hit), 1, 0)

    def cond(c):
        return c[0] > 0

    def body(c):
        sp, t_best, bface, bfront = c
        node = stack[sp - 1]
        sp = sp - 1
        row = _row(nodes, node, upto=9)
        lft = row[6].astype(jnp.int32)
        cnt = row[7].astype(jnp.int32)

        def leaf_fn(args):
            tb, bf, bfr, s = args
            for k in range(LEAF_SIZE):
                fidx = jnp.minimum(lft + k, n_faces - 1)
                t, fr, ok = _tri_test(faces, fidx, pox, poy, poz,
                                      pdx, pdy, pdz, inv_dlen, side)
                upd = ok & (t < tb) & (k < cnt)
                tb = jnp.where(upd, t, tb)
                bf = jnp.where(upd, fidx, bf)
                bfr = jnp.where(upd, fr.astype(jnp.int32), bfr)
            return tb, bf, bfr, s

        def internal_fn(args):
            tb, bf, bfr, s = args
            row1 = _row(nodes, lft, upto=8)
            row2 = _row(nodes, lft + 1, upto=8)
            _, h1 = _box_test(row1, 0, pox, poy, poz, idx, idy, idz, tb)
            _, h2 = _box_test(row2, 0, pox, poy, poz, idx, idy, idz, tb)
            h1a = jnp.any(h1)
            h2a = jnp.any(h2)
            # Ordered descent by the tile's direction sign along the node's
            # child-separation axis (row slot 8; +3 = left child on the
            # high side). Near child goes on top of the stack.
            code = row[8].astype(jnp.int32)
            flip = code >= 3
            ax = code - 3 * flip.astype(jnp.int32)
            dneg = jnp.where(ax == 0, dneg_x, jnp.where(ax == 1, dneg_y,
                                                        dneg_z))
            near_is_left = dneg == flip  # ray toward low side -> high child far
            near = jnp.where(near_is_left, lft, lft + 1)
            far = jnp.where(near_is_left, lft + 1, lft)
            near_hit = jnp.where(near_is_left, h1a, h2a)
            far_hit = jnp.where(near_is_left, h2a, h1a)
            s1 = s + far_hit.astype(jnp.int32)

            @pl.when(far_hit)
            def _():
                stack[s] = far

            @pl.when(near_hit)
            def _():
                stack[s1] = near

            return tb, bf, bfr, s1 + near_hit.astype(jnp.int32)

        tb, bf, bfr, sp = jax.lax.cond(
            cnt > 0, leaf_fn, internal_fn, (t_best, bface, bfront, sp)
        )
        return sp, tb, bf, bfr

    init = (sp0, t0, bface0, bfront0)
    sp, t_best, bface, bfront = jax.lax.while_loop(cond, body, init)
    t_out[...] = t_best
    face_out[...] = bface
    front_out[...] = bfront


def _coherence_order(pack, root, o, d, t_init):
    """Sort key: lanes that cannot hit the mesh (root-box miss, or the box
    is beyond their current-best t) go last — their tiles early-exit at the
    kernel's root test — and live lanes group by (direction octant, coarse
    origin cell) so packet tiles stay coherent even for secondary rays
    (incoherent tiles traverse the union of their rays' paths).

    Reads the root box from the XLA-layout arrays (valid for both the
    single-shot and the treelet-streamed pallas_nodes layouts)."""
    bmin = pack.bvh_bmin[root]
    bmax = pack.bvh_bmax[root]
    inv = 1.0 / jnp.where(d == 0.0, 1e-30, d)
    ta = (bmin[None, :] - o) * inv
    tb = (bmax[None, :] - o) * inv
    tlo = jnp.max(jnp.minimum(ta, tb), axis=1)
    thi = jnp.min(jnp.maximum(ta, tb), axis=1)
    live = (tlo <= thi) & (thi >= 0.0) & (tlo < t_init)
    oct_ = (
        (d[:, 0] > 0).astype(jnp.int32)
        + 2 * (d[:, 1] > 0).astype(jnp.int32)
        + 4 * (d[:, 2] > 0).astype(jnp.int32)
    )
    # Coarse origin cell relative to the root box (_CELL_RES per axis).
    r = _CELL_RES
    ext = jnp.maximum(bmax - bmin, 1e-6)
    cell = jnp.clip(((o - bmin[None, :]) / ext[None, :] * r), 0.0, r - 1.0)
    cell = cell.astype(jnp.int32)
    cell_id = cell[:, 0] + r * cell[:, 1] + r * r * cell[:, 2]
    n_cells = r * r * r
    key = jnp.where(live, oct_ * n_cells + cell_id, 8 * n_cells)
    # Unstable sort: the reorder is internal (sort -> trace -> unsort) and
    # every traced quantity is a per-lane function of that lane's ray, so
    # tile membership cannot change active-lane results — outputs are
    # bit-identical to the stable sort while the sort itself is ~2x cheaper
    # (480K drill: 0.35 vs 0.79 ms; tests pin stable-vs-unstable equality).
    return jnp.argsort(key, stable=_STABLE_REORDER)


def _closest_call(nodes, faces, root: int, side: int, o, d, t_init,
                  sph_tab=None, pln_tab=None):
    """One pallas_call over the given node/face row tables (a whole tree or
    one treelet slice). Returns (t, LOCAL face row, front i32). With
    sph_tab/pln_tab, the analytic instances are tested in the same kernel
    (negative face coding, see _closest_kernel)."""
    comps, n = _pad_rays(o, d)
    g = comps[0].shape[0]
    pad = g * LANES - n
    ti = (
        jnp.concatenate([t_init.astype(jnp.float32),
                         jnp.zeros((pad,), jnp.float32)])
        if pad else t_init.astype(jnp.float32)
    ).reshape(g, LANES)
    n_sph = int(sph_tab.shape[0]) if sph_tab is not None else 0
    n_pln = int(pln_tab.shape[0]) if pln_tab is not None else 0
    sph_tab = sph_tab if n_sph else jnp.zeros((1, 12), jnp.float32)
    pln_tab = pln_tab if n_pln else jnp.zeros((1, 12), jnp.float32)
    kernel = functools.partial(_closest_kernel, side, int(faces.shape[0]),
                               n_sph, n_pln)
    ray_spec = pl.BlockSpec((SUBL, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    arr = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    t, face, front = pl.pallas_call(
        kernel,
        grid=(g // SUBL,),
        in_specs=[smem1, arr, arr, arr, arr] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, LANES), jnp.int32),
            jax.ShapeDtypeStruct((g, LANES), jnp.int32),
        ),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(
        jnp.asarray([root], jnp.int32),
        nodes, faces, sph_tab, pln_tab,
        *comps, ti,
    )
    return (
        t.reshape(-1)[:n],
        face.reshape(-1)[:n],
        front.reshape(-1)[:n],
    )


def bvh_closest_pallas(pack, root, o, d, hit_side: str, t_init=None,
                       reorder: bool = True, sph_tab=None, pln_tab=None):
    """Packet-traversal closest hit. o, d: (N,3) world rays; returns
    (t, face, front) with t = BIG on miss. t_init (N,) seeds per-lane
    pruning with the best hit found so far.

    With sph_tab/pln_tab the analytic instances are folded into the SAME
    kernel (one launch, one XLA combine fewer per trace): an analytic
    winner's face is coded -(2 + inst*4 + kind*2 + front) <= -2, a mesh
    winner is its global face row, miss is -1.

    Scenes beyond the VMEM budget stream one treelet slice per kernel call
    (pack.treelets); per-lane best-t carries across calls so later treelets
    prune against earlier hits."""
    if t_init is None:
        t_init = jnp.full((o.shape[0],), BIG)
    if reorder:
        order = _coherence_order(pack, root, o, d, t_init)
        inv = inverse_permutation(order)
        t, face, front = bvh_closest_pallas(
            pack, root, o[order], d[order], hit_side, t_init[order],
            reorder=False, sph_tab=sph_tab, pln_tab=pln_tab,
        )
        return t[inv], face[inv], front[inv]
    side = {"front": 0, "back": 1, "both": 2}[hit_side]
    if pack.treelets:
        # Uniform padded blocks -> ONE kernel shape; lax.scan keeps the XLA
        # program size constant in the treelet count. Per-lane best-t is the
        # scan carry, so later treelets prune against earlier hits.
        t_c = len(pack.treelets)
        nodes3 = pack.pallas_nodes.reshape(t_c, -1, pack.pallas_nodes.shape[1])
        faces3 = pack.pallas_faces.reshape(t_c, -1, pack.pallas_faces.shape[1])
        fstarts = jnp.asarray([fs for fs, _ in pack.treelets], jnp.int32)

        def body(carry, xs):
            t_best, face, front = carry
            nd, fc, fs0 = xs
            t, f_loc, fr = _closest_call(nd, fc, 0, side, o, d, t_best)
            upd = t < t_best
            return (jnp.where(upd, t, t_best),
                    jnp.where(upd, f_loc + fs0, face),
                    jnp.where(upd, fr, front)), None

        init = (t_init.astype(jnp.float32),
                jnp.full(t_init.shape, -1, jnp.int32),
                jnp.zeros(t_init.shape, jnp.int32))
        (t_best, face, front), _ = jax.lax.scan(
            body, init, (nodes3, faces3, fstarts))
        return t_best, face, front.astype(bool)
    t, face, front = _closest_call(
        pack.pallas_nodes, pack.pallas_faces, root, side, o, d, t_init,
        sph_tab=sph_tab, pln_tab=pln_tab)
    return t, face, front.astype(bool)


def _anyhit_kernel(n_faces: int, bias: float, n_sph: int, n_pln: int,
                   ana_bias: float, plane_world_bug: bool,
                   root_ref, nodes, faces, sph_ref, pln_ref,
                   ox, oy, oz, dx, dy, dz, tmax,
                   occ_out, stack):
    pox, poy, poz = ox[...], oy[...], oz[...]
    pdx, pdy, pdz = dx[...], dy[...], dz[...]
    tm = tmax[...]
    idx = 1.0 / jnp.where(pdx == 0.0, 1e-30, pdx)
    idy = 1.0 / jnp.where(pdy == 0.0, 1e-30, pdy)
    idz = 1.0 / jnp.where(pdz == 0.0, 1e-30, pdz)
    inv_dlen = jax.lax.rsqrt(
        jnp.maximum(pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))
    root = root_ref[0]

    # Analytic occlusion FIRST (ShadowRayRecursive's sphere/plane math,
    # formulas identical to ops/pallas_trace's shadow kernel, which this
    # fold replaces for mesh scenes): occluded lanes then retire from the
    # traversal vote below with tm = 0.
    occ0 = analytic_anyhit(n_sph, n_pln, sph_ref, pln_ref,
                           pox, poy, poz, pdx, pdy, pdz, tm,
                           ana_bias, plane_world_bug)
    tm = jnp.where(occ0 > 0, 0.0, tm)

    # Prune box descent against the parametric shadow bound: boxes entered
    # beyond a lane's t_max cannot occlude it (shadow rays toward point
    # lights have t_max = 1, so this prunes hard). Occluded lanes drop out
    # of the vote via `live` below.
    root_row = _row(nodes, root, upto=8)
    _, root_hit = _box_test(root_row, 0, pox, poy, poz, idx, idy, idz, tm)
    stack[0] = root
    sp0 = jnp.where(jnp.any(root_hit), 1, 0)

    # occlusion carried as int32 0/1: Mosaic cannot legalize i1 vectors
    # through scf.if (lax.cond) carries.
    def cond(c):
        sp, occ = c
        return (sp > 0) & (jnp.min(occ) < 1)

    def body(c):
        sp, occ = c
        node = stack[sp - 1]
        sp = sp - 1
        row = _row(nodes, node, upto=8)
        lft = row[6].astype(jnp.int32)
        cnt = row[7].astype(jnp.int32)

        def leaf_fn(args):
            o_, s = args
            for k in range(LEAF_SIZE):
                fidx = jnp.minimum(lft + k, n_faces - 1)
                t, fr, ok = _tri_test(faces, fidx, pox, poy, poz,
                                      pdx, pdy, pdz, inv_dlen, 0)  # front-only
                hit = ok & (t > bias) & (t < tm) & (k < cnt)
                o_ = jnp.maximum(o_, hit.astype(jnp.int32))
            return o_, s

        def internal_fn(args):
            o_, s = args
            row1 = _row(nodes, lft, upto=8)
            row2 = _row(nodes, lft + 1, upto=8)
            _, h1 = _box_test(row1, 0, pox, poy, poz, idx, idy, idz, tm)
            _, h2 = _box_test(row2, 0, pox, poy, poz, idx, idy, idz, tm)
            live = o_ < 1
            h1a = jnp.any(h1 & live)
            h2a = jnp.any(h2 & live)
            s1 = s + h1a.astype(jnp.int32)

            @pl.when(h1a)
            def _():
                stack[s] = lft

            @pl.when(h2a)
            def _():
                stack[s1] = lft + 1

            return o_, s1 + h2a.astype(jnp.int32)

        occ, sp = jax.lax.cond(cnt > 0, leaf_fn, internal_fn, (occ, sp))
        return sp, occ

    _, occ = jax.lax.while_loop(cond, body, (sp0, occ0))
    occ_out[...] = occ


def _anyhit_call(nodes, faces, root: int, t_min: float, o, d, t_max,
                 sph_tab=None, pln_tab=None, ana_bias: float = 0.0,
                 plane_world_bug: bool = False):
    comps, n = _pad_rays(o, d)
    g = comps[0].shape[0]
    tmax_full = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    pad = g * LANES - n
    tmax_p = (
        jnp.concatenate([tmax_full, jnp.zeros((pad,), jnp.float32)])
        if pad else tmax_full
    ).reshape(g, LANES)
    n_sph = int(sph_tab.shape[0]) if sph_tab is not None else 0
    n_pln = int(pln_tab.shape[0]) if pln_tab is not None else 0
    sph_tab = sph_tab if n_sph else jnp.zeros((1, 12), jnp.float32)
    pln_tab = pln_tab if n_pln else jnp.zeros((1, 12), jnp.float32)
    kernel = functools.partial(_anyhit_kernel, int(faces.shape[0]), t_min,
                               n_sph, n_pln, ana_bias, plane_world_bug)
    ray_spec = pl.BlockSpec((SUBL, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    arr = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(g // SUBL,),
        in_specs=[smem1, arr, arr, arr, arr] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((g, LANES), jnp.int32),
        scratch_shapes=[pltpu.SMEM((STACK_DEPTH,), jnp.int32)],
        interpret=jax.default_backend() != "tpu",
    )(
        jnp.asarray([root], jnp.int32),
        nodes, faces, sph_tab, pln_tab,
        *comps, tmax_p,
    )
    return occ.reshape(-1)[:n].astype(bool)


def bvh_anyhit_pallas(pack, root, o, d, t_min: float, t_max,
                      reorder: bool = True, sph_tab=None, pln_tab=None,
                      ana_bias: float = 0.0, plane_world_bug: bool = False):
    if reorder:
        tm = jnp.broadcast_to(t_max, (o.shape[0],))
        order = _coherence_order(pack, root, o, d, tm)
        inv = inverse_permutation(order)
        occ = bvh_anyhit_pallas(
            pack, root, o[order], d[order], t_min, tm[order], reorder=False,
            sph_tab=sph_tab, pln_tab=pln_tab, ana_bias=ana_bias,
            plane_world_bug=plane_world_bug,
        )
        return occ[inv]
    if pack.treelets:
        tm = jnp.broadcast_to(t_max, (o.shape[0],)).astype(jnp.float32)
        t_c = len(pack.treelets)
        nodes3 = pack.pallas_nodes.reshape(t_c, -1, pack.pallas_nodes.shape[1])
        faces3 = pack.pallas_faces.reshape(t_c, -1, pack.pallas_faces.shape[1])

        def body(occ, xs):
            nd, fc = xs
            # Already-occluded lanes carry t_max = 0 so the root test
            # retires them instantly in later treelets.
            tm_live = jnp.where(occ, 0.0, tm)
            return occ | _anyhit_call(nd, fc, 0, t_min, o, d, tm_live), None

        occ, _ = jax.lax.scan(body, jnp.zeros(tm.shape, bool),
                              (nodes3, faces3))
        return occ
    return _anyhit_call(
        pack.pallas_nodes, pack.pallas_faces, root, t_min, o, d, t_max,
        sph_tab=sph_tab, pln_tab=pln_tab, ana_bias=ana_bias,
        plane_world_bug=plane_world_bug)
