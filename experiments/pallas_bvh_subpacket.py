"""Pallas TPU sub-packet BVH traversal: 8 independent descents per tile.

The packet kernel (ops/pallas_bvh.py) shares ONE stack across a (8,128)
tile, so a tile traverses the UNION of its 1024 rays' paths — near-optimal
for coherent camera rays, weak for incoherent GI/TIR rays (VERDICT r1 #2:
6.2M rays/s on fully-incoherent proj11). This kernel gives every sublane
ROW (128 rays) its own stack and its own ordered descent, cutting union
divergence 8x while keeping full (8,128) vector tests:

  - per-row node/face rows are fetched with ONE-HOT MATMULS on the MXU at
    Precision.HIGHEST — measured BIT-EXACT on TPU (each output is a sum
    with exactly one nonzero term; the default matmul precision rounds
    f32 to bf16 and is NOT exact). Mosaic cannot scalar-gather VMEM; the
    MXU is the gather engine here.
  - per-row stacks live in loop-carried (8, DEPTH) registers, pushed and
    popped with iota==sp one-hot selects — no scalar loops.
  - rows retire independently: the while_loop runs until the LAST ROW
    finishes (not the last tile-union path).

Same results as TraceBVHNode / TraceBVHShadow (TriObj.cpp:192-307); the
coherence sort in pallas_bvh groups each row into one (octant, origin-cell)
bucket, so a row's union is a genuinely coherent packet.

MEASURED OUTCOME (TPU v5e, 65K fully-incoherent proj11 rays): 2.0M rays/s
vs the packet kernel's 5.9M — the 7 one-hot fetches per iteration cost more
than the 8x union reduction saves at these tree sizes (~1K nodes, ~1.4K
faces). Kept as a correct, tested alternative and as the starting point for
treelet-style designs; trace_closest does NOT route here by default.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bhraytracer_tpu.ops.compact import inverse_permutation
from bhraytracer_tpu.ops.linalg import BIG
from bhraytracer_tpu.ops.pallas_bvh import (
    LANES,
    LEAF_SIZE,
    STACK_DEPTH,
    SUBL,
    _coherence_order,
    _pad_rays,
)
from bhraytracer_tpu.ops.intersect import PERP_EPS

HI = jax.lax.Precision.HIGHEST


def _pad_rows(tab, mult=128):
    rows = tab.shape[0]
    pad = (-rows) % mult
    if pad:
        tab = jnp.concatenate([tab, jnp.zeros((pad,) + tab.shape[1:],
                                              tab.dtype)])
    return tab


def _fetch(tab_ref, idx):
    """Bit-exact per-row fetch: (8,1) int ids -> (8,16) rows via one-hot
    matmul on the MXU (see module docstring)."""
    k = tab_ref.shape[0]
    oh = (jax.lax.broadcasted_iota(jnp.int32, (SUBL, k), 1) == idx).astype(
        jnp.float32
    )
    return jax.lax.dot(oh, tab_ref[...], precision=HI)


def _row_any_i(x):
    """(8,N) bool -> (8,1) int32 0/1. Mosaic cannot materialize narrow
    (8,1) i1 vectors (bool reductions and selects on them fail with
    "Unsupported target bitwidth for truncation"), so ALL (8,1) masks in
    these kernels are int32 and selects on them are arithmetic."""
    return jnp.max(x.astype(jnp.int32), axis=1, keepdims=True)


def _tri_test_rows(frow, pox, poy, poz, pdx, pdy, pdz, side: int):
    """Vector triangle test with PER-ROW face data (each (8,1) column
    broadcasts against the (8,128) ray tile). Same math as
    pallas_bvh._tri_test (IntersectTriangle, TriObj.cpp:68-189)."""
    c = [frow[:, j:j + 1] for j in range(9)]
    v0x, v0y, v0z, v1x, v1y, v1z, v2x, v2y, v2z = c

    e1x, e1y, e1z = v1x - v0x, v1y - v0y, v1z - v0z
    e2x, e2y, e2z = v2x - v0x, v2y - v0y, v2z - v0z
    nx = e1y * e2z - e1z * e2y
    ny = e1z * e2x - e1x * e2z
    nz = e1x * e2y - e1y * e2x

    tdiv = nx * pdx + ny * pdy + nz * pdz
    nlen = jnp.sqrt(jnp.maximum(nx * nx + ny * ny + nz * nz, 1e-30))
    dlen = jnp.sqrt(jnp.maximum(pdx * pdx + pdy * pdy + pdz * pdz, 1e-30))
    pd = tdiv / jnp.maximum(nlen * dlen, 1e-30)
    ok = jnp.abs(pd) >= PERP_EPS
    ndot0 = nx * v0x + ny * v0y + nz * v0z
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


def _box_test_rows(nrow, lo, pox, poy, poz, idx, idy, idz, t_best):
    """Vector slab test with per-row bounds (8,1) vs the ray tile."""
    t_lo = jnp.full(pox.shape, -BIG)
    t_hi = jnp.full(pox.shape, BIG)
    for ax, (po, inv) in enumerate(((pox, idx), (poy, idy), (poz, idz))):
        ta = (nrow[:, lo + ax:lo + ax + 1] - po) * inv
        tb = (nrow[:, lo + 3 + ax:lo + 3 + ax + 1] - po) * inv
        t_lo = jnp.maximum(t_lo, jnp.minimum(ta, tb))
        t_hi = jnp.minimum(t_hi, jnp.maximum(ta, tb))
    hit = (t_lo <= t_hi) & (t_lo < t_best) & (t_hi >= 0.0)
    return t_lo, hit


def _closest_kernel(side: int, n_faces: int,
                    root_ref, nodes, faces,
                    ox, oy, oz, dx, dy, dz, tinit,
                    t_out, face_out, front_out):
    pox, poy, poz = ox[...], oy[...], oz[...]
    pdx, pdy, pdz = dx[...], dy[...], dz[...]
    idx = 1.0 / jnp.where(pdx == 0.0, 1e-30, pdx)
    idy = 1.0 / jnp.where(pdy == 0.0, 1e-30, pdy)
    idz = 1.0 / jnp.where(pdz == 0.0, 1e-30, pdz)
    root = root_ref[0]

    t0 = tinit[...]
    root_row = _fetch(nodes, jnp.full((SUBL, 1), root, jnp.int32))
    _, root_hit = _box_test_rows(root_row, 0, pox, poy, poz, idx, idy, idz, t0)

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUBL, STACK_DEPTH), 1)
    stack0 = jnp.where(iota_s == 0, root, 0)
    sp0 = _row_any_i(root_hit)  # (8,1) i32

    def cond(c):
        return jnp.max(c[0]) > 0

    def body(c):
        sp, stack, t_best, bface, bfront = c
        active_i = jnp.minimum(jnp.maximum(sp, 0), 1)  # (8,1) i32 0/1
        node = jnp.sum(jnp.where(iota_s == (sp - 1), stack, 0), axis=1,
                       keepdims=True)
        node = node * active_i
        sp = sp - active_i

        nrow = _fetch(nodes, node)  # (8,16)
        lft = nrow[:, 6:7].astype(jnp.int32)
        cnt = nrow[:, 7:8].astype(jnp.int32)
        is_leaf_i = active_i * (cnt > 0).astype(jnp.int32)
        is_int_i = active_i * (cnt == 0).astype(jnp.int32)

        # --- leaves: each row tests ITS OWN up-to-4 contiguous faces ---
        for k in range(LEAF_SIZE):
            fidx = jnp.minimum(jnp.maximum(lft + k, 0), n_faces - 1)
            frow = _fetch(faces, fidx)
            t, fr, ok = _tri_test_rows(frow, pox, poy, poz, pdx, pdy, pdz,
                                       side)
            kmask_i = is_leaf_i * (k < cnt).astype(jnp.int32)  # (8,1)
            leaf128 = jnp.broadcast_to(kmask_i, t.shape) > 0  # wide i1
            upd = ok & (t < t_best) & leaf128
            t_best = jnp.where(upd, t, t_best)
            bface = jnp.where(upd, jnp.broadcast_to(fidx, t.shape), bface)
            bfront = jnp.where(upd, fr.astype(jnp.int32), bfront)

        # --- internal: per-row ordered descent (arithmetic selects: Mosaic
        # rejects selects on narrow (8,1) i1 masks) ---
        c1 = jnp.minimum(jnp.maximum(lft, 0), nodes.shape[0] - 1)
        c2 = jnp.minimum(c1 + 1, nodes.shape[0] - 1)
        row1 = _fetch(nodes, c1)
        row2 = _fetch(nodes, c2)
        t1, h1 = _box_test_rows(row1, 0, pox, poy, poz, idx, idy, idz, t_best)
        t2, h2 = _box_test_rows(row2, 0, pox, poy, poz, idx, idy, idz, t_best)
        h1a_i = _row_any_i(h1) * is_int_i
        h2a_i = _row_any_i(h2) * is_int_i
        m1 = jnp.min(jnp.where(h1, t1, BIG), axis=1, keepdims=True)
        m2 = jnp.min(jnp.where(h2, t2, BIG), axis=1, keepdims=True)
        of_i = (m1 <= m2).astype(jnp.int32)  # (8,1) i32
        near = of_i * c1 + (1 - of_i) * c2
        far = of_i * c2 + (1 - of_i) * c1
        near_hit_i = of_i * h1a_i + (1 - of_i) * h2a_i
        far_hit_i = of_i * h2a_i + (1 - of_i) * h1a_i

        push_far = ((iota_s == sp).astype(jnp.int32) * far_hit_i) > 0
        stack = jnp.where(push_far, jnp.broadcast_to(far, stack.shape), stack)
        sp = sp + far_hit_i
        push_near = ((iota_s == sp).astype(jnp.int32) * near_hit_i) > 0
        stack = jnp.where(push_near, jnp.broadcast_to(near, stack.shape), stack)
        sp = sp + near_hit_i
        return sp, stack, t_best, bface, bfront

    init = (
        sp0,
        stack0,
        t0,
        jnp.full(pox.shape, -1, jnp.int32),
        jnp.zeros(pox.shape, jnp.int32),
    )
    _, _, t_best, bface, bfront = jax.lax.while_loop(cond, body, init)
    t_out[...] = t_best
    face_out[...] = bface
    front_out[...] = bfront


def _anyhit_kernel(n_faces: int, bias: float,
                   root_ref, nodes, faces,
                   ox, oy, oz, dx, dy, dz, tmax,
                   occ_out):
    pox, poy, poz = ox[...], oy[...], oz[...]
    pdx, pdy, pdz = dx[...], dy[...], dz[...]
    tm = tmax[...]
    idx = 1.0 / jnp.where(pdx == 0.0, 1e-30, pdx)
    idy = 1.0 / jnp.where(pdy == 0.0, 1e-30, pdy)
    idz = 1.0 / jnp.where(pdz == 0.0, 1e-30, pdz)
    root = root_ref[0]

    root_row = _fetch(nodes, jnp.full((SUBL, 1), root, jnp.int32))
    _, root_hit = _box_test_rows(root_row, 0, pox, poy, poz, idx, idy, idz, tm)

    iota_s = jax.lax.broadcasted_iota(jnp.int32, (SUBL, STACK_DEPTH), 1)
    stack0 = jnp.where(iota_s == 0, root, 0)
    sp0 = _row_any_i(root_hit)

    def cond(c):
        sp, _, occ = c
        # A row retires when its stack empties OR all its lanes occluded.
        return jnp.max(sp * _row_any_i(occ < 1)) > 0

    def body(c):
        sp, stack, occ = c
        active_i = jnp.minimum(jnp.maximum(sp, 0), 1) * _row_any_i(occ < 1)
        node = jnp.sum(jnp.where(iota_s == (sp - 1), stack, 0), axis=1,
                       keepdims=True)
        node = node * active_i
        sp = sp - active_i

        nrow = _fetch(nodes, node)
        lft = nrow[:, 6:7].astype(jnp.int32)
        cnt = nrow[:, 7:8].astype(jnp.int32)
        is_leaf_i = active_i * (cnt > 0).astype(jnp.int32)
        is_int_i = active_i * (cnt == 0).astype(jnp.int32)

        for k in range(LEAF_SIZE):
            fidx = jnp.minimum(jnp.maximum(lft + k, 0), n_faces - 1)
            frow = _fetch(faces, fidx)
            t, _, ok = _tri_test_rows(frow, pox, poy, poz, pdx, pdy, pdz, 0)
            kmask_i = is_leaf_i * (k < cnt).astype(jnp.int32)
            leaf128 = jnp.broadcast_to(kmask_i, t.shape) > 0
            hit = ok & (t > bias) & (t < tm) & leaf128
            occ = jnp.maximum(occ, hit.astype(jnp.int32))

        c1 = jnp.minimum(jnp.maximum(lft, 0), nodes.shape[0] - 1)
        c2 = jnp.minimum(c1 + 1, nodes.shape[0] - 1)
        row1 = _fetch(nodes, c1)
        row2 = _fetch(nodes, c2)
        live = occ < 1
        _, h1 = _box_test_rows(row1, 0, pox, poy, poz, idx, idy, idz, tm)
        _, h2 = _box_test_rows(row2, 0, pox, poy, poz, idx, idy, idz, tm)
        h1a_i = _row_any_i(h1 & live) * is_int_i
        h2a_i = _row_any_i(h2 & live) * is_int_i

        push1 = ((iota_s == sp).astype(jnp.int32) * h1a_i) > 0
        stack = jnp.where(push1, jnp.broadcast_to(c1, stack.shape), stack)
        sp = sp + h1a_i
        push2 = ((iota_s == sp).astype(jnp.int32) * h2a_i) > 0
        stack = jnp.where(push2, jnp.broadcast_to(c2, stack.shape), stack)
        sp = sp + h2a_i
        return sp, stack, occ

    _, _, occ = jax.lax.while_loop(
        cond, body, (sp0, stack0, jnp.zeros(pox.shape, jnp.int32))
    )
    occ_out[...] = occ


def bvh_closest_subpacket(pack, root, o, d, hit_side: str, t_init=None,
                          reorder: bool = True):
    """Sub-packet closest hit; drop-in for pallas_bvh.bvh_closest_pallas."""
    if t_init is None:
        t_init = jnp.full((o.shape[0],), BIG)
    if reorder:
        order = _coherence_order(pack, root, o, d, t_init)
        inv = inverse_permutation(order)
        t, face, front = bvh_closest_subpacket(
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
    nodes = _pad_rows(pack.pallas_nodes)
    faces = _pad_rows(pack.pallas_faces)
    kernel = functools.partial(_closest_kernel, side,
                               int(pack.pallas_faces.shape[0]))
    ray_spec = pl.BlockSpec((SUBL, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    arr = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    t, face, front = pl.pallas_call(
        kernel,
        grid=(g // SUBL,),
        in_specs=[smem1, arr, arr] + [ray_spec] * 7,
        out_specs=(ray_spec, ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, LANES), jnp.int32),
            jax.ShapeDtypeStruct((g, LANES), jnp.int32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(
        jnp.asarray([root], jnp.int32),
        nodes, faces,
        *comps, ti,
    )
    return (
        t.reshape(-1)[:n],
        face.reshape(-1)[:n],
        front.reshape(-1)[:n].astype(bool),
    )


def bvh_anyhit_subpacket(pack, root, o, d, t_min: float, t_max,
                         reorder: bool = True):
    """Sub-packet any-hit; drop-in for pallas_bvh.bvh_anyhit_pallas."""
    if reorder:
        tm = jnp.broadcast_to(t_max, (o.shape[0],))
        order = _coherence_order(pack, root, o, d, tm)
        inv = inverse_permutation(order)
        occ = bvh_anyhit_subpacket(
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
    nodes = _pad_rows(pack.pallas_nodes)
    faces = _pad_rows(pack.pallas_faces)
    kernel = functools.partial(_anyhit_kernel,
                               int(pack.pallas_faces.shape[0]), t_min)
    ray_spec = pl.BlockSpec((SUBL, LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)
    arr = pl.BlockSpec(memory_space=pltpu.VMEM)
    smem1 = pl.BlockSpec(memory_space=pltpu.SMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(g // SUBL,),
        in_specs=[smem1, arr, arr] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((g, LANES), jnp.int32),
        interpret=jax.default_backend() != "tpu",
    )(
        jnp.asarray([root], jnp.int32),
        nodes, faces,
        *comps, tmax_p,
    )
    return occ.reshape(-1)[:n].astype(bool)
