"""Pallas TPU kernels for the analytic-instance trace (hot path).

The XLA path in ops/trace.py builds dozens of small VPU kernels per trace
(per-instance transforms, quadratics, argmin). These fused kernels process
rays in (8, 128)-tiled component-planar form and unroll the (small) instance
loop in-register, cutting the closest-hit and shadow queries to one kernel
launch each.

Replaces (faster, same results): the sphere/plane part of `recursive`
(Main.cpp:389-413) and ShadowRayRecursive (GenLight.cpp:15-69). Triangle
meshes keep the XLA while_loop traversal (a Pallas BVH kernel is the
follow-on) — scenes with meshes combine both results in ops/trace.py.

Kernels are used on TPU; tests exercise them in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bhraytracer_tpu.ops.linalg import BIG

LANES = 128
SUBL = 8
BLOCK = SUBL * LANES  # rays per grid step


def _pad_rays(o, d):
    """(N,3) world rays -> padded (G, 128) component planes + n_pad."""
    n = o.shape[0]
    g = -(-n // BLOCK) * SUBL  # sublane rows after padding
    pad = g * LANES - n

    def prep(x):
        x = jnp.concatenate([x, jnp.zeros((pad,), x.dtype)]) if pad else x
        return x.reshape(g, LANES)

    comps = [prep(o[:, k]) for k in range(3)] + [prep(d[:, k]) for k in range(3)]
    return comps, n, pad


def _side_const(hit_side: str) -> int:
    return {"front": 0, "back": 1, "both": 2}[hit_side]


def _closest_kernel(side: int, n_sph: int, n_pln: int,
                    sph_ref, pln_ref,
                    ox, oy, oz, dx, dy, dz,
                    t_out, code_out):
    """Fused closest-hit over analytic instances for one (8,128) ray tile.

    sph_ref/pln_ref: (K, 12) rows = [itm (9), pos (3)] in VMEM.
    code_out packs kind/inst/front: code = inst * 4 + kind * 2 + front.
    kind: 0 = sphere, 1 = plane (matches ops.trace KIND_*).
    """
    t_best = jnp.full(ox.shape, BIG, jnp.float32)
    code = jnp.zeros(ox.shape, jnp.int32)

    pox, poy, poz = ox[...], oy[...], oz[...]
    pdx, pdy, pdz = dx[...], dy[...], dz[...]

    def local_ray(ref, k):
        m = [ref[k, j] for j in range(9)]
        px = ref[k, 9]
        py = ref[k, 10]
        pz = ref[k, 11]
        sx, sy, sz = pox - px, poy - py, poz - pz
        lox = m[0] * sx + m[1] * sy + m[2] * sz
        loy = m[3] * sx + m[4] * sy + m[5] * sz
        loz = m[6] * sx + m[7] * sy + m[8] * sz
        ldx = m[0] * pdx + m[1] * pdy + m[2] * pdz
        ldy = m[3] * pdx + m[4] * pdy + m[5] * pdz
        ldz = m[6] * pdx + m[7] * pdy + m[8] * pdz
        return lox, loy, loz, ldx, ldy, ldz

    for k in range(n_sph):
        lox, loy, loz, ldx, ldy, ldz = local_ray(sph_ref, k)
        a = ldx * ldx + ldy * ldy + ldz * ldz
        b = 2.0 * (ldx * lox + ldy * loy + ldz * loz)
        c = lox * lox + loy * loy + loz * loz - 1.0
        disc = b * b - 4.0 * a * c
        ok = disc > 0.0
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        inv2a = 1.0 / jnp.maximum(2.0 * a, 1e-30)
        t1 = (-b + sq) * inv2a
        t2 = (-b - sq) * inv2a
        both_pos = t2 > 0.0
        inside = t1 * t2 <= 0.0
        if side == 0:  # front
            t = jnp.where(both_pos, t2, BIG)
            front = jnp.ones_like(ok)
        elif side == 1:  # back
            t = jnp.where(both_pos, t1, jnp.where(inside, t1, BIG))
            front = jnp.zeros_like(ok)
        else:  # both
            t = jnp.where(both_pos, t2, jnp.where(inside, t1, BIG))
            front = both_pos
        t = jnp.where(ok & (t > 0.0), t, BIG)
        upd = t < t_best
        t_best = jnp.where(upd, t, t_best)
        code = jnp.where(upd, k * 4 + 0 + front.astype(jnp.int32), code)

    for k in range(n_pln):
        lox, loy, loz, ldx, ldy, ldz = local_ray(pln_ref, k)
        t = -loz / jnp.where(ldz == 0.0, 1e-30, ldz)
        x = lox + t * ldx
        y = loy + t * ldy
        in_ext = (jnp.abs(x) <= 1.0) & (jnp.abs(y) <= 1.0)
        front = ldz < 0.0
        ok = (ldz != 0.0) & (t > 0.0) & in_ext
        if side == 0:
            ok &= front
        elif side == 1:
            ok &= ~front
        t = jnp.where(ok, t, BIG)
        upd = t < t_best
        t_best = jnp.where(upd, t, t_best)
        code = jnp.where(upd, k * 4 + 2 + front.astype(jnp.int32), code)

    t_out[...] = t_best
    code_out[...] = code


def analytic_closest_pallas(sph_tab, pln_tab, o, d, hit_side: str):
    """Fused closest hit over analytic instances.

    sph_tab/pln_tab: (K, 12) [itm.flat, pos] tables (K >= 1, padded).
    Returns (t, kind, inst, front) with t = BIG on miss.
    """
    comps, n, pad = _pad_rays(o, d)
    g = comps[0].shape[0]
    n_sph = int(sph_tab.shape[0]) if sph_tab is not None else 0
    n_pln = int(pln_tab.shape[0]) if pln_tab is not None else 0
    sph_tab = sph_tab if n_sph else jnp.zeros((1, 12), jnp.float32)
    pln_tab = pln_tab if n_pln else jnp.zeros((1, 12), jnp.float32)

    kernel = functools.partial(
        _closest_kernel, _side_const(hit_side), n_sph, n_pln
    )
    grid = (g // SUBL,)
    ray_spec = pl.BlockSpec((SUBL, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    t, code = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[tab_spec, tab_spec] + [ray_spec] * 6,
        out_specs=(ray_spec, ray_spec),
        out_shape=(
            jax.ShapeDtypeStruct((g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((g, LANES), jnp.int32),
        ),
        interpret=_interpret(),
    )(sph_tab, pln_tab, *comps)
    t = t.reshape(-1)[:n]
    code = code.reshape(-1)[:n]
    inst = code >> 2
    kind = (code >> 1) & 1
    front = (code & 1).astype(bool)
    return t, kind, inst, front


def _shadow_kernel(n_sph: int, n_pln: int, plane_world_bug: bool,
                   sph_ref, pln_ref, limits_ref,
                   ox, oy, oz, dx, dy, dz, tmax,
                   occ_out):
    """Fused any-hit shadow over analytic instances (ShadowRayRecursive
    semantics, GenLight.cpp:15-69). limits_ref: (1,1) shadow bias in SMEM."""
    bias = limits_ref[0, 0]
    occ = jnp.zeros(ox.shape, bool)
    pox, poy, poz = ox[...], oy[...], oz[...]
    pdx, pdy, pdz = dx[...], dy[...], dz[...]
    tm = tmax[...]

    def local_ray(ref, k):
        m = [ref[k, j] for j in range(9)]
        sx, sy, sz = pox - ref[k, 9], poy - ref[k, 10], poz - ref[k, 11]
        return (
            m[0] * sx + m[1] * sy + m[2] * sz,
            m[3] * sx + m[4] * sy + m[5] * sz,
            m[6] * sx + m[7] * sy + m[8] * sz,
            m[0] * pdx + m[1] * pdy + m[2] * pdz,
            m[3] * pdx + m[4] * pdy + m[5] * pdz,
            m[6] * pdx + m[7] * pdy + m[8] * pdz,
        )

    for k in range(n_sph):
        lox, loy, loz, ldx, ldy, ldz = local_ray(sph_ref, k)
        a = ldx * ldx + ldy * ldy + ldz * ldz
        b = 2.0 * (ldx * lox + ldy * loy + ldz * loz)
        c = lox * lox + loy * loy + loz * loz - 1.0
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        tmin = (-b - sq) / jnp.maximum(2.0 * a, 1e-30)
        occ |= (disc > 0.0) & (tmin > bias) & (tmin < tm)

    for k in range(n_pln):
        lox, loy, loz, ldx, ldy, ldz = local_ray(pln_ref, k)
        t = -loz / jnp.where(ldz == 0.0, 1e-30, ldz)
        if plane_world_bug:
            x = pox + t * pdx
            y = poy + t * pdy
        else:
            x = lox + t * ldx
            y = loy + t * ldy
        in_ext = (jnp.abs(x) <= 1.0) & (jnp.abs(y) <= 1.0)
        occ |= (ldz != 0.0) & (t >= 0.0) & in_ext & (t > bias) & (t < tm)

    occ_out[...] = occ.astype(jnp.int32)


def analytic_shadow_pallas(sph_tab, pln_tab, o, d, t_max, shadow_bias: float,
                           plane_world_bug: bool = False):
    """Fused boolean occlusion over analytic instances."""
    comps, n, pad = _pad_rays(o, d)
    g = comps[0].shape[0]
    tmax_full = jnp.broadcast_to(t_max, (n,)).astype(jnp.float32)
    tmax_p = (
        jnp.concatenate([tmax_full, jnp.zeros((g * LANES - n,), jnp.float32)])
        if g * LANES - n
        else tmax_full
    ).reshape(g, LANES)

    n_sph = int(sph_tab.shape[0]) if sph_tab is not None else 0
    n_pln = int(pln_tab.shape[0]) if pln_tab is not None else 0
    sph_tab = sph_tab if n_sph else jnp.zeros((1, 12), jnp.float32)
    pln_tab = pln_tab if n_pln else jnp.zeros((1, 12), jnp.float32)

    kernel = functools.partial(
        _shadow_kernel, n_sph, n_pln, plane_world_bug
    )
    ray_spec = pl.BlockSpec((SUBL, LANES), lambda i: (i, 0), memory_space=pltpu.VMEM)
    tab_spec = pl.BlockSpec(memory_space=pltpu.VMEM)
    lim_spec = pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)
    occ = pl.pallas_call(
        kernel,
        grid=(g // SUBL,),
        in_specs=[tab_spec, tab_spec, lim_spec] + [ray_spec] * 7,
        out_specs=ray_spec,
        out_shape=jax.ShapeDtypeStruct((g, LANES), jnp.int32),
        interpret=_interpret(),
    )(sph_tab, pln_tab, jnp.full((1, 1), shadow_bias, jnp.float32), *comps, tmax_p)
    return occ.reshape(-1)[:n].astype(bool)


def _interpret() -> bool:
    """Pallas TPU kernels compile only on TPU; elsewhere run interpreted
    (tests) — production CPU paths use the jnp implementation instead."""
    return jax.default_backend() != "tpu"


def instance_table(itm, pos) -> jnp.ndarray:
    """(K,3,3) + (K,3) -> (K,12) [itm.flat, pos] kernel table."""
    k = itm.shape[0]
    return jnp.concatenate([itm.reshape(k, 9), pos], axis=1).astype(jnp.float32)
