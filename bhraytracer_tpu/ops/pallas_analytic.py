"""Shared in-kernel analytic (sphere/plane) fold for the Pallas trace
kernels.

Both the packet BVH kernel (ops/pallas_bvh.py) and the streaming kernel
(ops/pallas_stream.py) test the analytic instances inside the same kernel
as the mesh so a trace is one launch with no XLA combine. The formulas
mirror ops/pallas_trace's dedicated analytic kernels (Sphere.cpp:8-75,
Plane.cpp:8-77, ShadowRayRecursive GenLight.cpp:15-69) and the winner face
coding is shared: face = -(2 + inst*4 + kind*2 + front), kind 0=sphere
1=plane (decoded in ops/trace.trace_closest).

Everything here is shape-agnostic over the ray layout — (SUBL, LANES)
packet tiles and (1, RLANES) stream rows both work — and runs under
Mosaic or interpret mode.
"""

from __future__ import annotations

import jax.numpy as jnp

from bhraytracer_tpu.ops.linalg import BIG


def local_ray(ref, k, pox, poy, poz, pdx, pdy, pdz):
    """Instance-local ray via row k's [itm (9), pos (3)] (pallas_trace
    instance_table layout)."""
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


def analytic_closest(side, n_sph, n_pln, sph_ref, pln_ref,
                     pox, poy, poz, pdx, pdy, pdz, t0):
    """Closest analytic hit seeded by t0. Returns (t, face_code, front_i32)
    with face_code = -(2 + inst*4 + kind*2 + front) for winners, -1 else."""
    bt = t0
    bface = jnp.full(pox.shape, -1, jnp.int32)
    bfront = jnp.zeros(pox.shape, jnp.int32)
    for k in range(n_sph):
        lox, loy, loz, ldx, ldy, ldz = local_ray(
            sph_ref, k, pox, poy, poz, pdx, pdy, pdz)
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
        upd = t < bt
        bt = jnp.where(upd, t, bt)
        bface = jnp.where(upd, -(2 + k * 4 + front.astype(jnp.int32)), bface)
        bfront = jnp.where(upd, front.astype(jnp.int32), bfront)
    for k in range(n_pln):
        lox, loy, loz, ldx, ldy, ldz = local_ray(
            pln_ref, k, pox, poy, poz, pdx, pdy, pdz)
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
        upd = t < bt
        bt = jnp.where(upd, t, bt)
        bface = jnp.where(upd, -(2 + k * 4 + 2 + front.astype(jnp.int32)),
                          bface)
        bfront = jnp.where(upd, front.astype(jnp.int32), bfront)
    return bt, bface, bfront


def analytic_anyhit(n_sph, n_pln, sph_ref, pln_ref,
                    pox, poy, poz, pdx, pdy, pdz, tm,
                    ana_bias: float, plane_world_bug: bool):
    """Occlusion (int32 0/1) by the analytic instances within (ana_bias,
    tm) — ShadowRayRecursive semantics incl. the inside-the-sphere no-
    shadow rule and the optional plane frame mix-up quirk."""
    occ0 = jnp.zeros(tm.shape, jnp.int32)
    for k in range(n_sph):
        lox, loy, loz, ldx, ldy, ldz = local_ray(
            sph_ref, k, pox, poy, poz, pdx, pdy, pdz)
        a = ldx * ldx + ldy * ldy + ldz * ldz
        b = 2.0 * (ldx * lox + ldy * loy + ldz * loz)
        c = lox * lox + loy * loy + loz * loz - 1.0
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        tmin = (-b - sq) / jnp.maximum(2.0 * a, 1e-30)
        hit = (disc > 0.0) & (tmin > ana_bias) & (tmin < tm)
        occ0 = jnp.maximum(occ0, hit.astype(jnp.int32))
    for k in range(n_pln):
        lox, loy, loz, ldx, ldy, ldz = local_ray(
            pln_ref, k, pox, poy, poz, pdx, pdy, pdz)
        t = -loz / jnp.where(ldz == 0.0, 1e-30, ldz)
        if plane_world_bug:
            x = pox + t * pdx
            y = poy + t * pdy
        else:
            x = lox + t * ldx
            y = loy + t * ldy
        in_ext = (jnp.abs(x) <= 1.0) & (jnp.abs(y) <= 1.0)
        hit = (ldz != 0.0) & (t >= 0.0) & in_ext & (t > ana_bias) & (t < tm)
        occ0 = jnp.maximum(occ0, hit.astype(jnp.int32))
    return occ0
