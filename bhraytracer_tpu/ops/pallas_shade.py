"""Fused shade-setup Pallas kernel: resolve + Fresnel + light sampling +
BRDF + GI lobe for one (8,128) lane tile in a single VMEM-resident pass.

The XLA shading core runs the same math as dozens of separate fusions, each
paying an HBM round trip for every (N,3) intermediate — the measured bound
on analytic-only scenes (CLAUDE.md ledger: ~15M segs/s with traversal nearly
free). This kernel reads the ray/hit planes once, keeps every intermediate
in registers/VMEM, and writes only what the rest of the level needs:

  in : rays, hit ids, pre-gathered mesh resolve rows, the level's 13
       uniform columns; tiny instance/material/light row tables (VMEM).
  out: surface (p, n, z, mtl), the shadow query (o, d, t_max, gate), the
       direct-light pieces that don't depend on occlusion (cos_theta,
       no-vis irradiance, BRDF*cos), the GI child (origin, dir, albedo),
       and the refraction-chain inputs (refr_eff, cos_phi1).

The shadow trace itself stays outside (ops/pallas_bvh + pallas_trace
kernels); the XLA finisher applies visibility and the clamp/NaN semantics.

Semantics mirrored 1:1 (same guards, same sampler formulas):
  resolve_hit (ops/trace.py), _fetch_mtl/_select_light/_sample_in_light/
  _illuminate(pre-trace half)/_direct_light(BRDF)/_gi_sample
  (models/pathtracer.py) — which in turn pin MtlBlinn.cpp:89-138, 304-433,
  591-716, Sphere.cpp:8-75, Plane.cpp:8-77, TriObj.cpp:105-178.

Used when the scene has no texture maps and no photon map (the headline
and analytic benchmark scenes); tests run it in interpreter mode against
the XLA path. Not differentiable (discrete table selects) — the AD path
keeps the XLA implementation.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bhraytracer_tpu.ops.linalg import BIG

LANES = 128
SUBL = 8
BLOCK = SUBL * LANES
TWO_PI = 2.0 * 3.14159265358979323846

# Table-size gates: each instance/material/light row is fetched by an
# unrolled where-chain; beyond these the chain cost outgrows the fusion win
# and the XLA path is used instead.
MAX_INST = 32
MAX_MTL = 32
MAX_LIGHTS = 8

_MISS_O = (1.0e8, 1.0e8, 1.0e8)
_MISS_D = (0.0, 0.0, 1.0)


class ShadeSetup(NamedTuple):
    """Per-lane (N,·) outputs of the fused kernel (see module doc)."""
    p: jnp.ndarray  # (N,3)
    n: jnp.ndarray  # (N,3)
    z: jnp.ndarray  # (N,)
    mtl: jnp.ndarray  # (N,) i32
    shadow_o: jnp.ndarray  # (N,3)
    shadow_d: jnp.ndarray  # (N,3)
    shadow_tmax: jnp.ndarray  # (N,)
    gate: jnp.ndarray  # (N,) bool — lanes whose visibility can zero direct
    rr0: jnp.ndarray  # (N,) bool — point light at zero distance (BIG branch)
    cos_theta: jnp.ndarray  # (N,)
    irr: jnp.ndarray  # (N,3) irradiance WITHOUT the visibility factor
    brdf_cos: jnp.ndarray  # (N,3) diffuse*cos + spec*pow(hn, gloss)
    gi_o: jnp.ndarray  # (N,3)
    gi_d: jnp.ndarray  # (N,3)
    gi_albedo: jnp.ndarray  # (N,3)
    refr_eff: jnp.ndarray  # (N,3)
    cos_phi1: jnp.ndarray  # (N,)


# ---------------------------------------------------------------------------
# component-triple vector helpers (mirror ops/linalg exactly)
# ---------------------------------------------------------------------------


def _dot3(a, b):
    return a[0] * b[0] + a[1] * b[1] + a[2] * b[2]


def _cross3(a, b):
    return (a[1] * b[2] - a[2] * b[1],
            a[2] * b[0] - a[0] * b[2],
            a[0] * b[1] - a[1] * b[0])


def _add3(a, b):
    return (a[0] + b[0], a[1] + b[1], a[2] + b[2])


def _sub3(a, b):
    return (a[0] - b[0], a[1] - b[1], a[2] - b[2])


def _scale3(a, s):
    return (a[0] * s, a[1] * s, a[2] * s)


def _neg3(a):
    return (-a[0], -a[1], -a[2])


def _where3(c, a, b):
    return (jnp.where(c, a[0], b[0]), jnp.where(c, a[1], b[1]),
            jnp.where(c, a[2], b[2]))


def _norm3(a):
    # linalg.norm: safe_sqrt(dot) with the 1e-24 floor.
    return jnp.sqrt(jnp.maximum(_dot3(a, a), 1e-24))


def _normalize3(a):
    n = jnp.maximum(_norm3(a), 1e-30)
    return (a[0] / n, a[1] / n, a[2] / n)


def _safe_pow(x, p):
    x_safe = jnp.where(x > 0.0, x, 1.0)
    return jnp.where(x > 0.0, jnp.power(x_safe, p), 0.0)


def _safe_div(a, b):
    eps = 1e-30
    return a / jnp.where(jnp.abs(b) < eps, jnp.where(b < 0, -eps, eps), b)


def _crossing_vector(v):
    """GetRandomCrossingVector (MtlBlinn.cpp:591-600): z unless v ~ ±z."""
    cz = (v[1], -v[0], jnp.zeros_like(v[0]))  # cross(v, z)
    degen = _dot3(cz, cz) < 1e-12
    zero = jnp.zeros_like(v[0])
    one = jnp.ones_like(v[0])
    return (jnp.where(degen, one, zero), zero, jnp.where(degen, zero, one))


def _frame_axes(n):
    a1 = _normalize3(_cross3(_crossing_vector(n), n))
    a2 = _normalize3(_cross3(a1, n))
    return a1, a2


def _sample_along_normal(n, radius, u1, u2):
    r = jnp.sqrt(u1) * radius
    th = u2 * TWO_PI
    a1, a2 = _frame_axes(n)
    return _add3(n, _add3(_scale3(a1, r * jnp.cos(th)),
                          _scale3(a2, r * jnp.sin(th))))


def _sample_along_light_direction(n, gloss, u1, u2):
    """MtlBlinn.cpp:619-635 with the polar angle kept ALGEBRAIC: the XLA
    path computes theta = acos(c), r = tan(theta), cos(theta); here
    c = cos(theta) directly, r = sqrt(1-c^2)/c — mathematically identical
    (theta in [0, pi/2] so all signs are positive) and avoids acos/tan,
    which Mosaic may not lower. Returns (dir, cos_theta)."""
    c = jnp.power(jnp.maximum(u1, 1e-12), 1.0 / (gloss + 1.0))
    c = jnp.minimum(c, 1.0)
    r = jnp.sqrt(jnp.maximum(1.0 - c * c, 0.0)) / c  # c >= 1e-12^(1/(g+1)) > 0
    phi = u2 * TWO_PI
    a1, a2 = _frame_axes(n)
    d = _add3(n, _add3(_scale3(a1, r * jnp.cos(phi)),
                       _scale3(a2, r * jnp.sin(phi))))
    return d, c


def _sample_in_semisphere(n, u1, u2):
    """MtlBlinn.cpp:697-716, algebraic half-angle form: theta =
    0.5*acos(x) with x = 1-2u -> cos(theta) = sqrt((1+x)/2), sin(theta) =
    sqrt((1-x)/2), sin(2*theta) = sqrt(1-x^2); theta in [0, pi/2] so every
    branch is the positive root. Returns (dir, sin_2theta)."""
    a_y = _normalize3(_cross3(n, _crossing_vector(n)))
    a_x = _cross3(n, a_y)  # unnormalized, reference parity
    phi = u1 * TWO_PI
    x = jnp.clip(1.0 - 2.0 * u2, -1.0, 1.0)
    ct = jnp.sqrt(jnp.maximum((1.0 + x) * 0.5, 0.0))
    st = jnp.sqrt(jnp.maximum((1.0 - x) * 0.5, 0.0))
    sin2t = jnp.sqrt(jnp.maximum(1.0 - x * x, 0.0))
    d = _add3(_add3(_scale3(a_x, st * jnp.cos(phi)),
                    _scale3(a_y, st * jnp.sin(phi))),
              _scale3(n, ct))
    return d, sin2t


def _fetch_row(ref, idx, cols, n_rows):
    """Unrolled where-chain row fetch: list of tiles for `cols` of row idx."""
    out = [jnp.full(idx.shape, ref[0, c]) for c in cols]
    for r in range(1, n_rows):
        m = idx == r
        out = [jnp.where(m, ref[r, c], o) for c, o in zip(cols, out)]
    return out


# ---------------------------------------------------------------------------
# the kernel
# ---------------------------------------------------------------------------


def _shade_kernel(n_sph: int, n_pln: int, n_msh: int, n_mtl: int,
                  n_lights: int, bias: float, has_rows: bool,
                  inst_ref, mtl_ref, light_ref,
                  rays_ref, hit_ref, u_ref, rows_ref,
                  surf_ref, shadow_ref, direct_ref, gi_ref, chain_ref):
    rays = rays_ref[...]
    o = (rays[0], rays[1], rays[2])
    d = (rays[3], rays[4], rays[5])
    hitp = hit_ref[...]
    kind = hitp[0]  # f32-coded small ints
    inst = hitp[1]
    front = hitp[2] > 0.0
    shade = hitp[3] > 0.0
    u = u_ref[...]

    n_inst = max(1, n_sph + n_pln + n_msh)
    # Flat instance id across [spheres | planes | meshes].
    flat = inst + jnp.where(kind == 0.0, 0.0,
                            jnp.where(kind == 1.0, float(n_sph),
                                      float(n_sph + n_pln)))
    flat = jnp.clip(flat, 0.0, float(n_inst - 1))
    irow = _fetch_row(inst_ref, flat, list(range(22)), n_inst)
    itm = irow[0:9]
    tm = irow[9:18]
    pos = (irow[18], irow[19], irow[20])
    imtl = irow[21]

    # Local-frame ray (ToNodeCoords; scene.h:490-496 folded at compile).
    s = _sub3(o, pos)
    ol = (itm[0] * s[0] + itm[1] * s[1] + itm[2] * s[2],
          itm[3] * s[0] + itm[4] * s[1] + itm[5] * s[2],
          itm[6] * s[0] + itm[7] * s[1] + itm[8] * s[2])
    dl = (itm[0] * d[0] + itm[1] * d[1] + itm[2] * d[2],
          itm[3] * d[0] + itm[4] * d[1] + itm[5] * d[2],
          itm[6] * d[0] + itm[7] * d[1] + itm[8] * d[2])

    zero = jnp.zeros_like(kind)
    t_l, p_l, n_l = zero, (zero, zero, zero), (zero, zero, zero + 1.0)
    mtl_id = imtl

    if n_sph:
        # Sphere.cpp:8-75 via resolve_hit's differy-free recompute.
        a = _dot3(dl, dl)
        b = 2.0 * _dot3(dl, ol)
        c = _dot3(ol, ol) - 1.0
        sq = jnp.sqrt(jnp.maximum(b * b - 4.0 * a * c, 1e-24))
        inv2a = 1.0 / jnp.maximum(2.0 * a, 1e-30)
        t_s = jnp.where(front, (-b - sq) * inv2a, (-b + sq) * inv2a)
        p_s = _add3(ol, _scale3(dl, t_s))
        is_s = kind == 0.0
        t_l = jnp.where(is_s, t_s, t_l)
        p_l = _where3(is_s, p_s, p_l)
        n_l = _where3(is_s, p_s, n_l)  # N = local hit point (Sphere.cpp:57)

    if n_pln:
        para = jnp.abs(dl[2]) < 1e-12
        t_p = jnp.where(para, 0.0, -ol[2]) / jnp.where(para, 1.0, dl[2])
        p_p = _add3(ol, _scale3(dl, t_p))
        is_p = kind == 1.0
        t_l = jnp.where(is_p, t_p, t_l)
        p_l = _where3(is_p, p_p, p_l)
        n_l = _where3(is_p, (zero, zero, zero + 1.0), n_l)

    if n_msh and has_rows:
        rows = rows_ref[...]
        v0 = (rows[0], rows[1], rows[2])
        v1 = (rows[3], rows[4], rows[5])
        v2 = (rows[6], rows[7], rows[8])
        vn = _cross3(_sub3(v1, v0), _sub3(v2, v0))
        tdiv = _dot3(vn, dl)
        graze = jnp.abs(tdiv) < 1e-12
        t_m = (jnp.where(graze, 0.0, _dot3(vn, v0) - _dot3(vn, ol))
               / jnp.where(graze, 1.0, tdiv))
        p_m = _add3(ol, _scale3(dl, t_m))
        # triangle_areas (TriObj.cpp:105-168): dominant-axis projection.
        avx, avy, avz = jnp.abs(vn[0]), jnp.abs(vn[1]), jnp.abs(vn[2])
        use_x = (avx >= avy) & (avx >= avz)
        use_y = ~use_x & (avy >= avx) & (avy >= avz)

        def proj(p):
            c0 = jnp.where(use_x, p[1], p[0])
            c1 = jnp.where(use_x, p[2], jnp.where(use_y, p[2], p[1]))
            return c0, c1

        p0x, p0y = proj(v0)
        p1x, p1y = proj(v1)
        p2x, p2y = proj(v2)
        pxx, pxy = proj(p_m)

        def cr2(ax, ay, bx, by):
            return ax * by - ay * bx

        a0 = cr2(p1x - pxx, p1y - pxy, p2x - pxx, p2y - pxy) * 0.5
        a1_ = cr2(p2x - pxx, p2y - pxy, p0x - pxx, p0y - pxy) * 0.5
        a2_ = cr2(p0x - pxx, p0y - pxy, p1x - pxx, p1y - pxy) * 0.5
        asum = a0 + a1_ + a2_
        inv_asum = 1.0 / jnp.where(jnp.abs(asum) < 1e-30, 1e-30, asum)
        b0, b1, b2 = a0 * inv_asum, a1_ * inv_asum, a2_ * inv_asum
        vn0 = (rows[9], rows[10], rows[11])
        vn1 = (rows[12], rows[13], rows[14])
        vn2 = (rows[15], rows[16], rows[17])
        n_m = _add3(_add3(_scale3(vn0, b0), _scale3(vn1, b1)),
                    _scale3(vn2, b2))
        is_m = kind == 2.0
        t_l = jnp.where(is_m, t_m, t_l)
        p_l = _where3(is_m, p_m, p_l)
        n_l = _where3(is_m, n_m, n_l)
        mtl_id = jnp.where(is_m, jnp.where(imtl >= 0.0, imtl, rows[18]),
                           mtl_id)

    # FromNodeCoords (scene.h:497-501): p -> tm p + pos, N -> itm^T N.
    p_w = (tm[0] * p_l[0] + tm[1] * p_l[1] + tm[2] * p_l[2] + pos[0],
           tm[3] * p_l[0] + tm[4] * p_l[1] + tm[5] * p_l[2] + pos[1],
           tm[6] * p_l[0] + tm[7] * p_l[1] + tm[8] * p_l[2] + pos[2])
    n_w = _normalize3((itm[0] * n_l[0] + itm[3] * n_l[1] + itm[6] * n_l[2],
                       itm[1] * n_l[0] + itm[4] * n_l[1] + itm[7] * n_l[2],
                       itm[2] * n_l[0] + itm[5] * n_l[1] + itm[8] * n_l[2]))
    z = t_l

    # ---- material row + Schlick Fresnel fold (MtlBlinn.cpp:107-114) ----
    midx = jnp.clip(mtl_id, 0.0, float(n_mtl - 1))
    mrow = _fetch_row(mtl_ref, midx, list(range(11)), n_mtl)
    diffuse = (mrow[0], mrow[1], mrow[2])
    specular = (mrow[3], mrow[4], mrow[5])
    gloss = mrow[6]
    refraction = (mrow[7], mrow[8], mrow[9])
    ior = mrow[10]

    vv = _normalize3(_sub3(o, p_w))
    cos_phi1 = jnp.clip(_dot3(n_w, vv), 0.0, 1.0)
    r0b = (1.0 - ior) / (1.0 + ior)
    r0 = r0b * r0b
    fres = r0 + (1.0 - r0) * _safe_pow(1.0 - cos_phi1, 5.0)
    new_spec = tuple(jnp.minimum(specular[k] + fres * refraction[k], 1.0)
                     for k in range(3))
    refr_eff = tuple((1.0 - fres) * refraction[k] for k in range(3))

    # ---- one-light selection (MtlBlinn.cpp:309-315, no pmf compensation) --
    u7 = u[7]
    lsel = jnp.full(kind.shape, float(n_lights - 1))
    # f32 carry, not bool: a bool VECTOR CONSTANT lowers through an i8
    # splat + trunci that Mosaic rejects ("Unsupported target bitwidth
    # for truncation").
    found = jnp.zeros(kind.shape, jnp.float32)
    for k in range(n_lights):
        ok = u7 <= light_ref[k, 8]
        take = ok & (found == 0.0)
        lsel = jnp.where(take, float(k), lsel)
        found = jnp.where(ok, 1.0, found)
    lrow = _fetch_row(light_ref, lsel, list(range(8)), n_lights)
    lkind = lrow[0]
    intensity = (lrow[1], lrow[2], lrow[3])
    lvec = (lrow[4], lrow[5], lrow[6])
    lsize = lrow[7]
    is_point = lkind == 2.0
    is_direct = lkind == 1.0

    # ---- GetSampleInLight (MtlBlinn.cpp:637-695) ----
    kd = jnp.maximum(diffuse[0], jnp.maximum(diffuse[1], diffuse[2]))
    ks = jnp.maximum(new_spec[0], jnp.maximum(new_spec[1], new_spec[2]))
    vl_c = _sub3(lvec, p_w)
    d_vl, d_cos = _sample_along_light_direction(
        _normalize3(vl_c), gloss, u[0], u[1])
    p_diffuse = _safe_pow(d_cos, gloss)
    big_r = jnp.sqrt(u[2]) * lsize
    th = u[3] * TWO_PI
    a1 = _normalize3(_cross3(_crossing_vector(vl_c), vl_c))
    a2 = _normalize3(_cross3(a1, vl_c))
    s_vl = _add3(vl_c, _add3(_scale3(a1, big_r * jnp.cos(th)),
                             _scale3(a2, big_r * jnp.sin(th))))
    p_specular = 2.0 * u[2] / jnp.maximum(big_r * big_r, 1e-30)
    pd = kd * p_diffuse
    ps = ks * p_specular
    pd_norm = _safe_div(pd, pd + ps)
    use_spec = u[4] >= pd_norm
    # Boolean algebra, NOT jnp.where(c, True/False, x): a bool VECTOR
    # CONSTANT lowers through an i8 splat + arith.trunci(i8->i1) that
    # Mosaic rejects ("Unsupported target bitwidth for truncation") — the
    # exact failure VERDICT r2 reproduced on hardware.
    only_diffuse = (ks == 0.0) & (kd != 0.0)
    only_spec = (ks != 0.0) & (kd == 0.0)
    use_spec = (use_spec & ~only_diffuse) | only_spec
    vl_point = _where3(use_spec, _normalize3(s_vl), _normalize3(d_vl))
    nlvec = _normalize3(lvec)
    vl_other = _where3(is_direct, _neg3(nlvec), (zero, zero, zero))
    vl = _where3(is_point, vl_point, vl_other)
    cos_theta = _dot3(vl, n_w)

    # ---- Illuminate, pre-visibility half (PointLight.cpp:7-18) ----
    center = _sub3(lvec, p_w)
    rr = _dot3(center, center)
    sdir = _sample_along_normal(center, lsize, u[5], u[6])
    sdir = _where3(lsize > 0.0, sdir, center)
    sh_d = _where3(is_point, sdir, _neg3(lvec))
    cand = shade & (cos_theta > 0.0) & (is_point | is_direct)
    sh_o = _where3(cand, p_w, _MISS_O)
    sh_d = _where3(cand, sh_d, _MISS_D)
    tmax = jnp.where(cand, jnp.where(is_point, 1.0, BIG), 0.0)
    rr0 = is_point & (rr == 0.0)
    inv_rr = 1.0 / jnp.maximum(rr, 1e-30)
    irr = tuple(
        jnp.where(is_point, jnp.where(rr0, BIG, intensity[k] * inv_rr),
                  intensity[k])
        for k in range(3))

    # ---- BRDF * cos (MtlBlinn.cpp:317-327) ----
    vh = _normalize3(_add3(vl, vv))
    hn = jnp.maximum(_dot3(vh, n_w), 0.0)
    spec_pow = _safe_pow(hn, gloss)
    brdf_cos = tuple(diffuse[k] * cos_theta + new_spec[k] * spec_pow
                     for k in range(3))

    # ---- GI lobe (MtlBlinn.cpp:354-433) ----
    d_dir, p_dt = _sample_in_semisphere(n_w, u[8], u[9])
    d_dir = _normalize3(d_dir)
    vr = _sub3(_scale3(n_w, 2.0 * _dot3(n_w, vv)), vv)
    s_dir, gi_scos = _sample_along_light_direction(vr, gloss, u[10], u[11])
    p_st = _safe_pow(gi_scos, gloss)
    gi_pd = _safe_div(kd * p_dt, kd * p_dt + ks * p_st)
    gi_spec = u[12] >= gi_pd
    gi_d = _where3(gi_spec, s_dir, d_dir)
    gi_o = _add3(p_w, _scale3(n_w, bias))
    albedo = _where3(gi_spec, new_spec, diffuse)

    # bool->f32 via select on f32 constants (astype(bool->f32) can lower
    # through the same i8/i1 bit-width path Mosaic rejects).
    f32 = lambda m: jnp.where(m, 1.0, 0.0)  # noqa: E731
    surf_ref[...] = jnp.stack(
        [p_w[0], p_w[1], p_w[2], n_w[0], n_w[1], n_w[2], z, mtl_id])
    shadow_ref[...] = jnp.stack(
        [sh_o[0], sh_o[1], sh_o[2], sh_d[0], sh_d[1], sh_d[2], tmax,
         f32(cand), f32(rr0)])
    direct_ref[...] = jnp.stack(
        [cos_theta, irr[0], irr[1], irr[2],
         brdf_cos[0], brdf_cos[1], brdf_cos[2]])
    gi_ref[...] = jnp.stack(
        [gi_o[0], gi_o[1], gi_o[2], gi_d[0], gi_d[1], gi_d[2],
         albedo[0], albedo[1], albedo[2]])
    chain_ref[...] = jnp.stack(
        [refr_eff[0], refr_eff[1], refr_eff[2], cos_phi1])


# ---------------------------------------------------------------------------
# wrapper
# ---------------------------------------------------------------------------


def shade_tables(pack):
    """Build the kernel's tiny row tables from a ScenePack.

    inst rows (I,22): [itm (9), tm (9), pos (3), mtl (1)] over
    [spheres | planes | meshes]; mtl rows (M,11): [diffuse, specular,
    gloss, refraction, ior]; light rows (L,9): [kind, intensity, vec,
    size, selection prob]."""
    f32 = jnp.float32
    parts = []
    for itm, tm, pos, mtl, nk in (
        (pack.sph_itm, pack.sph_tm, pack.sph_pos, pack.sph_mtl, pack.n_sph),
        (pack.pln_itm, pack.pln_tm, pack.pln_pos, pack.pln_mtl, pack.n_pln),
        (pack.msh_itm, pack.msh_tm, pack.msh_pos, pack.msh_mtl, pack.n_msh),
    ):
        if nk:
            parts.append(jnp.concatenate(
                [itm.reshape(-1, 9), tm.reshape(-1, 9), pos,
                 mtl[:, None].astype(f32)], axis=1))
    inst = (jnp.concatenate(parts).astype(f32) if parts
            else jnp.zeros((1, 22), f32))

    mtl_rows = jnp.concatenate(
        [pack.mtl_diffuse, pack.mtl_specular, pack.mtl_gloss[:, None],
         pack.mtl_refraction, pack.mtl_ior[:, None]], axis=1).astype(f32)

    gray = jnp.sum(pack.light_intensity, axis=1) / 3.0
    probs = gray / jnp.maximum(jnp.sum(gray), 1e-30)
    light_rows = jnp.concatenate(
        [pack.light_kind[:, None].astype(f32), pack.light_intensity,
         pack.light_vec, pack.light_size[:, None], probs[:, None]],
        axis=1).astype(f32)
    return inst, mtl_rows, light_rows


# Kill switch ("auto" | "off"): the kernel is new on real Mosaic; callers
# that must survive a lowering failure (bench.py) probe-compile it first
# and flip this off on failure.
_SHADE_KERNEL_MODE = "auto"


def set_shade_kernel(mode: str) -> None:
    global _SHADE_KERNEL_MODE
    assert mode in ("auto", "off")
    _SHADE_KERNEL_MODE = mode


def shade_setup_supported(pack, cfg, pmap) -> bool:
    """Fusion gate: no texture maps (uv/duvw paths unused), no photon
    gather, small tables, non-differentiable render."""
    n_inst = pack.n_sph + pack.n_pln + pack.n_msh
    return (_SHADE_KERNEL_MODE == "auto"
            and pack.n_texmaps == 0 and pmap is None
            and not cfg.use_photon_map  # probe-time: pmap not built yet
            and not cfg.differentiable
            and 0 < n_inst <= MAX_INST
            and pack.mtl_gloss.shape[0] <= MAX_MTL
            and 0 < pack.n_lights <= MAX_LIGHTS)


def probe_shade_kernel(pack, cfg) -> bool:
    """Compile + run the kernel on 8 lanes; on ANY failure (e.g. a Mosaic
    lowering gap on real TPU) flip the kill switch off and return False so
    the XLA shading path serves instead. Cheap on CPU (interpret mode);
    one small kernel compile on TPU."""
    import numpy as np

    from bhraytracer_tpu.ops.trace import trace_closest

    if not shade_setup_supported(pack, cfg, None):
        return False
    try:
        n = 8
        o = jnp.asarray(np.tile([[0.0, -8.0, 3.0]], (n, 1)), jnp.float32)
        d = jnp.asarray(np.tile([[0.0, 1.0, -0.2]], (n, 1)), jnp.float32)
        hit = trace_closest(pack, o, d, "front")
        u = jnp.zeros((n, 13), jnp.float32) + 0.5
        out = shade_setup(pack, cfg, o, d, hit, hit.hit, u)
        jax.block_until_ready(out.p)
        return True
    except Exception as e:  # pragma: no cover - exercised on real TPU only
        import sys

        print(f"WARNING: shade kernel unavailable ({type(e).__name__}); "
              "using the XLA shading path", file=sys.stderr)
        set_shade_kernel("off")
        return False


def _pad_planes(x, n):
    """(C, N) f32 -> (C, G, LANES) padded plane stack."""
    g = -(-n // BLOCK) * SUBL
    pad = g * LANES - n
    x = x.astype(jnp.float32)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((x.shape[0], pad), jnp.float32)], 1)
    return x.reshape(x.shape[0], g, LANES), g


def _stack_pad(cols, n):
    """List of (N,) f32 -> (C, G, LANES) padded plane stack."""
    return _pad_planes(jnp.stack([c.astype(jnp.float32) for c in cols]), n)


def shade_setup(pack, cfg, o, d, hit, shade, u_tab) -> ShadeSetup:
    """Run the fused kernel over (N,) lanes. `shade` = active & hit.hit.

    Plane stacks are built by TRANSPOSE (one op per source array) instead of
    per-column strided slices — the same (N,3)->(N,) slice glue the stream
    kernels shed (round-5 top lever)."""
    n = o.shape[0]
    rays, g = _pad_planes(jnp.concatenate([o.T, d.T]), n)
    hitp, _ = _stack_pad([hit.kind.astype(jnp.float32),
                          hit.inst.astype(jnp.float32),
                          hit.front.astype(jnp.float32),
                          shade.astype(jnp.float32)], n)
    u, _ = _pad_planes(u_tab.T, n)
    has_rows = bool(pack.n_msh)
    if has_rows:
        fi = jnp.clip(hit.face, 0, pack.resolve_rows.shape[0] - 1)
        # Gather only the 19 columns the kernel consumes (v0..v2, n0..n2,
        # mtl) from an F-sized pre-sliced table (traced once per program) —
        # the full (N,32) row gather moved 13 dead columns per lane.
        krows = jnp.concatenate(
            [pack.resolve_rows[:, :18], pack.resolve_rows[:, 27:28]], 1)
        rows, _ = _pad_planes(krows[fi].T, n)
    else:
        rows = jnp.zeros((1, g, LANES), jnp.float32)

    inst_t, mtl_t, light_t = shade_tables(pack)
    kernel = functools.partial(
        _shade_kernel, pack.n_sph, pack.n_pln, pack.n_msh,
        int(mtl_t.shape[0]), pack.n_lights, float(cfg.bias), has_rows)

    def spec(c):
        return pl.BlockSpec((c, SUBL, LANES), lambda i: (0, i, 0),
                            memory_space=pltpu.VMEM)

    tab = pl.BlockSpec(memory_space=pltpu.VMEM)
    outs = pl.pallas_call(
        kernel,
        grid=(g // SUBL,),
        in_specs=[tab, tab, tab, spec(6), spec(4), spec(13),
                  spec(rows.shape[0])],
        out_specs=(spec(8), spec(9), spec(7), spec(9), spec(4)),
        out_shape=(
            jax.ShapeDtypeStruct((8, g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((9, g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((7, g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((9, g, LANES), jnp.float32),
            jax.ShapeDtypeStruct((4, g, LANES), jnp.float32),
        ),
        interpret=jax.default_backend() != "tpu",
    )(inst_t, mtl_t, light_t, rays, hitp, u, rows)
    surf, shadow, direct, gi, chain = (
        x.reshape(x.shape[0], -1)[:, :n] for x in outs)

    def v3(x, k):
        return jnp.stack([x[k], x[k + 1], x[k + 2]], axis=-1)

    return ShadeSetup(
        p=v3(surf, 0), n=v3(surf, 3), z=surf[6],
        mtl=surf[7].astype(jnp.int32),
        shadow_o=v3(shadow, 0), shadow_d=v3(shadow, 3), shadow_tmax=shadow[6],
        gate=shadow[7] > 0.0, rr0=shadow[8] > 0.0,
        cos_theta=direct[0], irr=v3(direct, 1), brdf_cos=v3(direct, 4),
        gi_o=v3(gi, 0), gi_d=v3(gi, 3), gi_albedo=v3(gi, 6),
        refr_eff=v3(chain, 0), cos_phi1=chain[3],
    )
