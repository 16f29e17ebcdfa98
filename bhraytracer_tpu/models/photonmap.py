"""Photon mapping: wavefront photon tracing + TPU-friendly grid gather.

Reference behavior being rebuilt (not ported):
  - BuildPhotonMap / BuildCausticPhotonMap (Main.cpp:251-386): emit photons
    from point lights chosen with probability ~ intensity*size via the same
    first-index-past-u walk over lights sorted ascending; uniform-sphere
    emission directions (PointLight::RandomPhoton, PointLight.cpp:20-34).
  - MtlBlinn::RandomPhotonBounce (MtlBlinn.cpp:140-202): transmissive
    surfaces kill regular photons; Russian-roulette absorb at 0.3; the SAME
    uniform decides absorb and diffuse-vs-specular; power reweighted by
    diffuse/p_diff or specular/p_spec (including the reference's
    probabilities-sum-above-one quirk).
  - RandomPhotonBounceForCaustic (MtlBlinn.cpp:203-303): transmissive
    surfaces transmit (enter + exit with the member refractionGlossiness,
    TIR kills); diffuse bounces kill; only specular continues.
  - Photons are deposited at every non-first hit whose material is a photon
    surface (diffuse gray > 0), before the bounce decision
    (Main.cpp:296-317).
  - Powers scaled by 1/numStored after the build (Main.cpp:289).

The kd-tree kNN gather (cyPhotonMap.h:421-498) is replaced by a uniform-grid
gather — a heap-based kNN search is hostile to TPU. The estimator matches
the reference's constant-filter density estimate with the SAME k-nearest
radius shrink (cyPhotonMap.h:443-494: once `photon_gather_max` photons are
in range, the gather radius shrinks to the k-th-nearest distance and
irrad = sum(k nearest powers) / (pi r_k^2)). The k-th distance is found by
iterative histogram refinement over dist^2 (16 bins per pass) instead of a
heap: with 2 refinement passes the threshold is exact to r^2/4096, verified
against a brute-force numpy kNN in tests/test_photonmap.py. The per-cell
scan bound is the TRUE max bucket occupancy computed at build time —
nothing is silently dropped.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.ops.linalg import cross, dot, normalize, safe_div, safe_sqrt
from bhraytracer_tpu.ops.sampling import (
    sample_along_light_direction,
    sample_in_semisphere,
)
from bhraytracer_tpu.ops.trace import resolve_hit, trace_closest

MAX_PHOTON_BOUNCES = 20  # wavefront cap; the reference recurses until RR kills


class PhotonMapPack(NamedTuple):
    """Device-side photon map with a uniform-grid index (built on host)."""

    pos: jnp.ndarray  # (P,3)
    dirn: jnp.ndarray  # (P,3) incoming photon direction (normalized)
    power: jnp.ndarray  # (P,3) scaled by 1/P
    cell: jnp.ndarray  # (P,3) i32 grid cell of each photon (exact-match key)
    # Grid index over hashed cells: photons sorted by bucket.
    bucket_start: jnp.ndarray  # (H+1,) i32 — prefix offsets into sorted order
    radius: float
    n_buckets: int
    cell_cap: int


# ---------------------------------------------------------------------------
# wavefront photon tracing
# ---------------------------------------------------------------------------


def _uni(key, tag, shape):
    return jax.random.uniform(jax.random.fold_in(key, tag), shape)


def _select_photon_light(pack, u):
    """Point light chosen ~ gray*size with the reference's walk
    (Main.cpp:363-371, lights sorted ascending by gray*size)."""
    is_point = pack.light_kind == 2
    gray = jnp.sum(pack.light_intensity, axis=1) / 3.0
    w = jnp.where(is_point, gray * pack.light_size, 0.0)
    # Sort ascending by weight (stable; non-point lights sink to front with 0
    # but are never selected because their probability is 0).
    order = jnp.argsort(w, stable=True)
    ws = w[order]
    total = jnp.maximum(jnp.sum(ws), 1e-30)
    probs = ws / total
    ok = (u[:, None] <= probs[None, :]) & (probs[None, :] > 0)
    idx_sorted = jnp.where(jnp.any(ok, 1), jnp.argmax(ok, 1), ws.shape[0] - 1)
    return order[idx_sorted]


def _emit_photons(pack, key, n):
    """Uniform-sphere emission from selected point lights."""
    lidx = _select_photon_light(pack, _uni(key, 0, (n,)))
    phi = _uni(key, 1, (n,)) * 2.0 * jnp.pi
    theta = jnp.arccos(jnp.clip(1.0 - 2.0 * _uni(key, 2, (n,)), -1.0, 1.0))
    st = jnp.sin(theta)
    d = jnp.stack([st * jnp.cos(phi), st * jnp.sin(phi), jnp.cos(theta)], -1)
    o = pack.light_vec[lidx]
    power = pack.light_intensity[lidx]
    return o, d, power


def _photon_bounce(pack, cfg, surf, mtl, ray_d, power, key, caustic: bool):
    """One RandomPhotonBounce[ForCaustic] step for a batch of live photons.

    Returns (continue_mask, new_o, new_d, new_power).
    """
    n = surf.p.shape[0]
    vn = surf.n
    vv = -normalize(ray_d)
    rnd = _uni(key, 0, (n,))
    absorb = cfg.photon_absorb_chance

    transmissive = jnp.sum(mtl.refraction, axis=1) / 3.0 > 0.0

    # --- diffuse/specular lobe machinery (shared, MtlBlinn.cpp:163-187) ---
    kd = jnp.max(mtl.diffuse, axis=1)
    ks = jnp.max(mtl.specular, axis=1)
    d_dir, p_dt = sample_in_semisphere(vn, _uni(key, 1, (n,)), _uni(key, 2, (n,)))
    d_dir = normalize(d_dir)
    vr = 2.0 * dot(vn, vv, keepdims=True) * vn - vv
    s_dir, s_cos = sample_along_light_direction(
        vr, mtl.gloss, _uni(key, 3, (n,)), _uni(key, 4, (n,))
    )
    from bhraytracer_tpu.ops.linalg import safe_pow

    p_st = safe_pow(s_cos, mtl.gloss)
    p_diffuse_raw = safe_div(kd * p_dt, kd * p_dt + ks * p_st)
    p_diff = p_diffuse_raw * (1.0 - absorb) + absorb
    p_spec = (1.0 - p_diff) * (1.0 - absorb) + absorb
    use_spec = rnd >= p_diff

    kdf = mtl.diffuse / jnp.maximum(p_diff, 1e-30)[:, None]
    ksf = mtl.specular / jnp.maximum(p_spec, 1e-30)[:, None]

    bounce_dir = jnp.where(use_spec[:, None], s_dir, d_dir)
    bounce_pow = power * jnp.where(use_spec[:, None], ksf, kdf)
    bounce_o = surf.p + vn * cfg.bias

    survive_rr = rnd >= absorb

    if not caustic:
        # Regular map: transmissive kills; otherwise RR + lobe bounce.
        cont = ~transmissive & survive_rr
        return cont, bounce_o, bounce_dir, bounce_pow

    # --- caustic: transmit through glass (MtlBlinn.cpp:212-249) ---
    cos1 = dot(vn, vv)
    sin1 = safe_sqrt(1.0 - cos1 * cos1)
    sin2 = sin1 / jnp.maximum(mtl.ior, 1e-6)
    cos2 = safe_sqrt(1.0 - sin2 * sin2)
    vt = -cos2[:, None] * vn + normalize(cross(vn, cross(vn, vv))) * sin2[:, None]
    in_o = surf.p - vn * cfg.bias
    in_hit = trace_closest(pack, in_o, vt, "back")
    in_surf = resolve_hit(pack, in_o, vt, in_hit, jnp.zeros(3), jnp.zeros(3))
    # Exit refraction (HandleRayWhenRefractionRayOut) with the material's own
    # refractionGlossiness (the caustic path uses the member, unlike Shade).
    vn2 = in_surf.n
    vv2 = -normalize(vt)
    c1 = dot(vv2, -vn2)
    s1 = safe_sqrt(1.0 - c1 * c1)
    s2 = mtl.ior * s1
    going_out = (s2 <= 1.0) & in_hit.hit
    c2 = safe_sqrt(1.0 - s2 * s2)
    vt2 = vn2 * c2[:, None] + normalize(cross(vn2, cross(vn2, vv2))) * s2[:, None]
    out_o = in_surf.p + vn2 * cfg.bias
    out_d = normalize(vt2)

    # Non-transmissive: only specular bounces continue (diffuse kills).
    cont_solid = survive_rr & use_spec
    pow_solid = power * ksf

    cont = jnp.where(transmissive, going_out, cont_solid)
    new_o = jnp.where(transmissive[:, None], out_o, bounce_o)
    new_d = jnp.where(transmissive[:, None], out_d, s_dir)
    new_pow = jnp.where(transmissive[:, None], power, pow_solid)
    return cont, new_o, new_d, new_pow


def trace_photon_batch(pack, cfg: RenderConfig, key, n: int, caustic: bool):
    """Trace n photon paths to completion; returns stacked deposits
    (pos, dir, power, valid) with shape (MAX_PHOTON_BOUNCES, n, ...)."""
    from bhraytracer_tpu.models.pathtracer import _fetch_mtl

    o, d, power = _emit_photons(pack, jax.random.fold_in(key, 0), n)
    live = jnp.ones((n,), bool)

    dep_pos, dep_dir, dep_pow, dep_valid = [], [], [], []
    for b in range(MAX_PHOTON_BOUNCES):
        bkey = jax.random.fold_in(key, 100 + b)
        hit = trace_closest(pack, o, d, "front")
        surf = resolve_hit(pack, o, d, hit, jnp.zeros(3), jnp.zeros(3))
        mtl = _fetch_mtl(pack, surf.mtl)
        alive = live & hit.hit
        # Deposit at non-first hits on photon surfaces (diffuse gray > 0).
        is_photon_surface = jnp.sum(mtl.diffuse, axis=1) / 3.0 > 0.0
        deposit = alive & is_photon_surface & (b > 0)
        dep_pos.append(surf.p)
        dep_dir.append(normalize(d))
        dep_pow.append(power)
        dep_valid.append(deposit)

        cont, o, d, power = _photon_bounce(
            pack, cfg, surf, mtl, d, power, bkey, caustic
        )
        live = alive & cont

    return (
        jnp.stack(dep_pos),
        jnp.stack(dep_dir),
        jnp.stack(dep_pow),
        jnp.stack(dep_valid),
    )


# ---------------------------------------------------------------------------
# build driver (host loop) + grid index
# ---------------------------------------------------------------------------


def _hash_cells(cells: np.ndarray, n_buckets: int) -> np.ndarray:
    # Large-prime spatial hash in wrapping int32 (bit-identical between host
    # numpy and device jnp, where x64 is disabled). n_buckets is a power of 2.
    c = cells.astype(np.int32)
    with np.errstate(over="ignore"):
        h = (
            (c[..., 0] * np.int32(73856093))
            ^ (c[..., 1] * np.int32(19349663))
            ^ (c[..., 2] * np.int32(83492791))
        )
    return h & np.int32(n_buckets - 1)


def build_photon_map(
    pack,
    cfg: RenderConfig,
    seed: int = 0,
    caustic: bool = True,
    batch: int = 1 << 15,
) -> PhotonMapPack:
    """Emit photon batches until cfg.photon_count deposits are collected,
    scale powers by 1/N (Main.cpp:289), and build the grid index."""
    key = jax.random.PRNGKey(seed)
    traced = jax.jit(
        lambda k: trace_photon_batch(pack, cfg, k, batch, caustic)
    )
    pos_l, dir_l, pow_l = [], [], []
    n_dep = 0
    rounds = 0
    # Caustic yield can be ~1% of emissions (only paths through glass
    # deposit), so allow many rounds before giving up.
    max_rounds = max(8, (32 * cfg.photon_count) // batch + 4)
    while n_dep < cfg.photon_count and rounds < max_rounds:
        p, dd, pw, v = jax.tree.map(
            np.asarray, traced(jax.random.fold_in(key, rounds))
        )
        m = v.reshape(-1)
        pos_l.append(p.reshape(-1, 3)[m])
        dir_l.append(dd.reshape(-1, 3)[m])
        pow_l.append(pw.reshape(-1, 3)[m])
        n_dep += int(m.sum())
        rounds += 1
        if int(m.sum()) == 0 and rounds >= 4:
            break  # scene deposits nothing (e.g. no point lights)

    if n_dep == 0:
        pos = np.zeros((1, 3), np.float32)
        dirn = np.tile(np.array([[0, 0, -1]], np.float32), (1, 1))
        power = np.zeros((1, 3), np.float32)
    else:
        pos = np.concatenate(pos_l)[: cfg.photon_count]
        dirn = np.concatenate(dir_l)[: cfg.photon_count]
        power = np.concatenate(pow_l)[: cfg.photon_count]
        power = power / pos.shape[0]  # ScalePhotonPowers(1/N)

    return build_grid_index(pos, dirn, power, cfg.photon_gather_radius)


def build_grid_index(pos, dirn, power, radius: float,
                     cell_cap: int | None = None) -> PhotonMapPack:
    """Sort photons by hashed grid cell; bucket offsets via bincount.

    cell_cap defaults to the TRUE max bucket occupancy so the gather scans
    every photon (no silent drop); pass a smaller value only to bound cost
    deliberately (tests)."""
    p = np.asarray(pos, np.float32)
    n = p.shape[0]
    n_buckets = 1 << max(10, int(np.ceil(np.log2(max(n, 2) * 2))))
    cells = np.floor(p / radius).astype(np.int64)
    h = _hash_cells(cells, n_buckets)
    order = np.argsort(h, kind="stable")
    counts = np.bincount(h, minlength=n_buckets)
    if cell_cap is None:
        cell_cap = max(1, int(counts.max()))
    start = np.zeros(n_buckets + 1, np.int64)
    np.cumsum(counts, out=start[1:])
    return PhotonMapPack(
        pos=jnp.asarray(p[order]),
        dirn=jnp.asarray(np.asarray(dirn, np.float32)[order]),
        power=jnp.asarray(np.asarray(power, np.float32)[order]),
        cell=jnp.asarray(cells.astype(np.int32)[order]),
        bucket_start=jnp.asarray(start, jnp.int32),
        radius=float(radius),
        n_buckets=n_buckets,
        cell_cap=cell_cap,
    )


def _fold_photons(pmap: PhotonMapPack, pos, normal, fn, carry):
    """Fold fn over every photon in the 27 neighbor cells of each query.

    fn(carry, accept (N,) bool, dist2 (N,), pw (N,3), pd (N,3)) -> carry.
    `accept` already applies the in-range test (dist2 < radius^2) and the
    front-hemisphere rejection dir . normal < 0 (cyPhotonMap.h:448-450)."""
    r2 = pmap.radius * pmap.radius
    base = jnp.floor(pos / pmap.radius).astype(jnp.int32)

    def bucket_of(cell):
        c = cell.astype(jnp.int32)
        h = (
            (c[..., 0] * jnp.int32(73856093))
            ^ (c[..., 1] * jnp.int32(19349663))
            ^ (c[..., 2] * jnp.int32(83492791))
        )
        return h & jnp.int32(pmap.n_buckets - 1)

    for ox in (-1, 0, 1):
        for oy in (-1, 0, 1):
            for oz in (-1, 0, 1):
                cell = base + jnp.array([ox, oy, oz], jnp.int32)
                b = bucket_of(cell)
                s = pmap.bucket_start[b]
                e = pmap.bucket_start[b + 1]

                def body(k, carry):
                    idx = jnp.clip(s + k, 0, pmap.pos.shape[0] - 1)
                    ok = (s + k) < e
                    pp = pmap.pos[idx]
                    dif = pp - pos
                    dist2 = jnp.sum(dif * dif, axis=-1)
                    pd = pmap.dirn[idx]
                    # Exact cell match: hash collisions between neighbor
                    # cells would otherwise double-count a bucket.
                    same_cell = jnp.all(pmap.cell[idx] == cell, axis=-1)
                    accept = (
                        ok & same_cell & (dist2 < r2)
                        & (jnp.sum(pd * normal, -1) < 0)
                    )
                    pw = pmap.power[idx]
                    return fn(carry, accept, dist2, pw, pd)

                carry = jax.lax.fori_loop(0, pmap.cell_cap, body, carry)
    return carry


_HIST_BINS = 16


def gather_irradiance(pmap: PhotonMapPack, pos, normal, k: int | None = None,
                      refine_passes: int = 2):
    """Constant-filter kNN photon density estimate at (N,3) query points.

    Reference semantics (cyPhotonMap.h:333-379, 421-498 via
    MtlBlinn.cpp:334): gather the k = `photon_gather_max` nearest in-range
    front-hemisphere photons; when more than k are in range the radius
    shrinks to the k-th-nearest distance r_k, and
    irrad = sum(k nearest powers) / (pi r_k^2); direction out =
    normalize(sum dir * maxpower) over the same set (cyPhotonMap.h:441-446,
    363-365). k=None disables the shrink (pure fixed-radius estimate).

    TPU re-design: instead of a per-query heap, the k-th distance^2 is
    located by 1 + refine_passes histogram sweeps (16 bins each), then one
    final accumulation sweep below the found threshold. On TPU the sweeps
    are PALLAS PHOTON STREAMS (ops/pallas_photon: every photon past every
    query lane, zero control flow) — the grid-bucket fold's cost is
    cell_cap-bound, and a CAUSTIC map's focal cell can hold ~20% of all
    photons (proj13: 17,936/94K), degenerating the XLA loop to ~2M
    serialized trips and crashing the TPU worker's deadman. The streamed
    sweeps' cost is density-independent. The XLA 27-cell fold remains the
    CPU/fallback path (identical accept sets; float sum order differs).
    Resolution of the threshold: r^2 / 16^(1+refine_passes).
    """
    n = pos.shape[0]
    r2 = pmap.radius * pmap.radius

    from bhraytracer_tpu.ops.trace import _pallas_enabled

    use_stream = False
    if _pallas_enabled():
        from bhraytracer_tpu.ops.pallas_photon import stream_gatherable

        use_stream = stream_gatherable(pmap)

    if use_stream:
        from bhraytracer_tpu.ops.pallas_photon import (
            stream_sweep_final,
            stream_sweep_full,
            stream_sweep_hist,
        )

        def sweep_full():
            return stream_sweep_full(pmap, pos, normal)

        def sweep_hist(lo, hi):
            return stream_sweep_hist(pmap, pos, normal, lo, hi)

        def sweep_final(t):
            return stream_sweep_final(pmap, pos, normal, t)
    else:
        def sweep_full():
            def sweep_a(carry, accept, dist2, pw, pd):
                irr, ds, cnt, hist = carry
                am = accept[:, None]
                irr = irr + jnp.where(am, pw, 0.0)
                maxp = jnp.max(pw, axis=-1, keepdims=True)
                ds = ds + jnp.where(am, pd * maxp, 0.0)
                cnt = cnt + accept.astype(jnp.int32)
                b = jnp.clip((dist2 * (_HIST_BINS / r2)).astype(jnp.int32),
                             0, _HIST_BINS - 1)
                hist = hist + jnp.where(
                    am, jax.nn.one_hot(b, _HIST_BINS, dtype=jnp.int32), 0
                )
                return irr, ds, cnt, hist

            return _fold_photons(
                pmap, pos, normal, sweep_a,
                (jnp.zeros((n, 3)), jnp.zeros((n, 3)),
                 jnp.zeros((n,), jnp.int32),
                 jnp.zeros((n, _HIST_BINS), jnp.int32)),
            )

        def sweep_hist(lo, hi):
            def sweep_h(carry, accept, dist2, pw, pd):
                (h,) = carry
                inb = accept & (dist2 >= lo) & (dist2 < hi)
                b = jnp.clip(
                    ((dist2 - lo)
                     * (_HIST_BINS / jnp.maximum(hi - lo, 1e-30))
                     ).astype(jnp.int32),
                    0, _HIST_BINS - 1)
                h = h + jnp.where(
                    inb[:, None],
                    jax.nn.one_hot(b, _HIST_BINS, dtype=jnp.int32), 0
                )
                return (h,)

            (hist,) = _fold_photons(
                pmap, pos, normal, sweep_h,
                (jnp.zeros((n, _HIST_BINS), jnp.int32),),
            )
            return hist

        def sweep_final(t):
            def sweep_f(carry, accept, dist2, pw, pd):
                irr, ds = carry
                am = (accept & (dist2 <= t))[:, None]
                irr = irr + jnp.where(am, pw, 0.0)
                maxp = jnp.max(pw, axis=-1, keepdims=True)
                ds = ds + jnp.where(am, pd * maxp, 0.0)
                return irr, ds

            return _fold_photons(
                pmap, pos, normal, sweep_f,
                (jnp.zeros((n, 3)), jnp.zeros((n, 3))))

    irr_full, ds_full, cnt, hist = sweep_full()

    if k is None:
        return irr_full / (jnp.pi * r2), normalize(ds_full)

    def pick_bin(hist, below, lo, hi):
        """Per-lane bin whose cumulative count first reaches k; returns the
        refined (below, lo, hi) bracket around the k-th distance^2."""
        cum = below[:, None] + jnp.cumsum(hist, axis=1)
        ge = cum >= k
        b = jnp.argmax(ge, axis=1).astype(jnp.int32)  # first True
        width = (hi - lo) / _HIST_BINS
        new_lo = lo + b.astype(jnp.float32) * width
        new_hi = new_lo + width
        prev = jnp.where(b > 0,
                         jnp.take_along_axis(
                             cum, jnp.maximum(b - 1, 0)[:, None], axis=1
                         )[:, 0],
                         below)
        return prev, new_lo, new_hi

    below = jnp.zeros((n,), jnp.int32)
    lo = jnp.zeros((n,))
    hi = jnp.full((n,), r2)
    below, lo, hi = pick_bin(hist, below, lo, hi)

    for _ in range(refine_passes):
        hist = sweep_hist(lo, hi)
        below, lo, hi = pick_bin(hist, below, lo, hi)

    # Threshold: upper edge of the bracket containing the k-th distance^2
    # (lanes with <= k photons in range keep the full radius).
    need = cnt > k
    t = jnp.where(need, hi, r2)

    irr_k, ds_k = sweep_final(t)

    irr = jnp.where(need[:, None], irr_k / (jnp.pi * t[:, None]),
                    irr_full / (jnp.pi * r2))
    ds = jnp.where(need[:, None], ds_k, ds_full)
    return irr, normalize(ds)
