"""Pallas TPU streaming photon gather.

The grid-bucket kNN gather (models/photonmap._fold_photons) loops
27 x cell_cap serialized (N,)-gather iterations, where cell_cap is the TRUE
max bucket occupancy — and a CAUSTIC map concentrates photons at the focus
(proj13: 17,936 of 94K photons in ONE cell), so the XLA program degenerates
to ~2M loop trips and the TPU worker's deadman kills it (the round-5 bench
crash).

TPU re-design, same insight as the face stream kernel (ops/pallas_stream):
for tables this size, hierarchy does not pay — STREAM every photon past
every query lane with zero control flow. One (SLAB, RLANES) vector op tests
SLAB photons x RLANES queries; 94K photons x 2048 lanes is ~10 GFLOP-class
work per block sweep, compute-bound and completely insensitive to density
skew. The kNN histogram refinement (cyPhotonMap.h:421-498 semantics, see
gather_irradiance) becomes 3 kernel passes:

  full:  irradiance+dir sums, in-range count, 16-bin dist^2 histogram
  hist:  16-bin histogram of dist^2 within a per-lane [lo, hi) bracket
  final: irradiance+dir sums below a per-lane threshold t

Photon rows: (P_pad, 16) f32 [pos(3), dirn(3), power(3), maxpower(1),
pad(6)]; padding rows carry pos = +BIG so dist2 >= r2 rejects them.
Queries pack (8, N_pad): [px,py,pz, nx,ny,nz, lo, hi].
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from bhraytracer_tpu.ops.linalg import BIG

PSLAB = 8  # photons per slab (sublane dim)
RLANES = 2048  # queries per block
HIST_BINS = 16
# Photons per grid block (HBM -> VMEM, Pallas-pipelined): the full table
# in VMEM blew the scoped-vmem limit at 94K photons; blocked streaming
# caps kernel VMEM at one (PGROUP, 16) slice regardless of map size.
PGROUP = 4096
# Sanity bound only (the blocked stream's VMEM use is size-independent;
# cost is linear in the table).
STREAM_MAX_PHOTONS = 1 << 22


def photon_rows(pmap) -> jnp.ndarray:
    """(P_pad, 16) streaming rows from a PhotonMapPack."""
    p, dn, pw = pmap.pos, pmap.dirn, pmap.power
    maxp = jnp.max(pw, axis=1, keepdims=True)
    rows = jnp.concatenate(
        [p, dn, pw, maxp, jnp.zeros((p.shape[0], 6), jnp.float32)], axis=1)
    pad = (-rows.shape[0]) % PGROUP
    if pad:
        far = jnp.full((pad, 16), 0.0, jnp.float32).at[:, 0:3].set(BIG)
        rows = jnp.concatenate([rows, far])
    return rows


def _pack_queries(pos, normal, lo, hi):
    n = pos.shape[0]
    g = -(-n // RLANES)
    rows = jnp.concatenate(
        [pos.T, normal.T, lo[None, :].astype(jnp.float32),
         hi[None, :].astype(jnp.float32)], axis=0)
    pad = g * RLANES - n
    if pad:
        # Padding lanes: pos=BIG so every dist2 test fails.
        prow = jnp.zeros((8, pad), jnp.float32).at[0:3, :].set(BIG)
        rows = jnp.concatenate([rows, prow], axis=1)
    return rows, n, g


def _accept(slab, px, py, pz, nx, ny, nz):
    sx, sy, sz = slab[:, 0:1], slab[:, 1:2], slab[:, 2:3]
    dx, dy, dz = slab[:, 3:4], slab[:, 4:5], slab[:, 5:6]
    ex, ey, ez = sx - px, sy - py, sz - pz
    dist2 = ex * ex + ey * ey + ez * ez
    back = dx * nx + dy * ny + dz * nz  # dir . normal
    return dist2, back < 0.0


def _kernel(mode: str, n_groups: int,
            photons, queries, *outs_and_scratch):
    # 2-D grid (query_block i, photon_group j): photons stream from HBM
    # one (PGROUP, 16) block per step (the full 94K-row table in VMEM
    # blew the scoped-vmem limit); accumulators persist in VMEM scratch
    # across the j sweep, outputs flush at the last group.
    # r2 is NOT captured as a scalar (pmap.radius is a traced pytree leaf
    # under jit and compiled pallas rejects captured constants): the hi
    # query row carries r2 in 'full'/'final' mode; 'hist' brackets are
    # subsets of [0, r2) so the r2 bound is implied by dist2 < hi.
    j = pl.program_id(1)
    if mode == "full":
        acc_out, hist_out, acc_ref, hist_ref = outs_and_scratch
    elif mode == "hist":
        hist_out, hist_ref = outs_and_scratch
    else:
        acc_out, acc_ref = outs_and_scratch
    px, py, pz = queries[0:1, :], queries[1:2, :], queries[2:3, :]
    nx, ny, nz = queries[3:4, :], queries[4:5, :], queries[5:6, :]
    lo, hi = queries[6:7, :], queries[7:8, :]
    inv_w = HIST_BINS / jnp.maximum(hi - lo, 1e-30)

    @pl.when(j == 0)
    def _init():
        if mode != "hist":
            acc_ref[...] = jnp.zeros((8, RLANES), jnp.float32)
        if mode != "final":
            hist_ref[...] = jnp.zeros((HIST_BINS, RLANES), jnp.float32)

    if mode == "full":
        init = (tuple(acc_ref[k:k + 1, :] for k in range(7))
                + tuple(hist_ref[k:k + 1, :] for k in range(HIST_BINS)))
    elif mode == "hist":
        init = tuple(hist_ref[k:k + 1, :] for k in range(HIST_BINS))
    else:
        init = tuple(acc_ref[k:k + 1, :] for k in range(6))

    def body(s, carry):
        slab = photons[pl.ds(s * PSLAB, PSLAB), :]
        dist2, front = _accept(slab, px, py, pz, nx, ny, nz)
        pwr, pwg, pwb = slab[:, 6:7], slab[:, 7:8], slab[:, 8:9]
        ddx, ddy, ddz = slab[:, 3:4], slab[:, 4:5], slab[:, 5:6]
        maxp = slab[:, 9:10]
        if mode == "full":
            ok = front & (dist2 < hi)  # hi == r2 in full mode
            okf = ok.astype(jnp.float32)
            ir, ig, ib, dsx, dsy, dsz, cnt = carry[:7]
            hist = carry[7:]
            ir = ir + jnp.sum(okf * pwr, 0, keepdims=True)
            ig = ig + jnp.sum(okf * pwg, 0, keepdims=True)
            ib = ib + jnp.sum(okf * pwb, 0, keepdims=True)
            dsx = dsx + jnp.sum(okf * ddx * maxp, 0, keepdims=True)
            dsy = dsy + jnp.sum(okf * ddy * maxp, 0, keepdims=True)
            dsz = dsz + jnp.sum(okf * ddz * maxp, 0, keepdims=True)
            cnt = cnt + jnp.sum(okf, 0, keepdims=True)
            b = (dist2 * inv_w).astype(jnp.int32)  # lo=0, hi=r2
            hist = tuple(
                h + jnp.sum(okf * (b == j).astype(jnp.float32), 0,
                            keepdims=True)
                for j, h in enumerate(hist))
            return (ir, ig, ib, dsx, dsy, dsz, cnt) + hist
        if mode == "hist":
            ok = front & (dist2 >= lo) & (dist2 < hi)  # hi <= r2 always
            okf = ok.astype(jnp.float32)
            b = ((dist2 - lo) * inv_w).astype(jnp.int32)
            return tuple(
                h + jnp.sum(okf * (b == j).astype(jnp.float32), 0,
                            keepdims=True)
                for j, h in enumerate(carry))
        # final: accumulate below per-lane threshold (queries row 6 = t,
        # row 7 = r2)
        ok = front & (dist2 < hi) & (dist2 <= lo)
        okf = ok.astype(jnp.float32)
        ir, ig, ib, dsx, dsy, dsz = carry
        ir = ir + jnp.sum(okf * pwr, 0, keepdims=True)
        ig = ig + jnp.sum(okf * pwg, 0, keepdims=True)
        ib = ib + jnp.sum(okf * pwb, 0, keepdims=True)
        dsx = dsx + jnp.sum(okf * ddx * maxp, 0, keepdims=True)
        dsy = dsy + jnp.sum(okf * ddy * maxp, 0, keepdims=True)
        dsz = dsz + jnp.sum(okf * ddz * maxp, 0, keepdims=True)
        return ir, ig, ib, dsx, dsy, dsz

    out = jax.lax.fori_loop(0, PGROUP // PSLAB, body, init)
    if mode == "full":
        acc_ref[...] = jnp.concatenate(
            out[:7] + (jnp.zeros((1, RLANES), jnp.float32),), axis=0)
        hist_ref[...] = jnp.concatenate(out[7:], axis=0)
    elif mode == "hist":
        hist_ref[...] = jnp.concatenate(out, axis=0)
    else:
        acc_ref[...] = jnp.concatenate(
            out + (jnp.zeros((2, RLANES), jnp.float32),), axis=0)

    @pl.when(j == n_groups - 1)
    def _finalize():
        if mode != "hist":
            acc_out[0] = acc_ref[...]
        if mode != "final":
            hist_out[0] = hist_ref[...]


def _call(mode: str, rows, queries, g: int):
    n_groups = rows.shape[0] // PGROUP
    kernel = functools.partial(_kernel, mode, n_groups)
    p_spec = pl.BlockSpec((PGROUP, 16), lambda i, j: (j, 0),
                          memory_space=pltpu.VMEM)
    q_spec = pl.BlockSpec((8, RLANES), lambda i, j: (0, i),
                          memory_space=pltpu.VMEM)
    acc_spec = pl.BlockSpec((1, 8, RLANES), lambda i, j: (i, 0, 0),
                            memory_space=pltpu.VMEM)
    hist_spec = pl.BlockSpec((1, HIST_BINS, RLANES), lambda i, j: (i, 0, 0),
                             memory_space=pltpu.VMEM)
    acc_shape = jax.ShapeDtypeStruct((g, 8, RLANES), jnp.float32)
    hist_shape = jax.ShapeDtypeStruct((g, HIST_BINS, RLANES), jnp.float32)
    acc_scr = pltpu.VMEM((8, RLANES), jnp.float32)
    hist_scr = pltpu.VMEM((HIST_BINS, RLANES), jnp.float32)
    if mode == "full":
        out_specs, out_shape = (acc_spec, hist_spec), (acc_shape, hist_shape)
        scratch = [acc_scr, hist_scr]
    elif mode == "hist":
        out_specs, out_shape = hist_spec, hist_shape
        scratch = [hist_scr]
    else:
        out_specs, out_shape = acc_spec, acc_shape
        scratch = [acc_scr]
    return pl.pallas_call(
        kernel,
        grid=(g, n_groups),
        in_specs=[p_spec, q_spec],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=scratch,
        interpret=jax.default_backend() != "tpu",
    )(rows, queries)


def stream_sweep_full(pmap, pos, normal):
    """(irr (N,3), ds (N,3), cnt (N,), hist (N,16)) over the full radius."""
    r2 = pmap.radius * pmap.radius
    n = pos.shape[0]
    rows = photon_rows(pmap)
    q, _, g = _pack_queries(pos, normal, jnp.zeros((n,)),
                            jnp.full((n,), r2))
    acc, hist = _call("full", rows, q, g)
    acc = jnp.moveaxis(acc, 1, 2).reshape(-1, 8)[:n]
    hist = jnp.moveaxis(hist, 1, 2).reshape(-1, HIST_BINS)[:n]
    return (acc[:, 0:3], acc[:, 3:6], acc[:, 6].astype(jnp.int32),
            hist.astype(jnp.int32))


def stream_sweep_hist(pmap, pos, normal, lo, hi):
    """(N,16) histogram of dist^2 within per-lane [lo, hi)."""
    r2 = pmap.radius * pmap.radius
    n = pos.shape[0]
    rows = photon_rows(pmap)
    q, _, g = _pack_queries(pos, normal, lo, hi)
    hist = _call("hist", rows, q, g)
    return jnp.moveaxis(hist, 1, 2).reshape(-1, HIST_BINS)[:n].astype(jnp.int32)


def stream_sweep_final(pmap, pos, normal, t):
    """(irr (N,3), ds (N,3)) accumulated over dist^2 <= t."""
    r2 = pmap.radius * pmap.radius
    n = pos.shape[0]
    rows = photon_rows(pmap)
    q, _, g = _pack_queries(pos, normal, t, jnp.full((n,), r2))
    acc = _call("final", rows, q, g)
    acc = jnp.moveaxis(acc, 1, 2).reshape(-1, 8)[:n]
    return acc[:, 0:3], acc[:, 3:6]


def stream_gatherable(pmap) -> bool:
    return int(pmap.pos.shape[0]) <= STREAM_MAX_PHOTONS
