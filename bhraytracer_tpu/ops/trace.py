"""Scene tracing: closest-hit, any-hit (shadow), and hit resolution.

Replaces the reference's recursive scene-graph walk (`recursive`,
Main.cpp:389-413) and per-type shadow dispatch (GenLight.cpp:15-69) with flat
wavefront queries over the ScenePack:

  - analytic instances are intersected fully vectorized (rays x instances)
  - ALL triangle-mesh instances share ONE unified world-space BVH (instance
    transforms folded at scene compile) queried by an iterative
    ordered-descent traversal with a per-ray short stack inside
    `lax.while_loop` — the TPU re-design of the per-object recursive
    TraceBVHNode/TraceBVHShadow (TriObj.cpp:192-307)

Traversal is integer-valued and wrapped in stop_gradient; `resolve_hit`
*recomputes* the surface interaction differentiably from the discrete hit ids
(the hit-ID-frozen reparameterization), so reverse-mode AD never needs to
differentiate through the traversal loop.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from bhraytracer_tpu.ops.compact import lookup_rows
from bhraytracer_tpu.ops.intersect import (
    box_intersect,
    plane_intersect,
    sphere_intersect,
    triangle_intersect,
)
from bhraytracer_tpu.ops.linalg import (
    BIG,
    cross,
    dot,
    mat_t_vec,
    mat_vec,
    normalize,
    safe_div,
)

KIND_SPHERE, KIND_PLANE, KIND_MESH = 0, 1, 2
LEAF_SIZE = 4  # matches bvh.SetMesh(this, 4) (objects.h:59)
# TriObj.cpp Bias (TriObj.cpp:9). The reference applies it in mesh-local t
# units; with the world-space BVH it applies in world t units — identical
# because the ray parameter is frame-invariant under the folded transforms.
MESH_SHADOW_BIAS = 1e-4

# Pallas kernel routing: "auto" = fused kernels on TPU, jnp elsewhere;
# "on" forces them (interpreted off-TPU: tests), "off" disables.
_PALLAS_MODE = "auto"

# Alternative mesh-traversal strategies for INCOHERENT queries (the ones
# that arrive with reorder=True: GI/TIR/shadow wavefronts):
#   - "stream": brute-force face streaming (ops/pallas_stream) — no stack,
#     no sort, coherence-independent; wins when the tile union saturates
#     the tree (small meshes, scattered rays);
#   - "divergent": per-row SMEM-stack descent (ops/pallas_bvh_divergent).
# Round-4 TPU measurements (floor-free drill + image-level sweep with the
# jit-cache fix in tools/sweep_variants.py — earlier "no difference"
# readings silently re-measured the baseline program): per incoherent
# 590K-lane trace, stream 22.0ms vs packet 76.7 vs divergent 78.6 vs XLA
# while_loop 6642; headline 480K image chunk 412.3 ms/chunk with stream vs
# 600.8 packet-only, 652.9 divergent. Stream is ON by default (gated to
# <= STREAM_MAX_FACES scenes and reorder=True queries); divergent stays
# off — a kept negative result.
_DIVERGENT_MODE = "off"
_STREAM_MODE = "on"
# Cluster-culled stream: sort the rays (the packet kernels' coherence
# key), then let the stream kernels skip whole 64-face clusters a row's
# conservative interval frustum cannot hit before its t cap. Pays one
# argsort + unsort gathers per trace to make rows tight. Bit-identical
# results (the cull is conservative). Off until TPU-measured.
_STREAM_CULL = "off"


def set_stream_cull(mode: str) -> None:
    global _STREAM_CULL
    assert mode in ("on", "off")
    _STREAM_CULL = mode


def _stream_closest_routed(pack, o, d, hit_side, t_init,
                           sph_tab=None, pln_tab=None):
    """stream_closest with the optional cluster-cull routing (sort ->
    culled kernel -> unsort); used by both the analytic-fold and the
    mesh-only branches of trace_closest. Big meshes (above the flat
    kernel's face gate) take the grouped HBM stream, where the coherence
    sort is REQUIRED (group culling only pays on spatially-tight
    blocks)."""
    from bhraytracer_tpu.ops.pallas_stream import stream_closest

    if _stream_uses_hbm(pack):
        from bhraytracer_tpu.ops.compact import inverse_permutation
        from bhraytracer_tpu.ops.pallas_bvh import _coherence_order
        from bhraytracer_tpu.ops.pallas_stream_hbm import stream_closest_hbm

        order = _coherence_order(pack, 0, o, d, t_init)
        inv = inverse_permutation(order)
        t, face, front = stream_closest_hbm(
            pack, o[order], d[order], hit_side, t_init=t_init[order],
            sph_tab=sph_tab, pln_tab=pln_tab)
        return t[inv], face[inv], front[inv]
    if _STREAM_CULL != "on":
        return stream_closest(pack, o, d, hit_side, t_init=t_init,
                              sph_tab=sph_tab, pln_tab=pln_tab)
    from bhraytracer_tpu.ops.compact import inverse_permutation
    from bhraytracer_tpu.ops.pallas_bvh import _coherence_order

    order = _coherence_order(pack, 0, o, d, t_init)
    inv = inverse_permutation(order)
    t, face, front = stream_closest(
        pack, o[order], d[order], hit_side, t_init=t_init[order],
        sph_tab=sph_tab, pln_tab=pln_tab, cull=True)
    return t[inv], face[inv], front[inv]


def _stream_anyhit_routed(pack, o, d, t_min, t_max, sph_tab=None,
                          pln_tab=None, ana_bias: float = 0.0,
                          plane_world_bug: bool = False):
    """stream_anyhit with the optional cluster-cull routing (see above)."""
    from bhraytracer_tpu.ops.pallas_stream import stream_anyhit

    if _stream_uses_hbm(pack):
        from bhraytracer_tpu.ops.compact import inverse_permutation
        from bhraytracer_tpu.ops.pallas_bvh import _coherence_order
        from bhraytracer_tpu.ops.pallas_stream_hbm import stream_anyhit_hbm

        order = _coherence_order(pack, 0, o, d, t_max)
        inv = inverse_permutation(order)
        occ = stream_anyhit_hbm(
            pack, o[order], d[order], t_min, t_max[order], sph_tab=sph_tab,
            pln_tab=pln_tab, ana_bias=ana_bias,
            plane_world_bug=plane_world_bug)
        return occ[inv]
    if _STREAM_CULL != "on":
        return stream_anyhit(pack, o, d, t_min, t_max, sph_tab=sph_tab,
                             pln_tab=pln_tab, ana_bias=ana_bias,
                             plane_world_bug=plane_world_bug)
    from bhraytracer_tpu.ops.compact import inverse_permutation
    from bhraytracer_tpu.ops.pallas_bvh import _coherence_order

    order = _coherence_order(pack, 0, o, d, t_max)
    inv = inverse_permutation(order)
    occ = stream_anyhit(
        pack, o[order], d[order], t_min, t_max[order], sph_tab=sph_tab,
        pln_tab=pln_tab, ana_bias=ana_bias, plane_world_bug=plane_world_bug,
        cull=True)
    return occ[inv]


def set_pallas_mode(mode: str) -> None:
    global _PALLAS_MODE
    assert mode in ("auto", "on", "off")
    _PALLAS_MODE = mode


def set_divergent_mode(mode: str) -> None:
    global _DIVERGENT_MODE
    assert mode in ("on", "off")
    _DIVERGENT_MODE = mode


def set_stream_mode(mode: str) -> None:
    global _STREAM_MODE
    assert mode in ("on", "off")
    _STREAM_MODE = mode


# Grouped HBM stream for big meshes (ops/pallas_stream_hbm): "on" routes
# reorder=True queries on meshes above the flat stream gate through the
# group-culled HBM-streamed kernel; "off" falls back to the packet
# kernel's treelet scan (the round-4 path, ~1000x slower on the 112K-face
# bench leg).
_STREAM_HBM = "on"


def set_stream_hbm_mode(mode: str) -> None:
    global _STREAM_HBM
    assert mode in ("on", "off")
    _STREAM_HBM = mode


def _stream_uses_hbm(pack) -> bool:
    """True when stream routing lands on the grouped HBM kernel (the flat
    VMEM kernel keeps every scene it accepts)."""
    if _STREAM_HBM != "on":
        return False
    from bhraytracer_tpu.ops.pallas_stream import stream_traversable
    from bhraytracer_tpu.ops.pallas_stream_hbm import stream_hbm_traversable

    return not stream_traversable(pack) and stream_hbm_traversable(pack)


# Instrumentation ONLY (tools/sweep_variants.py): stub out individual
# serialized gathers so image-level sweeps can attribute their cost.
# Tokens: "inst" (face->instance id after each mesh trace), "rows"
# (resolve_hit's packed (F,32) row gather). Renders with a non-empty set
# are WRONG images by construction.
_GATHER_STUB: frozenset = frozenset()


def set_gather_stub(tokens: str) -> None:
    global _GATHER_STUB
    _GATHER_STUB = frozenset(t for t in tokens.split(",") if t)


def _divergent_enabled(pack, reorder: bool) -> bool:
    if _DIVERGENT_MODE != "on" or not reorder:
        return False
    from bhraytracer_tpu.ops.pallas_bvh_divergent import divergent_traversable

    return divergent_traversable(pack)


def _stream_enabled(pack, reorder: bool) -> bool:
    if _STREAM_MODE != "on" or not reorder:
        return False
    from bhraytracer_tpu.ops.pallas_stream import stream_traversable

    return stream_traversable(pack) or _stream_uses_hbm(pack)


def _pallas_enabled() -> bool:
    if _PALLAS_MODE == "on":
        return True
    if _PALLAS_MODE == "off":
        return False
    return jax.default_backend() == "tpu"


def probe_trace_kernels(pack) -> bool:
    """Compile + run the trace kernels on 8 lanes; on ANY failure (a Mosaic
    lowering gap on real hardware) force pallas mode OFF so rendering
    survives on the XLA paths. Callers that must not die mid-run (bench,
    CLI) invoke this once per scene before rendering."""
    if not _pallas_enabled():
        return False
    try:
        import numpy as np

        o = jnp.asarray(np.tile([[0.0, -8.0, 3.0]], (8, 1)), jnp.float32)
        d = jnp.asarray(np.tile([[0.0, 1.0, -0.2]], (8, 1)), jnp.float32)
        # Both routings compile different kernels: reorder=True is the
        # stream path (levels >= 1), reorder=False the packet path
        # (level-0 camera rays) — probing only one would let a Mosaic
        # failure in the other kill the render mid-run.
        hit = trace_closest(pack, o, d, "front", reorder=True)
        hit0 = trace_closest(pack, o, d, "front", reorder=False)
        occ = trace_shadow(pack, o, d, jnp.ones((8,)), 1e-5, reorder=True)
        occ0 = trace_shadow(pack, o, d, jnp.ones((8,)), 1e-5, reorder=False)
        jax.block_until_ready((hit.t, hit0.t, occ, occ0))
        return True
    except Exception as e:  # pragma: no cover - exercised on real TPU only
        import sys

        print(f"WARNING: pallas trace kernels unavailable "
              f"({type(e).__name__}); falling back to XLA traversal",
              file=sys.stderr)
        set_pallas_mode("off")
        return False


class Hit(NamedTuple):
    t: jnp.ndarray  # (N,) f32 — BIG on miss
    kind: jnp.ndarray  # (N,) i32
    inst: jnp.ndarray  # (N,) i32
    face: jnp.ndarray  # (N,) i32 global face id (mesh hits)
    front: jnp.ndarray  # (N,) bool
    hit: jnp.ndarray  # (N,) bool


class Surface(NamedTuple):
    p: jnp.ndarray  # (N,3) world hit point
    n: jnp.ndarray  # (N,3) world shading normal (normalized, never flipped)
    uvw: jnp.ndarray  # (N,3)
    duvw: jnp.ndarray  # (N,2,3)
    mtl: jnp.ndarray  # (N,) i32
    z: jnp.ndarray  # (N,) ray parameter (frame-invariant)
    front: jnp.ndarray  # (N,) bool


def _to_local(itm, pos, o, d):
    """Transform rays into instance frames: (N,3),(K,3,3),(K,3) -> (N,K,3).

    Matches Node::ToNodeCoords (scene.h:490-496): p' = itm (p - pos),
    d' = itm d (t parameter is preserved).
    """
    ol = jnp.einsum("kij,nkj->nki", itm, o[:, None, :] - pos[None, :, :])
    dl = jnp.einsum("kij,nj->nki", itm, d)
    return ol, dl


# ---------------------------------------------------------------------------
# BVH traversal (per mesh instance)
# ---------------------------------------------------------------------------


def bvh_closest(pack, root, o, d, hit_side: str, t_init):
    """Closest triangle hit in the unified world-space BVH. o, d: (N,3)
    WORLD rays (instance transforms are folded into wtri_* at compile; the
    ray parameter t is frame-invariant so results compare directly with
    analytic-instance hits).

    Returns (t, face, front): t = t_init lanes that found nothing closer.
    """
    n = o.shape[0]
    depth = pack.bvh_depth + 2
    arange = jnp.arange(n)

    rb_min = pack.bvh_bmin[root]
    rb_max = pack.bvh_bmax[root]
    _, root_hit = box_intersect(rb_min, rb_max, o, d, t_init)

    stack0 = jnp.zeros((n, depth), jnp.int32).at[:, 0].set(root)
    sp0 = jnp.where(root_hit, 1, 0).astype(jnp.int32)

    def cond(state):
        sp = state[1]
        return jnp.any(sp > 0)

    def body(state):
        stack, sp, best_t, best_face, best_front = state
        active = sp > 0
        top = jnp.maximum(sp - 1, 0)
        node = jnp.where(active, stack[arange, top], 0)
        sp = jnp.where(active, sp - 1, sp)

        count = pack.bvh_count[node]
        left = pack.bvh_left[node]
        is_leaf = active & (count > 0)
        is_internal = active & (count == 0)

        # --- leaf: up to LEAF_SIZE contiguous faces ---
        for k in range(LEAF_SIZE):
            fidx = left + k
            fidx = jnp.clip(fidx, 0, pack.wtri_v0.shape[0] - 1)
            fval = is_leaf & (k < count)
            v0 = pack.wtri_v0[fidx]
            v1 = pack.wtri_v1[fidx]
            v2 = pack.wtri_v2[fidx]
            t, front = triangle_intersect(v0, v1, v2, o, d, hit_side)
            upd = fval & (t < best_t)
            best_t = jnp.where(upd, t, best_t)
            best_face = jnp.where(upd, fidx, best_face)
            best_front = jnp.where(upd, front, best_front)

        # --- internal: ordered descent, push far then near ---
        c1 = left
        c2 = left + 1
        t1, h1 = box_intersect(pack.bvh_bmin[c1], pack.bvh_bmax[c1], o, d, best_t)
        t2, h2 = box_intersect(pack.bvh_bmin[c2], pack.bvh_bmax[c2], o, d, best_t)
        swap = t2 < t1
        near = jnp.where(swap, c2, c1)
        far = jnp.where(swap, c1, c2)
        near_hit = is_internal & jnp.where(swap, h2, h1)
        far_hit = is_internal & jnp.where(swap, h1, h2)

        stack = jnp.where(
            far_hit[:, None] & (jnp.arange(depth)[None, :] == sp[:, None]),
            far[:, None],
            stack,
        )
        sp = sp + far_hit.astype(jnp.int32)
        stack = jnp.where(
            near_hit[:, None] & (jnp.arange(depth)[None, :] == sp[:, None]),
            near[:, None],
            stack,
        )
        sp = sp + near_hit.astype(jnp.int32)
        return stack, sp, best_t, best_face, best_front

    init = (
        stack0,
        sp0,
        t_init,
        jnp.full((n,), -1, jnp.int32),
        jnp.zeros((n,), bool),
    )
    _, _, t, face, front = jax.lax.while_loop(cond, body, init)
    return t, face, front


def bvh_anyhit(pack, root, o, d, t_min: float, t_max):
    """Shadow (any-hit) query: any FRONT-facing triangle with t in
    (t_min, t_max) — TraceBVHShadow semantics (TriObj.cpp:272-307; front-only
    via IntersectTriangle(..., HIT_FRONT), mesh shadow bias TriObj.cpp:9).
    """
    n = o.shape[0]
    depth = pack.bvh_depth + 2
    arange = jnp.arange(n)

    # Prune box descent against the parametric bound: a box whose entry t
    # exceeds t_max cannot contain an occluder in (t_min, t_max). Shadow
    # rays toward point lights have t_max = 1, so this prunes hard
    # (TraceBVHShadow prunes the same way via its t-bounded box test,
    # TriObj.cpp:272-307).
    t_max = jnp.broadcast_to(t_max, (n,))
    _, root_hit = box_intersect(pack.bvh_bmin[root], pack.bvh_bmax[root], o, d, t_max)
    stack0 = jnp.zeros((n, depth), jnp.int32).at[:, 0].set(root)
    sp0 = jnp.where(root_hit, 1, 0).astype(jnp.int32)
    occ0 = jnp.zeros((n,), bool)

    def cond(state):
        _, sp, occ = state
        return jnp.any((sp > 0) & ~occ)

    def body(state):
        stack, sp, occ = state
        active = (sp > 0) & ~occ
        top = jnp.maximum(sp - 1, 0)
        node = jnp.where(active, stack[arange, top], 0)
        sp = jnp.where(active, sp - 1, sp)

        count = pack.bvh_count[node]
        left = pack.bvh_left[node]
        is_leaf = active & (count > 0)
        is_internal = active & (count == 0)

        for k in range(LEAF_SIZE):
            fidx = jnp.clip(left + k, 0, pack.wtri_v0.shape[0] - 1)
            fval = is_leaf & (k < count)
            t, _ = triangle_intersect(
                pack.wtri_v0[fidx],
                pack.wtri_v1[fidx],
                pack.wtri_v2[fidx],
                o,
                d,
                "front",
            )
            occ = occ | (fval & (t > t_min) & (t < t_max))

        c1, c2 = left, left + 1
        _, h1 = box_intersect(pack.bvh_bmin[c1], pack.bvh_bmax[c1], o, d, t_max)
        _, h2 = box_intersect(pack.bvh_bmin[c2], pack.bvh_bmax[c2], o, d, t_max)
        for child, h in ((c1, h1), (c2, h2)):
            push = is_internal & h
            stack = jnp.where(
                push[:, None] & (jnp.arange(depth)[None, :] == sp[:, None]),
                child[:, None],
                stack,
            )
            sp = sp + push.astype(jnp.int32)
        return stack, sp, occ

    _, _, occ = jax.lax.while_loop(cond, body, (stack0, sp0, occ0))
    return occ


# ---------------------------------------------------------------------------
# Scene-level queries
# ---------------------------------------------------------------------------


def coherence_perm(pack, o, d, active):
    """Once-per-level coherence permutation (cfg.level_presort): active
    lanes first, grouped by (direction octant, coarse origin cell over the
    mesh root box when there is one). Same key family as the per-trace
    reorder sort (pallas_bvh._coherence_order) but computed ONCE per level
    over the task wavefront, so every trace inside the level can run
    reorder=False on the presorted lanes."""
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    oct_ = (
        (d[:, 0] > 0).astype(jnp.int32)
        + 2 * (d[:, 1] > 0).astype(jnp.int32)
        + 4 * (d[:, 2] > 0).astype(jnp.int32)
    )
    from bhraytracer_tpu.ops.pallas_bvh import _CELL_RES as r

    if pack.n_msh:
        bmin = jax.lax.stop_gradient(pack.bvh_bmin[0])
        bmax = jax.lax.stop_gradient(pack.bvh_bmax[0])
        ext = jnp.maximum(bmax - bmin, 1e-6)
        cell = jnp.clip((o - bmin[None, :]) / ext[None, :] * r, 0.0, r - 1.0)
        cell = cell.astype(jnp.int32)
        cell_id = cell[:, 0] + r * cell[:, 1] + r * r * cell[:, 2]
    else:
        cell_id = jnp.zeros_like(oct_)
    key = jnp.where(active, oct_ * (r * r * r) + cell_id, 8 * (r * r * r))
    return jnp.argsort(key, stable=True)


def trace_closest(pack, o, d, hit_side: str = "front",
                  reorder: bool = True) -> Hit:
    """Closest hit over all instances. o, d: (N,3) world rays.

    reorder=False skips the packet kernels' coherence sort — correct for
    any input (per-lane results don't depend on tile grouping), profitable
    when the lanes are already coherent (level-0 camera rays arrive in
    scanline order)."""
    # The whole query is discrete-valued (ids + aux t): freeze every input so
    # reverse-mode AD never differentiates the traversal while_loops.
    # resolve_hit recomputes the interaction differentiably from the ids.
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    pack = jax.lax.stop_gradient(pack)
    n = o.shape[0]
    best_t = jnp.full((n,), BIG)
    best_kind = jnp.zeros((n,), jnp.int32)
    best_inst = jnp.zeros((n,), jnp.int32)
    best_face = jnp.full((n,), -1, jnp.int32)
    best_front = jnp.zeros((n,), bool)

    # Mesh scenes fold the analytic tests into the packet BVH kernel itself
    # (one launch + one XLA combine fewer per trace); treelet-streamed
    # scenes and mesh-free scenes keep the dedicated analytic kernel.
    use_pallas_bvh = False
    fold_analytic = False
    use_divergent = False
    use_stream = False
    if pack.n_msh and _pallas_enabled():
        from bhraytracer_tpu.ops.pallas_bvh import pallas_traversable

        use_pallas_bvh = pallas_traversable(pack)
        use_stream = use_pallas_bvh and _stream_enabled(pack, reorder)
        use_divergent = (use_pallas_bvh and not use_stream
                         and _divergent_enabled(pack, reorder))
        # Both the packet and the stream kernels fold the analytic
        # instances in-kernel (one launch, one padding layout, no XLA
        # combine per trace). The packet kernel's treelet scan cannot
        # fold; the grouped HBM stream can.
        fold_analytic = (use_pallas_bvh and not use_divergent
                         and (not pack.treelets
                              or (use_stream and _stream_uses_hbm(pack)))
                         and bool(pack.n_sph or pack.n_pln))

    if _pallas_enabled() and (pack.n_sph or pack.n_pln) and not fold_analytic:
        from bhraytracer_tpu.ops.pallas_trace import (
            analytic_closest_pallas,
            instance_table,
        )

        sph_tab = instance_table(pack.sph_itm, pack.sph_pos) if pack.n_sph else None
        pln_tab = instance_table(pack.pln_itm, pack.pln_pos) if pack.n_pln else None
        t, kind, inst, front = analytic_closest_pallas(sph_tab, pln_tab, o, d, hit_side)
        upd = t < best_t
        best_t = jnp.where(upd, t, best_t)
        best_kind = jnp.where(upd, kind, best_kind)
        best_inst = jnp.where(upd, inst, best_inst)
        best_front = jnp.where(upd, front, best_front)
    elif pack.n_sph and not _pallas_enabled():
        ol, dl = _to_local(pack.sph_itm, pack.sph_pos, o, d)
        t, front = sphere_intersect(ol, dl, hit_side)  # (N,K)
        k = jnp.argmin(t, axis=1)
        tk = jnp.take_along_axis(t, k[:, None], 1)[:, 0]
        fk = jnp.take_along_axis(front, k[:, None], 1)[:, 0]
        upd = tk < best_t
        best_t = jnp.where(upd, tk, best_t)
        best_kind = jnp.where(upd, KIND_SPHERE, best_kind)
        best_inst = jnp.where(upd, k.astype(jnp.int32), best_inst)
        best_front = jnp.where(upd, fk, best_front)

    if not _pallas_enabled() and pack.n_pln:
        ol, dl = _to_local(pack.pln_itm, pack.pln_pos, o, d)
        t, front = plane_intersect(ol, dl, hit_side)
        k = jnp.argmin(t, axis=1)
        tk = jnp.take_along_axis(t, k[:, None], 1)[:, 0]
        fk = jnp.take_along_axis(front, k[:, None], 1)[:, 0]
        upd = tk < best_t
        best_t = jnp.where(upd, tk, best_t)
        best_kind = jnp.where(upd, KIND_PLANE, best_kind)
        best_inst = jnp.where(upd, k.astype(jnp.int32), best_inst)
        best_front = jnp.where(upd, fk, best_front)

    if pack.n_msh:
        # ONE query over the unified world-space BVH covers every mesh
        # instance (no per-instance ray transform or sequential walk).
        if use_pallas_bvh:
            from bhraytracer_tpu.ops.pallas_bvh import bvh_closest_pallas

            if fold_analytic:
                from bhraytracer_tpu.ops.pallas_trace import instance_table

                sph_tab = (instance_table(pack.sph_itm, pack.sph_pos)
                           if pack.n_sph else None)
                pln_tab = (instance_table(pack.pln_itm, pack.pln_pos)
                           if pack.n_pln else None)
                if use_stream:
                    t, face, front = _stream_closest_routed(
                        pack, o, d, hit_side, best_t,
                        sph_tab=sph_tab, pln_tab=pln_tab)
                else:
                    t, face, front = bvh_closest_pallas(
                        pack, 0, o, d, hit_side, t_init=best_t,
                        reorder=reorder, sph_tab=sph_tab, pln_tab=pln_tab)
                # Decode the analytic face coding (see bvh_closest_pallas)
                # and build the Hit DIRECTLY: best_* still hold their inits
                # here (the fold consumed the analytic instances in-kernel),
                # so the old best-combine wheres were 6 full-width no-ops of
                # pure glue. Miss lanes now carry kind=KIND_MESH /
                # inst=face_inst[0] junk instead of zeros — every consumer
                # masks with active & hit (see the packet-union note in
                # docs/LEDGER.md).
                ana = face <= -2
                code = (-face) - 2
                mface = jnp.clip(face, 0, pack.face_inst.shape[0] - 1)
                if "inst" in _GATHER_STUB:  # instrumentation only
                    minst = jnp.zeros_like(face)
                else:
                    minst = pack.face_inst[mface]
                return Hit(t=t,
                           kind=jnp.where(ana, (code >> 1) & 1, KIND_MESH),
                           inst=jnp.where(ana, code >> 2, minst),
                           face=jnp.where(ana, -1, face),
                           front=front,
                           hit=t < BIG)
            if use_stream:
                t, face, front = _stream_closest_routed(pack, o, d,
                                                        hit_side, best_t)
            elif use_divergent:
                from bhraytracer_tpu.ops.pallas_bvh_divergent import (
                    bvh_closest_divergent,
                )

                t, face, front = bvh_closest_divergent(
                    pack, 0, o, d, hit_side, t_init=best_t, reorder=reorder)
            else:
                t, face, front = bvh_closest_pallas(pack, 0, o, d, hit_side,
                                                    t_init=best_t,
                                                    reorder=reorder)
        else:
            t, face, front = bvh_closest(pack, 0, o, d, hit_side, best_t)
        if "inst" in _GATHER_STUB:  # instrumentation only (set_gather_stub)
            inst = jnp.zeros_like(face)
        else:
            inst = pack.face_inst[jnp.clip(face, 0, pack.face_inst.shape[0] - 1)]
        if not (pack.n_sph or pack.n_pln):
            # Mesh-only scene: best_* still hold their inits, so the
            # best-combine wheres below would be full-width no-op glue.
            # Miss lanes carry kind=KIND_MESH / inst=face_inst[junk] —
            # consumers mask with active & hit.
            return Hit(t=t, kind=jnp.full_like(face, KIND_MESH), inst=inst,
                       face=face, front=front, hit=t < BIG)
        upd = t < best_t
        best_t = jnp.where(upd, t, best_t)
        best_kind = jnp.where(upd, KIND_MESH, best_kind)
        best_inst = jnp.where(upd, inst, best_inst)
        best_face = jnp.where(upd, face, best_face)
        best_front = jnp.where(upd, front, best_front)

    return Hit(
        t=best_t,
        kind=best_kind,
        inst=best_inst,
        face=best_face,
        front=best_front,
        hit=best_t < BIG,
    )


def trace_shadow(pack, o, d, t_max, shadow_bias: float,
                 plane_extent_bug: bool = False, reorder: bool = True):
    """Boolean occlusion query (ShadowRayRecursive, GenLight.cpp:15-69).

    t_max: (N,) or scalar. `plane_extent_bug=True` reproduces the reference's
    frame mix-up (the plane's [-1,1] extent tested on the parent-frame point,
    GenLight.cpp:37-40).
    """
    o = jax.lax.stop_gradient(o)
    d = jax.lax.stop_gradient(d)
    pack = jax.lax.stop_gradient(pack)
    t_max = jax.lax.stop_gradient(t_max)
    n = o.shape[0]
    t_max = jnp.broadcast_to(t_max, (n,))
    occ = jnp.zeros((n,), bool)

    # Same analytic-into-BVH-kernel fold as trace_closest.
    use_pallas_bvh = False
    fold_analytic = False
    use_divergent = False
    use_stream = False
    if pack.n_msh and _pallas_enabled():
        from bhraytracer_tpu.ops.pallas_bvh import pallas_traversable

        use_pallas_bvh = pallas_traversable(pack)
        use_stream = use_pallas_bvh and _stream_enabled(pack, reorder)
        use_divergent = (use_pallas_bvh and not use_stream
                         and _divergent_enabled(pack, reorder))
        # Packet AND stream anyhit kernels fold the analytic occluders
        # (the packet treelet scan cannot; the grouped HBM stream can).
        fold_analytic = (use_pallas_bvh and not use_divergent
                         and (not pack.treelets
                              or (use_stream and _stream_uses_hbm(pack)))
                         and bool(pack.n_sph or pack.n_pln))

    if _pallas_enabled() and (pack.n_sph or pack.n_pln) and not fold_analytic:
        from bhraytracer_tpu.ops.pallas_trace import (
            analytic_shadow_pallas,
            instance_table,
        )

        sph_tab = instance_table(pack.sph_itm, pack.sph_pos) if pack.n_sph else None
        pln_tab = instance_table(pack.pln_itm, pack.pln_pos) if pack.n_pln else None
        occ |= analytic_shadow_pallas(
            sph_tab, pln_tab, o, d, t_max, shadow_bias,
            plane_world_bug=plane_extent_bug,
        )
    elif pack.n_sph and not _pallas_enabled():
        ol, dl = _to_local(pack.sph_itm, pack.sph_pos, o, d)
        a = dot(dl, dl)
        b = 2.0 * dot(dl, ol)
        c = dot(ol, ol) - 1.0
        disc = b * b - 4.0 * a * c
        sq = jnp.sqrt(jnp.maximum(disc, 0.0))
        tmin = (-b - sq) / jnp.maximum(2.0 * a, 1e-30)  # min(t1, t2)
        # Reference: inside-the-sphere (tmin < 0) casts no shadow
        # (GenLight.cpp:33: if (t < 0) return false).
        hit = (disc > 0.0) & (tmin > shadow_bias) & (tmin < t_max[:, None])
        occ |= jnp.any(hit, axis=1)

    if not _pallas_enabled() and pack.n_pln:
        ol, dl = _to_local(pack.pln_itm, pack.pln_pos, o, d)
        dz = dl[..., 2]
        t = -ol[..., 2] / jnp.where(dz == 0.0, 1e-30, dz)
        if plane_extent_bug:
            x = o[:, None, :] + t[..., None] * d[:, None, :]
        else:
            x = ol + t[..., None] * dl
        in_ext = (jnp.abs(x[..., 0]) <= 1.0) & (jnp.abs(x[..., 1]) <= 1.0)
        hit = (dz != 0.0) & (t >= 0.0) & in_ext & (t > shadow_bias) & (t < t_max[:, None])
        occ |= jnp.any(hit, axis=1)

    if pack.n_msh:
        if use_pallas_bvh:
            from bhraytracer_tpu.ops.pallas_bvh import bvh_anyhit_pallas

            if fold_analytic:
                from bhraytracer_tpu.ops.pallas_trace import instance_table

                sph_tab = (instance_table(pack.sph_itm, pack.sph_pos)
                           if pack.n_sph else None)
                pln_tab = (instance_table(pack.pln_itm, pack.pln_pos)
                           if pack.n_pln else None)
                if use_stream:
                    return occ | _stream_anyhit_routed(
                        pack, o, d, MESH_SHADOW_BIAS, t_max,
                        sph_tab=sph_tab, pln_tab=pln_tab,
                        ana_bias=shadow_bias,
                        plane_world_bug=plane_extent_bug)
                return occ | bvh_anyhit_pallas(
                    pack, 0, o, d, MESH_SHADOW_BIAS, t_max, reorder=reorder,
                    sph_tab=sph_tab, pln_tab=pln_tab,
                    ana_bias=shadow_bias, plane_world_bug=plane_extent_bug)
            # Lanes already occluded by analytic geometry carry t_max = 0 so
            # the t-bounded box pruning retires them at the root.
            tm_live = jnp.where(occ, 0.0, t_max)
            if use_stream:
                occ |= _stream_anyhit_routed(pack, o, d, MESH_SHADOW_BIAS,
                                             tm_live)
            elif use_divergent:
                from bhraytracer_tpu.ops.pallas_bvh_divergent import (
                    bvh_anyhit_divergent,
                )

                occ |= bvh_anyhit_divergent(pack, 0, o, d, MESH_SHADOW_BIAS,
                                            tm_live, reorder=reorder)
            else:
                occ |= bvh_anyhit_pallas(pack, 0, o, d, MESH_SHADOW_BIAS,
                                         tm_live, reorder=reorder)
        else:
            tm_live = jnp.where(occ, 0.0, t_max)
            occ |= bvh_anyhit(pack, 0, o, d, MESH_SHADOW_BIAS, tm_live)

    return occ


# ---------------------------------------------------------------------------
# Differentiable hit resolution
# ---------------------------------------------------------------------------


def rows_from_pools(pack):
    """Rebuild the packed (F,32) resolve-row table IN-JIT from the
    verts/normals/uvs pools (the same packing scene/compile.py precomputes
    host-side). Bit-identical values — gathering copies — but expressed as
    F-sized differentiable gathers, so an AD path that swaps this into
    pack.resolve_rows gets the fast one-row-gather resolve WITH vertex/
    normal/uv gradients flowing through the row table back to the pools.
    F-sized (per-face) work, traced once per program: negligible next to
    the N-lane shading math."""
    f = pack.face_v.shape[0]
    vt3 = pack.verts[pack.face_v].reshape(f, 9)
    nt3 = pack.normals[pack.face_vn].reshape(f, 9)
    ut3 = pack.uvs[pack.face_vt].reshape(f, 9)
    mtl = pack.face_mtl.astype(jnp.float32)[:, None]
    pad = jnp.zeros((f, 4), jnp.float32)
    return jnp.concatenate([vt3, nt3, ut3, mtl, pad], axis=1)


def resolve_hit(pack, o, d, hit: Hit, dd_x, dd_y, minimal: bool = False,
                fast_rows: bool = False) -> Surface:
    """Recompute the surface interaction differentiably from discrete hit ids.

    dd_x/dd_y are the camera pixel deltas used (reference-faithfully, even
    for secondary rays) by the plane's ray-differential propagation
    (Plane.cpp:51-70, via the dd_x/dd_y globals).

    Branches for geometry categories absent from the scene (static n_* = 0)
    are skipped entirely, as is the ray-differential math when the scene has
    no texture maps to filter. `minimal=True` computes only p/n/z (the
    refraction chain's needs), skipping uv/duvw/material resolution.

    `fast_rows=True` feeds the mesh branch from the packed (F,32)
    pack.resolve_rows table — ONE row gather instead of 9 dependent pool
    gathers (face_v -> verts x3, face_vn -> normals x3, face_vt -> uvs x3),
    which XLA:TPU re-executes inside every consumer fusion. The row values
    are bit-identical copies of the pool entries and all downstream math is
    unchanged, so results are bit-exact; use only on non-differentiable
    paths (rows are a compile-time constant — vertex gradients would stop
    at the table instead of reaching pack.verts/pack.normals).
    """
    from bhraytracer_tpu.ops.linalg import safe_sqrt

    n = o.shape[0]
    kind = hit.kind
    z3 = jnp.zeros((n, 3))
    want_duvw = (pack.n_texmaps > 0) and not minimal
    branches = {}

    # --- sphere ---
    if pack.n_sph:
        si = jnp.clip(hit.inst, 0, pack.sph_itm.shape[0] - 1)
        s_itm = lookup_rows(pack.sph_itm, si)
        ol = mat_vec(s_itm, o - lookup_rows(pack.sph_pos, si))
        dl = mat_vec(s_itm, d)
        a = dot(dl, dl)
        b = 2.0 * dot(dl, ol)
        c = dot(ol, ol) - 1.0
        # safe_sqrt: non-sphere lanes run this branch with disc <= 0; a plain
        # sqrt(0) has an infinite VJP that jnp.where would turn into NaN.
        sq = safe_sqrt(b * b - 4.0 * a * c)
        inv2a = 1.0 / jnp.maximum(2.0 * a, 1e-30)
        t_s = jnp.where(hit.front, (-b - sq) * inv2a, (-b + sq) * inv2a)
        p_s = ol + t_s[:, None] * dl
        n_s = p_s  # N = local hit point (Sphere.cpp:57)
        if minimal:
            uv_s = z3
        else:
            dn = normalize(jax.lax.stop_gradient(p_s))
            uv_s = jnp.stack(
                [
                    0.5 + jnp.arctan2(dn[:, 1], dn[:, 0]) / (2.0 * jnp.pi),
                    0.5 - jnp.arcsin(jnp.clip(dn[:, 2], -1.0, 1.0)) / jnp.pi,
                    jnp.zeros(n),
                ],
                -1,
            )
        branches[KIND_SPHERE] = (t_s, p_s, n_s, uv_s, z3, z3,
                                 lookup_rows(pack.sph_mtl, si),
                                 lookup_rows(pack.sph_tm, si), s_itm,
                                 lookup_rows(pack.sph_pos, si))

    # --- plane ---
    if pack.n_pln:
        pi = jnp.clip(hit.inst, 0, pack.pln_itm.shape[0] - 1)
        p_itm = lookup_rows(pack.pln_itm, pi)
        ol = mat_vec(p_itm, o - lookup_rows(pack.pln_pos, pi))
        dl = mat_vec(p_itm, d)
        # Same degenerate-lane guard as the mesh branch below: a junk lane
        # with dl_z ~ 0 would produce t ~ 1e30 -> inf positions whose VJP
        # poisons upstream cotangents. Real plane hits pass the [-1,1]
        # extent test, which a |t| ~ 1e12 grazing ray cannot.
        para_p = jnp.abs(dl[:, 2]) < 1e-12
        t_p = jnp.where(para_p, 0.0, -ol[:, 2]) / jnp.where(
            para_p, 1.0, dl[:, 2]
        )
        p_p = ol + t_p[:, None] * dl
        n_p = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
        uv_p = jnp.stack(
            [(1.0 + p_p[:, 0]) * 0.5, (1.0 + p_p[:, 1]) * 0.5, jnp.zeros(n)], -1
        )
        if want_duvw:
            # Ray differentials (Plane.cpp:51-70): mixes the LOCAL ray
            # direction with the WORLD-frame camera deltas, verbatim.
            nd = normalize(dl)
            scaled_t = t_p * jnp.sqrt(jnp.maximum(dot(dl, dl), 1e-30))
            nrm = n_p

            def plane_duvw(dd):
                dd = jnp.broadcast_to(dd, (n, 3))
                ddir = dd - dot(nd, dd, keepdims=True) * nd
                dt = -(scaled_t * dot(ddir, nrm)
                       / jnp.where(dot(nd, nrm) == 0, 1e-30, dot(nd, nrm)))
                dhit = scaled_t[:, None] * ddir + dt[:, None] * nd
                return dhit * 0.5

            d0, d1 = plane_duvw(dd_x), plane_duvw(dd_y)
        else:
            d0 = d1 = z3
        branches[KIND_PLANE] = (t_p, p_p, n_p, uv_p, d0, d1,
                                lookup_rows(pack.pln_mtl, pi),
                                lookup_rows(pack.pln_tm, pi), p_itm,
                                lookup_rows(pack.pln_pos, pi))

    # --- mesh ---
    if pack.n_msh:
        from bhraytracer_tpu.ops.intersect import triangle_areas

        mi = jnp.clip(hit.inst, 0, pack.msh_itm.shape[0] - 1)
        m_itm = lookup_rows(pack.msh_itm, mi)
        ol = mat_vec(m_itm, o - lookup_rows(pack.msh_pos, mi))
        dl = mat_vec(m_itm, d)
        fi = jnp.clip(hit.face, 0, pack.face_v.shape[0] - 1)
        if fast_rows:
            if "rows" in _GATHER_STUB:  # instrumentation only
                rows = jnp.broadcast_to(pack.resolve_rows[0], (n, 32))
            else:
                rows = pack.resolve_rows[fi]  # (N,32): see pack.py field doc
            v0, v1, v2 = rows[:, 0:3], rows[:, 3:6], rows[:, 6:9]
        else:
            vi = pack.face_v[fi]
            v0, v1, v2 = (pack.verts[vi[:, 0]], pack.verts[vi[:, 1]],
                          pack.verts[vi[:, 2]])
        vn = cross(v1 - v0, v2 - v0)
        tdiv = dot(vn, dl)
        # Non-mesh/miss lanes run this branch with clipped junk ids; a
        # near-parallel (vn, dl) then makes t ~ 1/eps, the projected areas
        # overflow to inf and bc = inf/inf = NaN — whose VJP scatter-adds
        # NaN into pack.verts even though the lane is where-masked out.
        # Real hits can't be grazing (triangle_intersect culls |cos| <
        # PERP_EPS), so zeroing degenerate lanes changes no selected value.
        graze = jnp.abs(tdiv) < 1e-12
        t_m = jnp.where(graze, 0.0, dot(vn, v0) - dot(vn, ol)) / jnp.where(
            graze, 1.0, tdiv
        )
        p_m = ol + t_m[:, None] * dl
        a0, a1, a2 = triangle_areas(v0, v1, v2, p_m, vn)
        asum = a0 + a1 + a2
        bc = jnp.stack([a0, a1, a2], -1) / jnp.where(
            jnp.abs(asum) < 1e-30, 1e-30, asum
        )[:, None]
        if fast_rows:
            n_m = (bc[:, 0:1] * rows[:, 9:12] + bc[:, 1:2] * rows[:, 12:15]
                   + bc[:, 2:3] * rows[:, 15:18])
        else:
            ni = pack.face_vn[fi]
            n_m = (
                bc[:, 0:1] * pack.normals[ni[:, 0]]
                + bc[:, 1:2] * pack.normals[ni[:, 1]]
                + bc[:, 2:3] * pack.normals[ni[:, 2]]
            )
        if minimal:
            uv_m = z3
        elif fast_rows:
            uv_m = (bc[:, 0:1] * rows[:, 18:21] + bc[:, 1:2] * rows[:, 21:24]
                    + bc[:, 2:3] * rows[:, 24:27])
        else:
            ti = pack.face_vt[fi]
            uv_m = (
                bc[:, 0:1] * pack.uvs[ti[:, 0]]
                + bc[:, 1:2] * pack.uvs[ti[:, 1]]
                + bc[:, 2:3] * pack.uvs[ti[:, 2]]
            )
        fmtl = (rows[:, 27].astype(jnp.int32) if fast_rows
                else pack.face_mtl[fi])
        m_ml = lookup_rows(pack.msh_mtl, mi)
        mtl_m = jnp.where(m_ml >= 0, m_ml, fmtl)
        branches[KIND_MESH] = (t_m, p_m, n_m, uv_m, z3, z3, mtl_m,
                               lookup_rows(pack.msh_tm, mi), m_itm,
                               lookup_rows(pack.msh_pos, mi))

    if not branches:
        zero = jnp.zeros((n,))
        return Surface(p=z3, n=z3, uvw=z3, duvw=jnp.zeros((n, 2, 3)),
                       mtl=jnp.zeros((n,), jnp.int32), z=zero, front=hit.front)

    # --- select by kind and transform to world (FromNodeCoords,
    # scene.h:497-501: p -> tm p + pos, N -> normalize(itm^T N)) ---
    kinds = sorted(branches.keys())

    def _bx(mask, like):
        return mask.reshape(mask.shape + (1,) * (like.ndim - 1))

    def sel(idx):
        out = branches[kinds[0]][idx]
        for kd in kinds[1:]:
            out = jnp.where(_bx(kind == kd, out), branches[kd][idx], out)
        return out

    t = sel(0)
    p_l = sel(1)
    n_l = sel(2)
    uvw = sel(3)
    duvw = jnp.stack([sel(4), sel(5)], 1)
    mtl = sel(6)
    tm = sel(7)
    itm = sel(8)
    pos = sel(9)

    p_w = mat_vec(tm, p_l) + pos
    n_w = normalize(mat_t_vec(itm, n_l))
    return Surface(p=p_w, n=n_w, uvw=uvw, duvw=duvw, mtl=mtl, z=t, front=hit.front)
