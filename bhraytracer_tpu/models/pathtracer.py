"""The wavefront path-tracing integrator (flagship model).

TPU re-architecture of the reference's recursive shading megakernel
(MtlBlinn::Shade, MtlBlinn.cpp:89-138, plus its mutual recursion with
`recursive`/RefractionRecusive): a *bounded-depth tree wavefront*.

Per camera sample, the reference's Shade call tree has branching factor <= 2
(one refraction child, one GI child — direct lighting is a leaf term). We
expand that tree level-synchronously: level l is a flat SoA batch of shade
tasks (rays + bounce budgets); `_shade_level` traces all tasks, computes the
direct-light term, runs the refraction/TIR chain (an inner while_loop of
FRONT_AND_BACK traces, replacing RefractionRecusive's recursion), samples the
GI lobe, and emits the next level's tasks. A backward sweep then combines
radiance bottom-up, reproducing the reference's per-stage clamp-to-white and
early-out-at-saturation semantics exactly (MtlBlinn.cpp:79-83, 118-131).

RNG is stateless threefry keyed by (chunk, level, purpose, lane) — replacing
the reference's OpenMP-racy rand() (MtlBlinn.cpp:42-49).

Deliberate deviations from the reference, all documented:
  - tree depth is capped at cfg.max_levels (the reference's refraction
    recursion is unbounded — a latent stack overflow);
  - glossy-refraction rejection sampling uses a fixed try count;
  - the plane-shadow frame bug is opt-in (cfg.parity_plane_shadow_bug).
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.ops.camera import CameraParams, camera_basis, from_scene_camera, gen_rays
from bhraytracer_tpu.ops.compact import lookup_rows, partition_indices
from bhraytracer_tpu.ops.linalg import (
    BIG,
    acos_safe,
    safe_pow,
    cross,
    dot,
    norm,
    normalize,
    safe_div,
    safe_sqrt,
)
from bhraytracer_tpu.ops.sampling import (
    crossing_vector,
    sample_along_light_direction,
    sample_along_normal,
    sample_in_semisphere,
)
from bhraytracer_tpu.ops.texturing import (
    sample_background,
    sample_environment,
    textured_color,
)
from bhraytracer_tpu.ops.trace import Surface, resolve_hit, trace_closest, trace_shadow

# numpy (NOT jnp) module constants: a jnp.array at import time initializes
# the device backend, which BLOCKS forever under a dead axon tunnel before
# the CLI can even parse --cpu. As numpy operands they fold into traced
# programs as constants identically.
NAN_PURPLE = np.array([1.0, 0.0, 1.0], np.float32)  # Color::NANPurple (cyColor.h:130)


def _clamp_white(c):
    """ClampColorToWhite (MtlBlinn.cpp:79-83): per-channel min with 1."""
    return jnp.minimum(c, 1.0)


def _tag_trace(x, on: bool):
    """Name discrete trace outputs for the AD remat policy: traversal
    (stop-gradient by design — hit ids have no cotangent) is the expensive
    half of a level's forward, so `_remat_policy` SAVES these few small
    int/bool arrays as residuals and the backward recompute replays only
    the differentiable shading math, never the traversal kernels."""
    if not on:
        return x
    from jax.ad_checkpoint import checkpoint_name

    return jax.tree_util.tree_map(lambda a: checkpoint_name(a, "trace"), x)


def _remat_policy():
    return jax.checkpoint_policies.save_only_these_names("trace")


def _uni(key, tag: int, shape):
    return jax.random.uniform(jax.random.fold_in(key, tag), shape)


class LevelRecord(NamedTuple):
    """Per-task values saved at each tree level for the backward combine.

    Refraction children are COMPACTED: the K = cfg.refr_cap(N) slots hold the
    chain results for the (at most K) refractive lanes; `refr_sel` maps each
    slot to its parent lane and `refr_valid` marks slots holding a real
    candidate. (Round 3 replaced the old parent->slot map `refr_slot` (N,):
    an N-sized scatter to build it plus eight N-sized gathers to consume it
    — XLA:TPU serializes both per element — against ONE K-sized scatter of
    the K-width combine term. Bit-exact: same math, computed per child
    instead of per parent.)"""

    active: jnp.ndarray  # (N,) task holds a real ray
    hit: jnp.ndarray  # (N,)
    z: jnp.ndarray  # (N,) hit parameter (world-scale for unit dirs)
    direct: jnp.ndarray  # (N,3) clamped direct-light term
    gi_albedo: jnp.ndarray  # (N,3) lobe albedo multiplying the GI child
    gi_env: jnp.ndarray  # (N,3) contribution if the GI child misses
    refr_sel: jnp.ndarray  # (K,) i32 parent lane of each slot
    refr_valid: jnp.ndarray  # (K,) bool slot holds a real candidate
    refr_has_child: jnp.ndarray  # (K,)
    refr_mult: jnp.ndarray  # (K,3) tint applied to the refr child's radiance
    refr_absorb: jnp.ndarray  # (K,3) Beer-Lambert coefficient (0 = none)
    refr_env: jnp.ndarray  # (K,3) contribution if the refr child misses
    refr_add: jnp.ndarray  # (K,3) terminal contribution when no child
    # GI-child slot -> parent lane map (G = cfg.gi_cap(N); identity arange
    # when gi_capacity == 1.0, empty (0,) when GI is off at this level).
    gi_sel: jnp.ndarray  # (G,) i32
    gi_valid: jnp.ndarray  # (G,) bool
    # Silent-energy-loss instrumentation (scalars): refraction candidates
    # beyond the K-slot capacity, TIR stragglers beyond the tail width, and
    # live GI lanes beyond the GI-child capacity. All contribute black when
    # nonzero; CI asserts zero on bundled scenes and render_image re-renders
    # affected chunks at full capacity.
    drop_refr: jnp.ndarray  # () i32
    drop_tir: jnp.ndarray  # () i32
    drop_gi: jnp.ndarray  # () i32
    # ACTIVE traced segments at this level (closest hits on live lanes +
    # real shadow queries + live refraction-chain trips) — the honest work
    # count for rays/s benchmarks (static level_sizes over-counts dead lanes).
    segs: jnp.ndarray  # () i32


class Tasks(NamedTuple):
    o: jnp.ndarray  # (N,3)
    d: jnp.ndarray  # (N,3)
    active: jnp.ndarray  # (N,)
    bounce: jnp.ndarray  # (N,) remaining reflect/refract budget


class ChunkStats(NamedTuple):
    """Per-chunk instrumentation scalars (device i32)."""

    drop_refr: jnp.ndarray  # refraction-cap overflow lanes (black bias)
    drop_tir: jnp.ndarray  # TIR-tail overflow lanes (black bias)
    drop_gi: jnp.ndarray  # GI-cap overflow lanes (black bias)
    segments: jnp.ndarray  # ACTIVE traced segments (honest work count)


# ---------------------------------------------------------------------------
# material fetch
# ---------------------------------------------------------------------------


class Mtl(NamedTuple):
    diffuse: jnp.ndarray
    diffuse_tm: jnp.ndarray
    specular: jnp.ndarray
    specular_tm: jnp.ndarray
    gloss: jnp.ndarray
    refraction: jnp.ndarray
    refr_gloss: jnp.ndarray
    ior: jnp.ndarray
    absorption: jnp.ndarray


def _fetch_mtl(pack, mtl_id) -> Mtl:
    # lookup_rows: the material table is tiny and XLA's fused tiny-table
    # gather is ~20x slower than a where-chain/one-hot select (ledger r2).
    i = jnp.clip(mtl_id, 0, pack.mtl_gloss.shape[0] - 1)
    return Mtl(
        diffuse=lookup_rows(pack.mtl_diffuse, i),
        diffuse_tm=lookup_rows(pack.mtl_diffuse_tm, i),
        specular=lookup_rows(pack.mtl_specular, i),
        specular_tm=lookup_rows(pack.mtl_specular_tm, i),
        gloss=lookup_rows(pack.mtl_gloss, i),
        refraction=lookup_rows(pack.mtl_refraction, i),
        refr_gloss=lookup_rows(pack.mtl_refr_gloss, i),
        ior=lookup_rows(pack.mtl_ior, i),
        absorption=lookup_rows(pack.mtl_absorption, i),
    )


# ---------------------------------------------------------------------------
# direct lighting (PathTracing_DiffuseNSpecular, MtlBlinn.cpp:304-351)
# ---------------------------------------------------------------------------


def _select_light(pack, u):
    """One-light selection: first light (ascending-intensity order) whose
    individual share exceeds u, else the last (MtlBlinn.cpp:309-315 — NOT a
    CDF walk; reproduced as-is, including the missing 1/pmf compensation)."""
    gray = jnp.sum(pack.light_intensity, axis=1) / 3.0
    total = jnp.maximum(jnp.sum(gray), 1e-30)
    probs = gray / total
    ok = u[:, None] <= probs[None, :]
    idx = jnp.where(jnp.any(ok, 1), jnp.argmax(ok, 1), pack.light_kind.shape[0] - 1)
    return idx


def _sample_in_light(pack, lidx, surf: Surface, mtl: Mtl, new_spec_color, u):
    """GetSampleInLight (MtlBlinn.cpp:637-695): the shading direction vL.
    u: (N, >=5) uniform columns."""
    n = surf.p.shape[0]
    kind = lookup_rows(pack.light_kind, lidx)
    lvec = lookup_rows(pack.light_vec, lidx)
    lsize = lookup_rows(pack.light_size, lidx)

    kd = jnp.max(mtl.diffuse, axis=1)
    ks = jnp.max(new_spec_color, axis=1)

    vl_c = lvec - surf.p  # hit -> light center
    d_vl, d_cos = sample_along_light_direction(
        normalize(vl_c), mtl.gloss, u[:, 0], u[:, 1]
    )
    p_diffuse = safe_pow(d_cos, mtl.gloss)

    r = u[:, 2]
    big_r = jnp.sqrt(r) * lsize
    th = u[:, 3] * 2.0 * jnp.pi
    a1 = normalize(cross(crossing_vector(vl_c), vl_c))
    a2 = normalize(cross(a1, vl_c))
    s_vl = vl_c + a1 * (big_r * jnp.cos(th))[:, None] + a2 * (big_r * jnp.sin(th))[:, None]
    p_specular = 2.0 * r / jnp.maximum(big_r * big_r, 1e-30)

    pd = kd * p_diffuse
    ps = ks * p_specular
    pd_norm = safe_div(pd, pd + ps)
    use_spec = u[:, 4] >= pd_norm
    use_spec = jnp.where((ks == 0) & (kd != 0), False, use_spec)
    use_spec = jnp.where((ks != 0) & (kd == 0), True, use_spec)
    vl_point = jnp.where(use_spec[:, None], normalize(s_vl), normalize(d_vl))

    # Non-point lights: -Direction(p) (ambient -> zero vector).
    vl_other = jnp.where(
        (kind == 1)[:, None], -normalize(lvec), jnp.zeros_like(lvec)
    )
    return jnp.where((kind == 2)[:, None], vl_point, vl_other)


def _illuminate(pack, cfg: RenderConfig, lidx, p, u, mask, reorder=True):
    """Light::Illuminate with one shadow trace (lights.h:46-64,
    PointLight.cpp:7-18). u: (N, >=2) uniforms. Returns (irradiance (N,3),
    n_shadow () i32 — lanes issuing a real shadow query)."""
    n = p.shape[0]
    kind = lookup_rows(pack.light_kind, lidx)
    lvec = lookup_rows(pack.light_vec, lidx)
    lsize = lookup_rows(pack.light_size, lidx)
    intensity = lookup_rows(pack.light_intensity, lidx)

    center_dir = lvec - p
    rr = dot(center_dir, center_dir)
    sdir = sample_along_normal(center_dir, lsize, u[:, 0], u[:, 1])
    sdir = jnp.where((lsize > 0)[:, None], sdir, center_dir)

    is_point = kind == 2
    is_direct = kind == 1
    shadow_d = jnp.where(is_point[:, None], sdir, -lvec)
    # Lanes that cannot contribute (masked out, or ambient lights) trace a
    # canonical miss ray so reordering retires their tiles.
    cand = mask & (is_point | is_direct)
    shadow_o = jnp.where(cand[:, None], p, _MISS_O)
    shadow_d = jnp.where(cand[:, None], shadow_d, _MISS_D)
    # Non-candidates get t_max = 0: the t-bounded box pruning in the anyhit
    # traversals then retires them at the root test.
    t_max = jnp.where(cand, jnp.where(is_point, 1.0, BIG), 0.0)
    if "shadow" in cfg.ablate:  # instrumentation only (config.py)
        # Data-dependent stub (not a constant — see the trace stub note).
        occ = shadow_o[:, 0] > 1e7
    else:
        occ = _tag_trace(
            trace_shadow(
                pack,
                shadow_o,
                shadow_d,
                t_max,
                cfg.shadow_bias,
                plane_extent_bug=cfg.parity_plane_shadow_bug,
                reorder=reorder,
            ),
            cfg.differentiable,
        )
    vis = jnp.where(occ & (is_point | is_direct) & mask, 0.0, 1.0)

    irr_point = jnp.where(
        (rr == 0.0)[:, None],
        BIG,
        intensity * vis[:, None] / jnp.maximum(rr, 1e-30)[:, None],
    )
    irr_direct = intensity * vis[:, None]
    irr_ambient = intensity
    irr = jnp.where(
        is_point[:, None],
        irr_point,
        jnp.where(is_direct[:, None], irr_direct, irr_ambient),
    )
    return irr, jnp.sum(cand).astype(jnp.int32)


def _direct_light(pack, cfg, surf: Surface, mtl: Mtl, new_spec_color, vn, vv, u, mask,
                  pmap=None, reorder=True):
    n = surf.p.shape[0]
    lidx = _select_light(pack, u[:, 7])
    vl = _sample_in_light(pack, lidx, surf, mtl, new_spec_color, u)
    cos_theta = dot(vl, vn)
    irrad, n_shadow = _illuminate(pack, cfg, lidx, surf.p, u[:, 5:7],
                                  mask & (cos_theta > 0), reorder=reorder)
    vh = normalize(vl + vv)
    diff = textured_color(
        pack, mtl.diffuse, mtl.diffuse_tm, surf.uvw, surf.duvw, taps=cfg.texture_sample_count
    )
    spec = textured_color(
        pack, new_spec_color, mtl.specular_tm, surf.uvw, surf.duvw, taps=cfg.texture_sample_count
    )
    hn = jnp.maximum(dot(vh, vn), 0.0)
    brdf_cos = diff * cos_theta[:, None] + spec * safe_pow(hn, mtl.gloss)[:, None]
    out = jnp.where((cos_theta > 0)[:, None], irrad * brdf_cos, 0.0)

    if pmap is not None:
        # Caustic photon gather added to the direct term (MtlBlinn.cpp:329-342).
        from bhraytracer_tpu.models.photonmap import gather_irradiance

        c_irr, c_vl = gather_irradiance(pmap, surf.p, vn,
                                        k=cfg.photon_gather_max)
        c_cos = -dot(c_vl, vn)
        c_hn = jnp.maximum(dot(normalize(c_vl + vv), vn), 0.0)
        c_brdf = diff + spec * (
            safe_pow(c_hn, mtl.gloss) / jnp.maximum(c_cos, 1e-30)
        )[:, None]
        out = out + jnp.where((c_cos > 0)[:, None], c_brdf * c_irr, 0.0)

    out = _clamp_white(out)
    # NaN in direct -> black (MtlBlinn.cpp:344-347).
    out = jnp.where(jnp.isnan(out[:, 0:1]), 0.0, out)
    return out, n_shadow


# ---------------------------------------------------------------------------
# GI lobe (PathTracing_GlobalIllumination, MtlBlinn.cpp:354-433)
# ---------------------------------------------------------------------------


def _gi_sample(pack, cfg, surf, mtl: Mtl, new_spec_color, vn, vv, u):
    n = surf.p.shape[0]
    kd = jnp.max(mtl.diffuse, axis=1)
    ks = jnp.max(new_spec_color, axis=1)

    d_dir, p_dt = sample_in_semisphere(vn, u[:, 0], u[:, 1])
    d_dir = normalize(d_dir)

    vr = 2.0 * dot(vn, vv, keepdims=True) * vn - vv
    s_dir, s_cos = sample_along_light_direction(vr, mtl.gloss, u[:, 2], u[:, 3])
    p_st = safe_pow(s_cos, mtl.gloss)

    pd_norm = safe_div(kd * p_dt, kd * p_dt + ks * p_st)
    use_spec = u[:, 4] >= pd_norm
    gi_dir = jnp.where(use_spec[:, None], s_dir, d_dir)  # spec dir unnormalized
    gi_o = surf.p + vn * cfg.bias

    diff = textured_color(
        pack, mtl.diffuse, mtl.diffuse_tm, surf.uvw, surf.duvw, taps=cfg.texture_sample_count
    )
    spec = textured_color(
        pack, new_spec_color, mtl.specular_tm, surf.uvw, surf.duvw, taps=cfg.texture_sample_count
    )
    albedo = jnp.where(use_spec[:, None], spec, diff)

    env, env_valid = sample_environment(pack, gi_dir)
    env_term = jnp.where(env_valid[:, None], env * albedo, 0.0)
    # Degenerate-direction sentinel (MtlBlinn.cpp:411-414).
    degen = (gi_dir[:, 0] == gi_dir[:, 1]) & (gi_dir[:, 0] == 0.0)
    env_term = jnp.where(degen[:, None], NAN_PURPLE, env_term)
    return gi_o, gi_dir, albedo, env_term


# ---------------------------------------------------------------------------
# refraction / TIR chain (PathTracing_Refraction + RefractionRecusive +
# HandleRayWhenRefractionRayOut, MtlBlinn.cpp:437-589)
# ---------------------------------------------------------------------------

_CASE_NONE = 0  # no refraction / budget exhausted -> black
_CASE_FRONT = 1  # chain hit a front face: child Shade of that hit, no tint
_CASE_OUT = 2  # exited the medium: child Shade tinted by refr * absorption
_CASE_MISS = 3  # inner trace escaped the scene -> NANPurple sentinel


def _glossy_refr_dir(vt, vn, rgloss, key, tag, want_negative: bool, tries: int):
    """Fixed-try rejection resampling of the refraction direction
    (MtlBlinn.cpp:454-465, 560-572). Falls back to the perfect direction."""
    n = vt.shape[0]
    chosen = normalize(vt)
    found = jnp.zeros((n,), bool)
    for k in range(tries):
        cand, _ = sample_along_light_direction(
            vt, rgloss, _uni(key, tag + 2 * k, (n,)), _uni(key, tag + 2 * k + 1, (n,))
        )
        sign = dot(cand, vn)
        ok = (sign < 0.0) if want_negative else (sign > 0.0)
        take = ok & ~found
        chosen = jnp.where(take[:, None], normalize(cand), chosen)
        found = found | ok
    use = rgloss > 0.0
    return jnp.where((use & found)[:, None], chosen, jnp.where(use[:, None], normalize(vt), normalize(vt)))


def _refraction_chain(pack, cfg, surf, mtl: Mtl, vn, vv, cos_phi1, refr_eff,
                      active, bounce, key, reorder: bool = True):
    """Run the enter/TIR/exit chain. Returns (case, child_o, child_d,
    bounce_left)."""
    n = surf.p.shape[0]

    # --- entry refraction direction (MtlBlinn.cpp:443-465) ---
    sin1 = safe_sqrt(1.0 - cos_phi1 * cos_phi1)
    sin2 = sin1 / jnp.maximum(mtl.ior, 1e-6)
    cos2 = safe_sqrt(1.0 - sin2 * sin2)
    vtn = -cos2[:, None] * vn
    vnxv = cross(vn, vv)
    vtp = normalize(cross(vn, vnxv)) * sin2[:, None]
    vt = vtn + vtp
    # Effective refraction glossiness: the Blinn glossiness when > 50, else 0
    # (MtlBlinn.cpp:115-116) — the material's refractionGlossiness is unused
    # by Shade, a reference quirk kept here.
    rgloss = jnp.where(mtl.gloss > 50.0, mtl.gloss, 0.0)
    vt = _glossy_refr_dir(vt, vn, rgloss, key, 20, True, cfg.refr_gloss_tries)

    has_refr = jnp.any(refr_eff != 0.0, axis=1)  # !refraction.IsBlack()
    chain_active = active & has_refr & (bounce > 0)

    state = dict(
        p=surf.p,
        nrm=vn,
        d=vt,
        bounce=bounce,
        settled=~chain_active,
        case=jnp.zeros((n,), jnp.int32),
        out_o=surf.p,
        out_d=vt,
        it=jnp.zeros((), jnp.int32),
        segs=jnp.zeros((), jnp.int32),
    )

    def cond(s):
        return jnp.any(~s["settled"])

    def make_body(ior_arr, rgloss_arr):
      def body(s):
        live = ~s["settled"]
        # Settled lanes would otherwise keep re-tracing their last real ray.
        ray_o = jnp.where(live[:, None], s["p"] - s["nrm"] * cfg.bias, _MISS_O)
        ray_d = jnp.where(live[:, None], s["d"], _MISS_D)
        hit = _tag_trace(
            trace_closest(pack, ray_o, ray_d, "both", reorder=reorder),
            cfg.differentiable)
        sres = resolve_hit(pack, ray_o, ray_d, hit, jnp.zeros(3), jnp.zeros(3),
                           minimal=True, fast_rows=True)

        # miss -> NANPurple sentinel (RefractionRecusive else-branch :514-518)
        miss = live & ~hit.hit
        # front face -> child Shade of this ray (RefractionRecusive :507-510)
        front_hit = live & hit.hit & hit.front

        # back face: exit or TIR (HandleRayWhenRefractionRayOut :543-589)
        back_hit = live & hit.hit & ~hit.front
        vn2 = sres.n
        vv2 = -normalize(ray_d)
        c1 = dot(vv2, -vn2)
        s1 = safe_sqrt(1.0 - c1 * c1)
        s2 = ior_arr * s1
        going_out = s2 <= 1.0
        c2 = safe_sqrt(1.0 - s2 * s2)
        vtn2 = vn2 * c2[:, None]
        vtp2 = normalize(cross(vn2, cross(vn2, vv2))) * s2[:, None]
        vt2 = vtn2 + vtp2
        kk = jax.random.fold_in(key, 40)
        kk = jax.random.fold_in(kk, s["it"])
        vt2 = _glossy_refr_dir(vt2, vn2, rgloss_arr, kk, 0, False, cfg.refr_gloss_tries)
        out_o = sres.p + vn2 * cfg.bias
        # internal reflection: vR = -2 cos1 vN - vV (:582)
        vr = -2.0 * c1[:, None] * vn2 - vv2
        exhausted = s["bounce"] <= 0

        exit_now = back_hit & going_out
        tir = back_hit & ~going_out & ~exhausted
        dead = back_hit & ~going_out & exhausted

        case = s["case"]
        case = jnp.where(miss, _CASE_MISS, case)
        case = jnp.where(front_hit, _CASE_FRONT, case)
        case = jnp.where(exit_now, _CASE_OUT, case)
        case = jnp.where(dead, _CASE_NONE, case)

        new_out_o = jnp.where(
            front_hit[:, None], ray_o, jnp.where(exit_now[:, None], out_o, s["out_o"])
        )
        new_out_d = jnp.where(
            front_hit[:, None],
            ray_d,
            jnp.where(exit_now[:, None], normalize(vt2), s["out_d"]),
        )
        return dict(
            p=jnp.where(tir[:, None], sres.p, s["p"]),
            nrm=jnp.where(tir[:, None], vn2, s["nrm"]),
            d=jnp.where(tir[:, None], vr, s["d"]),
            bounce=jnp.where(tir, s["bounce"] - 1, s["bounce"]),
            settled=s["settled"] | miss | front_hit | exit_now | dead,
            case=case,
            out_o=new_out_o,
            out_d=new_out_d,
            it=s["it"] + 1,
            segs=s["segs"] + jnp.sum(live).astype(jnp.int32),
        )

      return body

    body = make_body(mtl.ior, rgloss)

    zero = jnp.zeros((), jnp.int32)
    if cfg.differentiable:
        # Fixed-trip scans: reverse-mode AD cannot cross while_loop. The body
        # is a fixpoint (settled lanes no-op), so extra trips are exact.
        # Two-stage like inference (round-5): the old single scan paid
        # tir_bounces+1 trips at FULL K width — most lanes settle on trip 1,
        # so the tail re-compacts stragglers to k2 width (gather/scatter are
        # linear, AD-transparent; the partition ids are stop-gradient ints).
        # Same drop accounting as the inference chain.
        body_d = (jax.checkpoint(body, policy=_remat_policy())
                  if cfg.remat_levels else body)

        def scan_body(s, _):
            return jax.lax.cond(jnp.any(~s["settled"]), body_d, lambda x: x, s), None

        total_trips = cfg.tir_bounces + 1
        head = min(cfg.tir_head_trips, total_trips)
        k2 = max(128, -(-n // cfg.tir_tail_divisor) // 128 * 128)
        if not (cfg.tir_tail_compaction and k2 < n and head < total_trips):
            state, _ = jax.lax.scan(scan_body, state, None, length=total_trips)
            return (state["case"], state["out_o"], state["out_d"],
                    state["bounce"], zero, state["segs"])
        state, _ = jax.lax.scan(scan_body, state, None, length=head)
        unsettled = ~state["settled"]
        sel = partition_indices(jax.lax.stop_gradient(unsettled), k2)
        sel_valid = unsettled[sel]
        sub = {k_: state[k_][sel] for k_ in
               ("p", "nrm", "d", "bounce", "case", "out_o", "out_d")}
        sub["settled"] = ~sel_valid
        sub["it"] = state["it"]
        sub["segs"] = state["segs"]
        body2 = make_body(mtl.ior[sel], rgloss[sel])
        body2_d = (jax.checkpoint(body2, policy=_remat_policy())
                   if cfg.remat_levels else body2)

        def scan_body2(s, _):
            return jax.lax.cond(jnp.any(~s["settled"]), body2_d,
                                lambda x: x, s), None

        sub, _ = jax.lax.scan(scan_body2, sub, None,
                              length=total_trips - head)
        for k_ in ("case", "bounce"):
            state[k_] = state[k_].at[sel].set(
                jnp.where(sel_valid, sub[k_], state[k_][sel]))
        for k_ in ("out_o", "out_d"):
            state[k_] = state[k_].at[sel].set(
                jnp.where(sel_valid[:, None], sub[k_], state[k_][sel]))
        dropped = (jnp.sum(unsettled) - jnp.sum(sel_valid)).astype(jnp.int32)
        return (state["case"], state["out_o"], state["out_d"],
                state["bounce"], dropped, sub["segs"])

    # Two-stage chain: most lanes settle within the first few trips (exit or
    # early TIR); the long TIR tail re-compacts the stragglers to a quarter
    # width so late iterations don't pay full-width traces. Stragglers
    # beyond the tail capacity contribute black (same bias family as the
    # refraction-child capacity; the reference's recursion has no cap).
    head = min(cfg.tir_head_trips, cfg.tir_bounces + 1)

    def cond_head(s):
        return jnp.any(~s["settled"]) & (s["it"] < head)

    state = jax.lax.while_loop(cond_head, body, state)

    k2 = max(128, -(-n // cfg.tir_tail_divisor) // 128 * 128)
    if cfg.tir_tail_compaction and k2 < n:
        unsettled = ~state["settled"]
        sel = partition_indices(unsettled, k2)  # unsettled first
        sel_valid = unsettled[sel]
        sub = {k_: state[k_][sel] for k_ in
               ("p", "nrm", "d", "bounce", "case", "out_o", "out_d")}
        sub["settled"] = ~sel_valid
        sub["it"] = state["it"]
        sub["segs"] = state["segs"]
        body2 = make_body(mtl.ior[sel], rgloss[sel])
        sub = jax.lax.while_loop(cond, body2, sub)
        for k_ in ("case", "bounce"):
            state[k_] = state[k_].at[sel].set(
                jnp.where(sel_valid, sub[k_], state[k_][sel])
            )
        for k_ in ("out_o", "out_d"):
            state[k_] = state[k_].at[sel].set(
                jnp.where(sel_valid[:, None], sub[k_], state[k_][sel])
            )
        # Unsettled lanes that didn't fit keep case NONE -> black: COUNTED.
        dropped = (jnp.sum(unsettled) - jnp.sum(sel_valid)).astype(jnp.int32)
        segs = sub["segs"]
    else:
        state = jax.lax.while_loop(cond, body, state)
        dropped = zero
        segs = state["segs"]
    return (state["case"], state["out_o"], state["out_d"], state["bounce"],
            dropped, segs)


# ---------------------------------------------------------------------------
# one tree level
# ---------------------------------------------------------------------------


_MISS_O = np.array([1.0e8, 1.0e8, 1.0e8], np.float32)
_MISS_D = np.array([0.0, 0.0, 1.0], np.float32)


def _shade_level(
    pack, cfg: RenderConfig, tasks: Tasks, level: int, key, dd_x, dd_y, pmap=None
) -> Tuple[LevelRecord, Tasks, Surface]:
    n = tasks.o.shape[0]
    if cfg.differentiable and pack.face_v.shape[0]:
        # AD path: swap in an in-jit rebuild of the packed resolve rows so
        # the fast one-row-gather resolve works under reverse mode with
        # vertex/normal/uv gradients intact (rows_from_pools). Bit-identical
        # values; F-sized, traced once per program.
        from bhraytracer_tpu.ops.trace import rows_from_pools

        pack = dataclasses.replace(pack, resolve_rows=rows_from_pools(pack))
    # Inactive lanes carry stale rays that would still pay full traversal:
    # route them to a canonical miss ray so coherence reordering clusters
    # them into instantly-retired tiles.
    act = tasks.active[:, None]
    tasks = tasks._replace(
        o=jnp.where(act, tasks.o, _MISS_O),
        d=jnp.where(act, tasks.d, _MISS_D),
    )
    # Instrumentation-only component stubs (cfg.ablate; see config.py).
    abl = set(cfg.ablate.split(",")) if cfg.ablate else set()

    # Once-per-level coherence presort (cfg.level_presort): pay ONE argsort
    # + ONE inverse-permutation scatter here, then run every trace in the
    # level reorder=False. Per-lane uniforms (u_tab) are drawn in the
    # ORIGINAL lane order and permuted alongside the tasks, so each task
    # keeps its RNG stream; only the chain's slot-keyed glossy-refraction
    # draws pair differently (see config.py).
    presort = (cfg.level_presort and level != 0 and "reorder" not in abl
               and "trace" not in abl)
    perm = inv = None
    if presort:
        from bhraytracer_tpu.ops.compact import inverse_permutation
        from bhraytracer_tpu.ops.trace import coherence_perm

        perm = coherence_perm(pack, tasks.o, tasks.d, tasks.active)
        inv = inverse_permutation(perm)
        tasks = Tasks(o=tasks.o[perm], d=tasks.d[perm],
                      active=tasks.active[perm], bounce=tasks.bounce[perm])

    # Level-0 camera rays arrive in scanline order — already coherent, so
    # the packet kernels' reorder sort would only cost there.
    if "trace" in abl:
        from bhraytracer_tpu.ops.trace import Hit as _Hit

        # Data-dependent stub: constant hit fields let XLA constant-fold
        # large parts of the downstream shading, so the ablation delta
        # overstates trace cost (this round's 480K sweep read -385ms with
        # constants; the kernel-swap variants reading +-0 exposed it). Cheap
        # unfoldable values keep downstream work honest.
        tt = 5.0 + tasks.o[:, 0] * 1e-7 + tasks.d[:, 1] * 1e-7
        lane = jax.lax.iota(jnp.int32, n)
        hit = _Hit(t=tt, kind=jnp.zeros((n,), jnp.int32),
                   inst=lane & 1,
                   face=jnp.full((n,), -1, jnp.int32) + (lane & 0),
                   front=(lane & 1) == 0, hit=tt > 0.0)
    else:
        hit = _tag_trace(
            trace_closest(pack, tasks.o, tasks.d, "front",
                          reorder=(level != 0 or cfg.level0_reorder)
                          and cfg.closest_reorder
                          and not presort and "reorder" not in abl),
            cfg.differentiable)
    shade = tasks.active & hit.hit

    # --- per-level uniforms in ONE threefry call (30 scattered
    # fold_in+uniform calls were a measurable cost) ---
    if "rng" in abl:
        # Data-dependent stub (see the trace stub above): a constant 0.5
        # table constant-folds the samplers downstream and overstates the
        # threefry cost. One cheap integer hash per entry is unfoldable.
        lane = jax.lax.iota(jnp.uint32, n)[:, None]
        col = jax.lax.iota(jnp.uint32, 13)[None, :]
        h = lane * jnp.uint32(2654435761) + col * jnp.uint32(40503) + jnp.uint32(level)
        h = h ^ (h >> 13)
        u_tab = (h >> 8).astype(jnp.float32) * (1.0 / (1 << 24))
    else:
        u_tab = jax.random.uniform(jax.random.fold_in(key, 1), (n, 13))
        if presort:
            u_tab = u_tab[perm]

    from bhraytracer_tpu.ops.trace import _pallas_enabled
    from bhraytracer_tpu.ops.pallas_shade import shade_setup, shade_setup_supported

    use_fused = (not abl) and _pallas_enabled() and shade_setup_supported(
        pack, cfg, pmap)
    if use_fused:
        # Fused shade-setup kernel: resolve + Fresnel + light sampling +
        # BRDF + GI lobe in one VMEM pass (ops/pallas_shade.py); only the
        # shadow trace and its visibility fold stay outside.
        fo = shade_setup(pack, cfg, tasks.o, tasks.d, hit, shade, u_tab)
        surf = Surface(p=fo.p, n=fo.n, uvw=jnp.zeros((n, 3)),
                       duvw=jnp.zeros((n, 2, 3)), mtl=fo.mtl, z=fo.z,
                       front=hit.front)
        vn, cos_phi1, refr_eff = fo.n, fo.cos_phi1, fo.refr_eff
        occ = trace_shadow(pack, fo.shadow_o, fo.shadow_d, fo.shadow_tmax,
                           cfg.shadow_bias,
                           plane_extent_bug=cfg.parity_plane_shadow_bug,
                           reorder=(level != 0 or cfg.level0_reorder)
                           and cfg.shadow_reorder
                           and not presort and "reorder" not in abl)
        vis = jnp.where(occ & fo.gate, 0.0, 1.0)
        # The point-light r^2 == 0 branch returns BIG regardless of
        # visibility (_illuminate's where order).
        irr = fo.irr * jnp.where(fo.rr0, 1.0, vis)[:, None]
        direct = jnp.where((fo.cos_theta > 0.0)[:, None],
                           irr * fo.brdf_cos, 0.0)
        direct = _clamp_white(direct)
        direct = jnp.where(jnp.isnan(direct[:, 0:1]), 0.0, direct)
        n_shadow = jnp.sum(fo.gate).astype(jnp.int32)
    else:
        if "resolve" in abl:
            # Synthetic surface without the packed-row gather (timing only).
            # mtl is a cheap data-dependent id (a constant would fold the
            # whole material/chain pipeline away — see the trace stub note).
            dn = normalize(tasks.d)
            mtl_stub = jax.lax.iota(jnp.int32, n) % pack.mtl_gloss.shape[0]
            surf = Surface(p=tasks.o + tasks.d, n=-dn, uvw=jnp.zeros((n, 3)),
                           duvw=jnp.zeros((n, 2, 3)),
                           mtl=mtl_stub, z=hit.t,
                           front=hit.front)
        else:
            surf = resolve_hit(pack, tasks.o, tasks.d, hit, dd_x, dd_y,
                               fast_rows=True)

        mtl = _fetch_mtl(pack, surf.mtl)
        vn = surf.n
        vv = normalize(tasks.o - surf.p)
        cos_phi1 = jnp.clip(dot(vn, vv), 0.0, 1.0)

        # Schlick Fresnel into the specular color (MtlBlinn.cpp:107-114).
        r0_base = (1.0 - mtl.ior) / (1.0 + mtl.ior)
        r0 = r0_base * r0_base
        fres = r0 + (1.0 - r0) * safe_pow(1.0 - cos_phi1, 5.0)
        new_spec_color = _clamp_white(mtl.specular + fres[:, None] * mtl.refraction)
        refr_eff = (1.0 - fres)[:, None] * mtl.refraction

        # --- direct light ---
        if "direct" in abl:
            direct = jnp.zeros((n, 3))
            n_shadow = jnp.zeros((), jnp.int32)
        else:
            direct, n_shadow = _direct_light(
                pack, cfg, surf, mtl, new_spec_color, vn, vv, u_tab[:, :8],
                shade, pmap=pmap,
                reorder=(level != 0 or cfg.level0_reorder)
                and cfg.shadow_reorder
                and not presort and "reorder" not in abl,
            )

    # --- refraction chain on COMPACTED refractive lanes ---
    # The recursive reference expands every refractive hit; here candidates
    # are gathered into K slots so the (expensive, multi-trace) TIR chain
    # and the next level's refraction children stay narrow.
    has_refr = jnp.any(refr_eff != 0.0, axis=1)  # !refraction.IsBlack()
    chain_cand = shade & has_refr & (tasks.bounce > 0)
    k_cap = cfg.refr_cap(n)
    if "compact" in abl:  # timing only: identity slots, no partition scan
        sel = jnp.arange(k_cap, dtype=jnp.int32)
    elif presort:
        # Partition over the ORIGINAL lane order (mask unsorted through
        # inv), composed back into sorted space: slot j then holds the SAME
        # original-lane candidate as the unsorted partition would give, so
        # child slot order — and every slot-positional RNG draw downstream
        # (next level's u_tab rows, the chain's glossy-refraction draws) —
        # is bit-identical to the non-presorted path.
        sel = inv[partition_indices(chain_cand[inv], k_cap)]
    else:
        sel = partition_indices(chain_cand, k_cap)  # candidates first
    sel_valid = chain_cand[sel]

    def g(x):
        return x[sel]

    surf_k = Surface(*[g(f) for f in surf])
    if use_fused:
        # The kernel already consumed the full-width material row; the chain
        # re-fetches it at K width (same table, same ids).
        mtl_k = _fetch_mtl(pack, surf_k.mtl)
        vv_k = normalize(g(tasks.o) - surf_k.p)
    else:
        mtl_k = Mtl(*[g(f) for f in mtl])
        vv_k = g(vv)
    if "chain" in abl:
        case = jnp.zeros((k_cap,), jnp.int32)
        ro, rd = surf_k.p, vv_k
        bounce_left = g(tasks.bounce)
        drop_tir = jnp.zeros((), jnp.int32)
        chain_segs = jnp.zeros((), jnp.int32)
    else:
        case, ro, rd, bounce_left, drop_tir, chain_segs = _refraction_chain(
            pack, cfg, surf_k, mtl_k, g(vn), vv_k, g(cos_phi1), g(refr_eff),
            sel_valid, g(tasks.bounce), jax.random.fold_in(key, 2),
            reorder=cfg.chain_reorder and not presort
            and "reorder" not in abl,
        )
    drop_refr = (jnp.sum(chain_cand) - jnp.sum(sel_valid)).astype(jnp.int32)
    segs = jnp.sum(tasks.active).astype(jnp.int32) + n_shadow + chain_segs
    refr_has_child = ((case == _CASE_FRONT) | (case == _CASE_OUT)) & sel_valid
    is_out = (case == _CASE_OUT)[:, None]
    refr_mult = jnp.where(is_out, g(refr_eff), 1.0)
    refr_absorb = jnp.where(is_out, mtl_k.absorption, 0.0)
    env_r, env_r_valid = sample_environment(pack, rd)
    refr_env = jnp.where(env_r_valid[:, None], refr_mult * env_r, 0.0)
    refr_add = jnp.where((case == _CASE_MISS)[:, None], NAN_PURPLE, 0.0)

    # --- GI lobe ---
    gi_on = cfg.gi_active(level)
    drop_gi = jnp.zeros((), jnp.int32)
    if gi_on:
        if use_fused:
            gi_o, gi_d, gi_albedo = fo.gi_o, fo.gi_d, fo.gi_albedo
            env, env_valid = sample_environment(pack, gi_d)
            gi_env = jnp.where(env_valid[:, None], env * gi_albedo, 0.0)
            degen = (gi_d[:, 0] == gi_d[:, 1]) & (gi_d[:, 0] == 0.0)
            gi_env = jnp.where(degen[:, None], NAN_PURPLE, gi_env)
        elif "gi" in abl:
            gi_o, gi_d = surf.p, vn
            gi_albedo = jnp.zeros((n, 3))
            gi_env = jnp.zeros((n, 3))
        else:
            gi_o, gi_d, gi_albedo, gi_env = _gi_sample(
                pack, cfg, surf, mtl, new_spec_color, vn, vv, u_tab[:, 8:13]
            )
        g_cap = cfg.gi_cap(n)
        if g_cap < n:
            # Compact live GI children (shade lanes) into g_cap slots, like
            # the refraction chain above: missed/inactive lanes need no GI
            # subtree, so open scenes stop paying full width per level.
            sel_g = (inv[partition_indices(shade[inv], g_cap)]
                     if presort else partition_indices(shade, g_cap))
            sel_g_valid = shade[sel_g]
            drop_gi = (jnp.sum(shade) - jnp.sum(sel_g_valid)).astype(jnp.int32)
            gi_children = Tasks(
                o=gi_o[sel_g], d=gi_d[sel_g], active=sel_g_valid,
                bounce=tasks.bounce[sel_g],
            )
        else:
            # Full width: identity mapping, bit-identical to the
            # uncompacted layout (RNG streams are positional). The combine
            # detects g_cap == n statically and uses child rows in place
            # (no gather, no scatter).
            sel_g = jnp.arange(n, dtype=jnp.int32)
            sel_g_valid = shade
            gi_children = Tasks(o=gi_o, d=gi_d, active=shade,
                                bounce=tasks.bounce)
    else:
        gi_albedo = jnp.zeros((n, 3))
        gi_env = jnp.zeros((n, 3))
        sel_g = jnp.zeros((0,), jnp.int32)
        sel_g_valid = jnp.zeros((0,), bool)

    active_rec, hit_rec, z_rec = tasks.active, hit.hit, surf.z
    if presort:
        # Back to the ORIGINAL task order: N-wide level outputs gather
        # through the inverse permutation (cheap — bulk gathers vectorize);
        # K-slot refraction / G-slot GI values stay in slot space with
        # their parent-lane maps composed through the forward permutation.
        # `surf` stays sorted — callers only consume surf at level 0, which
        # never presorts.
        active_rec, hit_rec, z_rec = (tasks.active[inv], hit.hit[inv],
                                      surf.z[inv])
        direct = direct[inv]
        gi_albedo = gi_albedo[inv]
        gi_env = gi_env[inv]
        sel = perm[sel]
        if gi_on:
            if sel_g.shape[0] == n:
                # Identity GI mapping: child row == parent lane; unsort the
                # children so the alignment holds in original space.
                gi_children = Tasks(o=gi_children.o[inv],
                                    d=gi_children.d[inv],
                                    active=gi_children.active[inv],
                                    bounce=gi_children.bounce[inv])
                sel_g_valid = gi_children.active
            else:
                sel_g = perm[sel_g]

    rec = LevelRecord(
        active=active_rec,
        hit=hit_rec,
        z=z_rec,
        direct=direct,
        gi_albedo=gi_albedo,
        gi_env=gi_env,
        refr_sel=sel,
        refr_valid=sel_valid,
        refr_has_child=refr_has_child,
        refr_mult=refr_mult,
        refr_absorb=refr_absorb,
        refr_env=refr_env,
        refr_add=refr_add,
        gi_sel=sel_g,
        gi_valid=sel_g_valid,
        drop_refr=drop_refr,
        drop_tir=drop_tir,
        drop_gi=drop_gi,
        segs=segs,
    )

    # --- children: [compacted gi children (G)] ++ [compacted refr (K)] ---
    refr_children = Tasks(o=ro, d=rd, active=refr_has_child, bounce=bounce_left)
    if gi_on:
        children = Tasks(
            o=jnp.concatenate([gi_children.o, refr_children.o]),
            d=jnp.concatenate([gi_children.d, refr_children.d]),
            active=jnp.concatenate([gi_children.active, refr_children.active]),
            bounce=jnp.concatenate([gi_children.bounce, refr_children.bounce]),
        )
    else:
        children = refr_children
    return rec, children, surf


def _combine_level(
    cfg: RenderConfig,
    level: int,
    rec: LevelRecord,
    child_rad,
    child_z,
    child_hit,
):
    """Backward combine: Shade's stage sums with clamp + early-out semantics
    (MtlBlinn.cpp:117-131). Children arrive as [gi (G)] ++ [refr (K)].

    Both child terms are combined at CHILD width and routed to parents with
    one child-width scatter (or, for the identity GI mapping, no routing at
    all). The old parent->slot maps cost an N-sized scatter to build plus
    nine N-sized gathers to consume — XLA:TPU serializes both per element
    (round-3 ledger). Same math per child, bit-exact parent results."""
    n = rec.active.shape[0]
    gi_on = cfg.gi_active(level)
    if gi_on:
        g_cap = cfg.gi_cap(n)
        r_rad, r_z, r_hit = (child_rad[g_cap:], child_z[g_cap:],
                             child_hit[g_cap:])
    else:
        r_rad, r_z, r_hit = child_rad, child_z, child_hit

    # --- refraction term at K width, scattered to parent lanes ---
    absorb = jnp.exp(-rec.refr_absorb * r_z[:, None])
    refr_k = jnp.where(
        rec.refr_has_child[:, None],
        jnp.where(
            r_hit[:, None],
            _clamp_white(rec.refr_mult * absorb * r_rad),
            _clamp_white(rec.refr_env),
        ),
        _clamp_white(rec.refr_add),
    )
    refr_k = jnp.where(rec.refr_valid[:, None], refr_k, 0.0)
    out = jnp.zeros((n, 3)).at[rec.refr_sel].set(refr_k, mode="drop")
    sat = jnp.all(out >= 1.0, axis=1)

    if gi_on:
        # Slots whose child missed (or was dead) take the environment
        # term; dropped live lanes beyond capacity keep their env default
        # below — counted in drop_gi and recovered by the adaptive
        # re-render.
        g_rad, g_z, g_hit = (child_rad[:g_cap], child_z[:g_cap],
                             child_hit[:g_cap])
        if g_cap == n:
            # Identity mapping (gi_capacity == 1.0): child row == parent
            # lane; no gather, no scatter.
            albedo_g, env_g, hit_g = rec.gi_albedo, rec.gi_env, g_hit
        else:
            albedo_g = rec.gi_albedo[rec.gi_sel]
            env_g = rec.gi_env[rec.gi_sel]
            hit_g = g_hit & rec.gi_valid
        gi_hit_term = jnp.where(
            (hit_g & (g_z > cfg.bias))[:, None], g_rad * albedo_g, 0.0
        )
        gi_g = jnp.where(hit_g[:, None], gi_hit_term, env_g)
        gi_g = jnp.where(jnp.isnan(gi_g[:, 0:1]), NAN_PURPLE, gi_g)
        gi_g = _clamp_white(gi_g)
        if g_cap == n:
            gi = gi_g
        else:
            # Parents without a slot keep their environment term (the
            # no-child path the old slot map produced), with the same
            # NaN-sentinel + clamp transforms applied at parent width.
            env_full = jnp.where(jnp.isnan(rec.gi_env[:, 0:1]), NAN_PURPLE,
                                 rec.gi_env)
            env_full = _clamp_white(env_full)
            gi = env_full.at[rec.gi_sel].set(gi_g, mode="drop")
        out = out + jnp.where(sat[:, None], 0.0, gi)
        sat = jnp.all(out >= 1.0, axis=1)

    out = out + jnp.where(sat[:, None], 0.0, rec.direct)
    out = jnp.where(jnp.isnan(out[:, 0:1]), NAN_PURPLE, out)
    return jnp.where((rec.active & rec.hit)[:, None], out, 0.0)


# ---------------------------------------------------------------------------
# full radiance for a batch of camera rays
# ---------------------------------------------------------------------------


def trace_radiance(pack, cfg: RenderConfig, o, d, bg_uv, key, dd_x, dd_y, pmap=None):
    """Radiance for camera rays (o, d) with per-pixel background uv
    (Main.cpp:158-168). Returns (rad (N,3), z0 (N,), ChunkStats) — stats are
    summed over the shade tree."""
    n = o.shape[0]
    tasks = Tasks(
        o=o,
        d=d,
        active=jnp.ones((n,), bool),
        bounce=jnp.full((n,), cfg.tir_bounces, jnp.int32),
    )
    recs = []
    for level in range(cfg.max_levels):
        if cfg.differentiable and cfg.remat_levels:
            # Per-level rematerialization: backward recomputes this level's
            # forward instead of keeping its traversal/shading intermediates
            # alive across the whole tree (VERDICT r1 #7 — the 24x18 FD toy
            # ceiling was reverse-mode memory, not compute).
            def shade(pk, ts, k, dx, dy, _level=level):
                return _shade_level(pk, cfg, ts, _level, k, dx, dy, pmap=pmap)

            rec, tasks, _ = jax.checkpoint(shade, policy=_remat_policy())(
                pack, tasks, jax.random.fold_in(key, 100 + level), dd_x, dd_y
            )
        else:
            rec, tasks, _ = _shade_level(
                pack, cfg, tasks, level, jax.random.fold_in(key, 100 + level),
                dd_x, dd_y, pmap=pmap,
            )
        recs.append(rec)

    # Unexpanded tail: children of the last level contribute black.
    child_rad = _combine_tree(cfg, tuple(recs), tasks.active)

    bg = sample_background(pack, bg_uv)
    rad = jnp.where(recs[0].hit[:, None], child_rad, bg)
    # Aux buffers (RenderImage z-buffer etc., scene.h:532-536): primary z.
    z0 = jnp.where(recs[0].hit, recs[0].z, BIG)
    stats = ChunkStats(
        drop_refr=sum(r.drop_refr for r in recs),
        drop_tir=sum(r.drop_tir for r in recs),
        drop_gi=sum(r.drop_gi for r in recs),
        segments=sum(r.segs for r in recs),
    )
    return rad, z0, stats


# ---------------------------------------------------------------------------
# image rendering driver
# ---------------------------------------------------------------------------


def _render_chunk(pack, cfg: RenderConfig, cam: CameraParams, width, height, px, py, key,
                  pmap=None):
    """Radiance for one chunk of (pixel, sample) lanes. px/py: (N,)."""
    n = px.shape[0]
    u = jax.random.uniform(jax.random.fold_in(key, 0),
                           (n, 4 if cfg.use_dof else 2))
    o, d = gen_rays(cam, width, height, px, py, u)
    _, dd_x, dd_y = camera_basis(cam, width, height)
    bg_uv = jnp.stack(
        [px.astype(jnp.float32) / width, py.astype(jnp.float32) / height, jnp.zeros(n)],
        -1,
    )
    rad, z0, stats = trace_radiance(
        pack, cfg, o, d, bg_uv, jax.random.fold_in(key, 1), dd_x, dd_y, pmap=pmap
    )
    return rad, z0, stats


_render_chunk_jit = jax.jit(
    _render_chunk, static_argnames=("cfg", "width", "height")
)




# --- staged (per-level jit) inference driver -------------------------------
# One giant 6-level XLA program takes minutes to compile on TPU; compiling
# each level separately is 6 small programs (seconds each) with results kept
# on device between calls. Inference-only: gradients use the monolithic
# _render_chunk, which AD can see end to end.


def _stage_raygen(pack, cfg, cam, width, height, px, py, key):
    n = px.shape[0]
    if "raygen" in (cfg.ablate.split(",") if cfg.ablate else ()):
        # Instrumentation only: corner rays without the jitter uniforms /
        # DOF / per-lane RNG — data-dependent on (px, py) so downstream
        # traversal sees the same pixel-grid ray population (a constant ray
        # would collapse the whole trace; see the trace stub note).
        tl, dd_x, dd_y = camera_basis(cam, width, height)
        d = (tl[None, :] + px.astype(jnp.float32)[:, None] * dd_x[None, :]
             + py.astype(jnp.float32)[:, None] * dd_y[None, :])
        o = jnp.broadcast_to(cam.pos, (n, 3))
    else:
        u = jax.random.uniform(jax.random.fold_in(key, 0),
                               (n, 4 if cfg.use_dof else 2))
        o, d = gen_rays(cam, width, height, px, py, u)
        _, dd_x, dd_y = camera_basis(cam, width, height)
    bg_uv = jnp.stack(
        [px.astype(jnp.float32) / width, py.astype(jnp.float32) / height, jnp.zeros(n)],
        -1,
    )
    bg = sample_background(pack, bg_uv)
    return o, d, bg, dd_x, dd_y


_stage_raygen_jit = jax.jit(_stage_raygen, static_argnames=("cfg", "width", "height"))


def _stage_raygen_at(pack, cfg, cam, width, height, chunk, start, base_key,
                     sample):
    """Device-side chunk setup: lane pixel indices from a `start` scalar
    (iota + offset) and the chunk RNG key folded in-jit.

    Replaces the per-chunk host->device px/py upload (2x256KB over the
    remote-TPU tunnel, measured ~100ms/chunk of synchronous transfer that
    serialized dispatch — the round-2 "6x orchestration gap"). The key chain
    fold_in(fold_in(base_key, sample), start) matches the eager host-side
    chain bit-for-bit (threefry folding is deterministic under trace).
    `start`/`sample` are dynamic scalars: every chunk and sample shares ONE
    compiled program."""
    total = width * height
    idx = jnp.minimum(start + jnp.arange(chunk, dtype=jnp.int32), total - 1)
    px = idx % width
    py = idx // width
    ck = jax.random.fold_in(jax.random.fold_in(base_key, sample), start)
    o, d, bg, dd_x, dd_y = _stage_raygen(pack, cfg, cam, width, height, px, py, ck)
    return o, d, bg, dd_x, dd_y, ck


_stage_raygen_at_jit = jax.jit(
    _stage_raygen_at, static_argnames=("cfg", "width", "height", "chunk"))
_shade_level_jit = jax.jit(_shade_level, static_argnames=("cfg", "level"))
_combine_level_jit = jax.jit(_combine_level, static_argnames=("cfg", "level"))


def _stage_finish(rec0_hit, rad, bg, z, accum, zbuf, first):
    out = jnp.where(rec0_hit[:, None], rad, bg)
    z0 = jnp.where(rec0_hit, z, BIG)
    return accum + out, jnp.where(first, z0, zbuf)


_stage_finish_jit = jax.jit(_stage_finish)


def _stage_aux(pack, cfg, surf: Surface, hit_mask):
    """Denoiser auxiliary channels from the primary-hit surface: first-hit
    diffuse albedo + world normal (the buffers OIDN's RT filter takes,
    Main.cpp:68-77). Misses contribute zero."""
    mtl = _fetch_mtl(pack, surf.mtl)
    albedo = textured_color(pack, mtl.diffuse, mtl.diffuse_tm, surf.uvw,
                            surf.duvw, taps=1)
    m = hit_mask[:, None]
    return jnp.where(m, albedo, 0.0), jnp.where(m, surf.n, 0.0)


_stage_aux_jit = jax.jit(_stage_aux, static_argnames=("cfg",))


_EAGER_FLIPPED = False


def _ensure_eager_dispatch():
    """One tiny device->host fetch, once per process: flips the tunneled
    TPU client out of its initial journaling mode (where dispatch defers
    everything, block_until_ready returns without waiting, and un-fetched
    programs may never execute) into eager execution. Harmless no-op on
    CPU/other backends."""
    global _EAGER_FLIPPED
    if not _EAGER_FLIPPED:
        np.asarray(jnp.zeros((1,)) + 1.0)
        _EAGER_FLIPPED = True


class StatsVec:
    """Lazy ChunkStats view over the stacked (4,) device vector
    [drop_refr, drop_tir, drop_gi, segments]. Attribute access slices on
    demand, so the render loop issues ZERO dispatches for stats (on the
    tunneled backend every eager dispatch costs ~1.5ms once a readback has
    happened; the old per-field eager sums were ~20 dispatches/chunk)."""

    __slots__ = ("vec",)

    def __init__(self, vec):
        self.vec = vec

    @property
    def drop_refr(self):
        return self.vec[0]

    @property
    def drop_tir(self):
        return self.vec[1]

    @property
    def drop_gi(self):
        return self.vec[2]

    @property
    def segments(self):
        return self.vec[3]


def render_chunk_staged(pack, cfg, cam, width, height, px, py, key, pmap,
                        accum, zbuf, first: bool, want_aux: bool = False,
                        st_prev=None):
    """One chunk through per-level jitted stages; accumulates into device
    buffers (accum, zbuf). Returns (accum, zbuf, stats) — stats is a
    StatsVec accumulated onto st_prev — plus an (albedo, normal) pair of
    first-hit denoiser aux buffers when want_aux."""
    o, d, bg, dd_x, dd_y = _stage_raygen_jit(pack, cfg, cam, width, height, px, py, key)
    return _staged_levels(pack, cfg, o, d, bg, dd_x, dd_y, key, pmap,
                          accum, zbuf, first, want_aux, st_prev)


def render_chunk_staged_at(pack, cfg, cam, width, height, chunk, start, key,
                           sample, pmap, accum, zbuf, first: bool,
                           want_aux: bool = False, st_prev=None):
    """render_chunk_staged with DEVICE-SIDE lane-index generation: pixel
    indices come from `start` (a dynamic scalar) via iota, and the chunk RNG
    key is folded in-jit — no per-chunk host->device uploads, so chunks of a
    full image pipeline back-to-back on device (the reference renders whole
    images, viewport.cpp:404-409; this is the full-image hot path).

    With cfg.fused_levels the whole chunk (raygen + every shade level +
    combine/finish/stats) runs as ONE compiled program instead of ~9: on the
    tunneled TPU each program execution carries ~10-25ms of fixed overhead
    that dwarfs the actual device compute at these lane counts, so program
    count per image — not FLOPs — sets the render rate. RNG and numerics are
    bit-identical to the staged path (same functions, traced in one graph)."""
    fused = cfg.fused_levels if cfg.fused_levels is not None else pmap is None
    if fused and st_prev is None:
        st_prev = jnp.zeros((4,), jnp.int32)
    if fused:
        out = _chunk_fused_at_jit(pack, cfg, cam, width, height, chunk,
                                  start, key, sample, accum, zbuf, first,
                                  st_prev, want_aux)
        if want_aux:
            acc, zb, st, aux = out
            return acc, zb, StatsVec(st), aux
        acc, zb, st = out
        return acc, zb, StatsVec(st)
    o, d, bg, dd_x, dd_y, ck = _stage_raygen_at_jit(
        pack, cfg, cam, width, height, chunk, start, key, sample)
    return _staged_levels(pack, cfg, o, d, bg, dd_x, dd_y, ck, pmap,
                          accum, zbuf, first, want_aux, st_prev)


def _chunk_fused_at(pack, cfg, cam, width, height, chunk, start, base_key,
                    sample, accum, zbuf, first, st_prev, want_aux: bool):
    """Monolithic chunk program: _stage_raygen_at + every shade level +
    _combine_finish traced into one graph (the fused_levels path)."""
    o, d, bg, dd_x, dd_y, ck = _stage_raygen_at(
        pack, cfg, cam, width, height, chunk, start, base_key, sample)
    rec, tasks, surf0 = _shade_entry(pack, cfg, o, d, ck, dd_x, dd_y, None)
    recs = [rec]
    for level in range(1, cfg.max_levels):
        rec, tasks, _ = _shade_next(pack, cfg, tasks, level, ck, dd_x, dd_y,
                                    None)
        recs.append(rec)
    acc, zb, st = _combine_finish(cfg, tuple(recs), tasks.active, bg,
                                  accum, zbuf, first, st_prev)
    if want_aux:
        albedo, normal = _stage_aux(pack, cfg, surf0, recs[0].hit)
        return acc, zb, st, (albedo, normal)
    return acc, zb, st


_chunk_fused_at_jit = jax.jit(
    _chunk_fused_at,
    static_argnames=("cfg", "width", "height", "chunk", "want_aux"))


def _chunk_fused_px(pack, cfg, cam, width, height, px, py, ck,
                    accum, zbuf, first, st_prev):
    """Monolithic chunk program over an EXPLICIT pixel list (px, py) — the
    adaptive-sampling pass renders scattered high-variance pixels, which
    the start-scalar iota of _chunk_fused_at cannot express."""
    o, d, bg, dd_x, dd_y = _stage_raygen(pack, cfg, cam, width, height,
                                         px, py, ck)
    rec, tasks, _ = _shade_entry(pack, cfg, o, d, ck, dd_x, dd_y, None)
    recs = [rec]
    for level in range(1, cfg.max_levels):
        rec, tasks, _ = _shade_next(pack, cfg, tasks, level, ck, dd_x, dd_y,
                                    None)
        recs.append(rec)
    return _combine_finish(cfg, tuple(recs), tasks.active, bg, accum, zbuf,
                           first, st_prev)


_chunk_fused_px_jit = jax.jit(
    _chunk_fused_px, static_argnames=("cfg", "width", "height"))


def _staged_levels(pack, cfg, o, d, bg, dd_x, dd_y, key, pmap,
                   accum, zbuf, first: bool, want_aux: bool, st_prev=None):
    # Dispatch economy: one jitted call per level plus ONE combined
    # combine+finish+stats program — task init, per-level key folds, the
    # backward combine tree, and the stat sums all happen in-graph.
    if st_prev is None:
        st_prev = jnp.zeros((4,), jnp.int32)
    rec, tasks, surf0 = _shade_entry_jit(pack, cfg, o, d, key, dd_x, dd_y,
                                         pmap)
    recs = [rec]
    for level in range(1, cfg.max_levels):
        rec, tasks, _ = _shade_next_jit(pack, cfg, tasks, level, key,
                                        dd_x, dd_y, pmap)
        recs.append(rec)
    acc, zb, st = _combine_finish_jit(cfg, tuple(recs), tasks.active, bg,
                                      accum, zbuf, first, st_prev)
    stats = StatsVec(st)
    if want_aux:
        albedo, normal = _stage_aux_jit(pack, cfg, surf0, recs[0].hit)
        return acc, zb, stats, (albedo, normal)
    return acc, zb, stats


def _level_key(key, level: int):
    """The staged path's per-level key chain — bit-identical to the
    original eager chain fold_in(fold_in(key, 1), 100 + level)."""
    return jax.random.fold_in(jax.random.fold_in(key, 1), 100 + level)


def _shade_entry(pack, cfg, o, d, key, dd_x, dd_y, pmap=None):
    n = o.shape[0]
    tasks = Tasks(o=o, d=d,
                  active=jnp.ones((n,), bool),
                  bounce=jnp.full((n,), cfg.tir_bounces, jnp.int32))
    return _shade_level(pack, cfg, tasks, 0, _level_key(key, 0),
                        dd_x, dd_y, pmap)


def _shade_next(pack, cfg, tasks, level, key, dd_x, dd_y, pmap=None):
    return _shade_level(pack, cfg, tasks, level, _level_key(key, level),
                        dd_x, dd_y, pmap)


def _combine_tree(cfg, recs, probe):
    """Backward combine over all levels -> level-0 radiance. With
    cfg.ablate 'combine', the per-level scatter/clamp tree is replaced by a
    cheap reduction that still CONSUMES every level output (so XLA cannot
    dead-code-eliminate the levels themselves — only the combine's own cost
    is removed; wrong image by construction)."""
    if "combine" in (cfg.ablate.split(",") if cfg.ablate else ()):
        s = jnp.zeros(())
        for r in recs:
            s = s + (jnp.sum(r.direct) + jnp.sum(r.gi_albedo)
                     + jnp.sum(r.gi_env) + jnp.sum(r.refr_mult)
                     + jnp.sum(r.refr_env) + jnp.sum(r.refr_add)
                     + jnp.sum(r.z % 3.0))
        return recs[0].direct + s * 1e-12
    m = probe.shape[0]
    child_rad = jnp.zeros((m, 3))
    child_z = jnp.full((m,), BIG)
    child_hit = jnp.zeros((m,), bool)
    for level in reversed(range(cfg.max_levels)):
        rad = _combine_level(cfg, level, recs[level], child_rad, child_z,
                             child_hit)
        child_rad, child_z, child_hit = rad, recs[level].z, recs[level].hit
    return child_rad


def _combine_finish(cfg, recs, probe, bg, accum, zbuf, first, st_prev):
    """Backward combine over all levels + miss/background resolve + accum
    update + stat sums, as ONE program."""
    child_rad = _combine_tree(cfg, recs, probe)
    st = st_prev
    for r in recs:
        st = st + jnp.stack([r.drop_refr, r.drop_tir, r.drop_gi,
                             r.segs]).astype(st_prev.dtype)
    out = jnp.where(recs[0].hit[:, None], child_rad, bg)
    z0 = jnp.where(recs[0].hit, recs[0].z, BIG)
    return accum + out, jnp.where(first, z0, zbuf), st


_shade_entry_jit = jax.jit(_shade_entry, static_argnames=("cfg",))
_shade_next_jit = jax.jit(_shade_next, static_argnames=("cfg", "level"))
_combine_finish_jit = jax.jit(_combine_finish, static_argnames=("cfg",))


def render_image(pack, camera, cfg: RenderConfig = RenderConfig(), seed: int = 0,
                 photon_map=None, denoiser=None, return_aux: bool = False,
                 checkpoint_dir=None, sample_offset: int = 0):
    """Render a full image: returns (H, W, 3) float32 in [0,1] after the
    reference's gamma (Main.cpp:216-231). `camera` is a scene-desc Camera.

    With cfg.use_photon_map, a caustic photon map is built first (or pass a
    prebuilt PhotonMapPack) — the BeginRender preprocessing pass
    (Main.cpp:195-198).

    `sample_offset` shifts the per-sample RNG stream index: a progressive
    render of K passes with cfg.spp = spp/K and offsets 0, spp/K, 2*spp/K...
    draws exactly the samples a single spp-sample run would (the CLI's
    --progressive preview, the headless stand-in for the reference
    viewport's live in-progress image)."""
    if cfg.use_photon_map and photon_map is None:
        from bhraytracer_tpu.models.photonmap import build_photon_map

        photon_map = build_photon_map(pack, cfg, seed=seed, caustic=True)
    if not cfg.use_photon_map:
        photon_map = None
    cam = from_scene_camera(camera)
    width, height = camera.width, camera.height
    spp = cfg.spp
    total = width * height

    key = jax.random.PRNGKey(seed)
    accum = np.zeros((total, 3), np.float32)
    zbuffer = np.full((total,), BIG, np.float32)
    # First-hit denoiser aux channels (OIDN albedo/normal, Main.cpp:68-77),
    # taken from the first sample of each pixel.
    want_aux = return_aux or (cfg.use_denoiser and (
        denoiser is None  # pretrained weights (aux-trained) will be loaded
        or getattr(denoiser[0], "aux_channels", 0) > 0))
    aux_albedo = np.zeros((total, 3), np.float32) if want_aux else None
    aux_normal = np.zeros((total, 3), np.float32) if want_aux else None
    total_drops = np.zeros((3,), np.int64)
    total_segments = 0
    chunk = min(max(1, cfg.chunk_rays), total)
    n_chunks = -(-total // chunk)
    done = np.zeros((n_chunks,), bool)
    if checkpoint_dir:
        from bhraytracer_tpu.utils.checkpoint import load_render_state, save_render_state

        state = load_render_state(checkpoint_dir, cfg, width, height, seed)
        if state is not None:
            accum, zbuffer, done = state
            accum = accum.copy(); zbuffer = zbuffer.copy(); done = done.copy()
    # Lanes are (pixel, sample); chunk over pixels, loop samples to bound
    # memory; each chunk runs through the per-level staged driver. Lane
    # pixel indices are generated ON DEVICE from the chunk's start scalar
    # and results are harvested through a bounded in-flight window, so host
    # dispatch of chunk i+1..i+W overlaps device compute of chunk i (the
    # round-2 per-chunk px/py uploads + blocking fetch serialized the
    # remote-TPU tunnel and left the chip ~85% idle).
    # start/sample scalars are SLICED from device arrays, never created
    # fresh from host ints: on the tunneled-TPU backend a fresh host scalar
    # as a jit argument forces a ~100ms synchronous transfer wait per
    # dispatch, while a device-slice is a fully-async tiny program
    # (tools/drill_dispatch.py: 108.3 -> 6.4 ms/chunk).
    starts_d = jnp.arange(n_chunks, dtype=jnp.int32) * chunk
    samples_d = jnp.arange(spp, dtype=jnp.int32) + sample_offset
    # Per-render init buffers, reused by every chunk (read-only jit inputs;
    # one allocation per render, not per chunk).
    acc0 = jnp.zeros((chunk, 3))
    zb0 = jnp.full((chunk,), BIG)
    st0 = jnp.zeros((4,), jnp.int32)

    def run_chunk(cfg_run, start):
        acc_d, z_d, st_d = acc0, zb0, st0
        aux_d = None
        for s in range(spp):
            out = render_chunk_staged_at(
                pack, cfg_run, cam, width, height, chunk,
                starts_d[start // chunk], key, samples_d[s],
                photon_map, acc_d, z_d, s == 0,
                want_aux=(want_aux and s == 0), st_prev=st_d,
            )
            if want_aux and s == 0:
                acc_d, z_d, st, aux_d = out
            else:
                acc_d, z_d, st = out
            st_d = st.vec
        return acc_d, z_d, aux_d, st_d

    def harvest(start, acc_d, z_d, aux_d, st_d):
        nonlocal total_segments
        st_host = np.asarray(st_d, np.int64)
        # Escalating re-render of dropped chunks: double the compaction
        # capacities per retry and fall back to the fully-lossless config
        # only as a last resort. The old jump-straight-to-lossless policy
        # cost 27.2 s per 480K chunk on TPU (uncompacted wavefronts DOUBLE
        # per level: cap 1.0 measured 27210 vs 297 ms at cap 0.08, round-4
        # sweep) — while one doubling (cap 0.16) already renders the
        # headline scene drop-free in 428 ms. Each escalation level is one
        # extra compile set, shared by every chunk that needs it.
        esc = 0
        while st_host[:3].any() and cfg.adaptive_full_capacity:
            esc += 1
            if cfg.refr_capacity * (2 ** esc) >= 1.0 or esc > 3:
                cfg_run = dataclasses.replace(
                    cfg, refr_capacity=1.0, tir_tail_compaction=False,
                    gi_capacity=1.0, adaptive_full_capacity=False,
                )
            else:
                cfg_run = dataclasses.replace(
                    cfg,
                    refr_capacity=min(1.0, cfg.refr_capacity * (2 ** esc)),
                    gi_capacity=1.0,
                    tir_head_trips=max(cfg.tir_head_trips, 3),
                    tir_tail_divisor=max(1, cfg.tir_tail_divisor >> esc),
                )
            acc_d, z_d, aux_d, st_d = run_chunk(cfg_run, start)
            st_host = np.asarray(st_d, np.int64)
            if not cfg_run.adaptive_full_capacity:
                break  # lossless leg: whatever it reports is final
        stop = min(start + chunk, total)
        count = stop - start
        total_drops[:] += st_host[:3]
        total_segments += int(st_host[3])
        accum[start:stop] = np.asarray(acc_d, np.float32)[:count]
        zbuffer[start:stop] = np.asarray(z_d, np.float32)[:count]
        if want_aux:
            aux_albedo[start:stop] = np.asarray(aux_d[0], np.float32)[:count]
            aux_normal[start:stop] = np.asarray(aux_d[1], np.float32)[:count]
        done[start // chunk] = True
        if checkpoint_dir:
            save_render_state(checkpoint_dir, accum, zbuffer, done,
                              cfg, width, height, seed)

    # Per-pixel sample counts (RenderImage sample-count buffer parity,
    # scene.h:532-536, 605-626): base pass writes spp everywhere; the
    # adaptive pass below adds its extra samples per selected pixel.
    sample_counts = np.full((total,), spp, np.int64)
    # Put the tunneled client into eager execution mode up front (its
    # initial journaling mode defers execution and lies to
    # block_until_ready; one tiny fetch flips it — measured faster
    # end-to-end, tools/drill_dispatch.py).
    _ensure_eager_dispatch()
    # Harvest policy: bounded in-flight window so chunk fetches overlap
    # later chunks' execution. 0 = single readback barrier at the end.
    window = int(cfg.inflight_chunks)
    if checkpoint_dir and window <= 0:
        window = 3
    pending = []
    for start in range(0, total, chunk):
        if done[start // chunk]:
            continue
        pending.append((start,) + run_chunk(cfg, start))
        if window > 0 and len(pending) > window:
            harvest(*pending.pop(0))
    while pending:
        harvest(*pending.pop(0))

    if cfg.adaptive_spp > 0:
        # Adaptive pass: give the highest-contrast pixels (a 3x3-box local
        # contrast on the base image — the course adaptive-AA criterion the
        # reference's sample-count buffer exists for) cfg.adaptive_spp
        # extra samples each, via the explicit-pixel fused chunk program.
        img_lin = (accum / spp).reshape(height, width, 3)
        pad = np.pad(img_lin, ((1, 1), (1, 1), (0, 0)), mode="edge")
        blur = sum(pad[i:i + height, j:j + width]
                   for i in range(3) for j in range(3)) / 9.0
        metric = np.abs(img_lin - blur).sum(-1).reshape(-1)
        k_sel = max(1, int(total * cfg.adaptive_fraction))
        sel = np.sort(np.argpartition(metric, total - k_sel)[total - k_sel:])
        a_chunk = min(chunk, max(1024, -(-k_sel // 1024) * 1024))
        for a_start in range(0, k_sel, a_chunk):
            part = sel[a_start:a_start + a_chunk]
            count = part.shape[0]
            idx = np.concatenate(
                [part, np.full(a_chunk - count, sel[0], np.int64)])
            px_d = jnp.asarray(idx % width, jnp.int32)
            py_d = jnp.asarray(idx // width, jnp.int32)
            acc_d, st_d = jnp.zeros((a_chunk, 3)), jnp.zeros((4,), jnp.int32)
            zb_d = jnp.full((a_chunk,), BIG)
            for s in range(cfg.adaptive_spp):
                ck = jax.random.fold_in(
                    jax.random.fold_in(key, 0x5EED + s), a_start)
                if photon_map is not None:
                    # The fused graph does not thread pmap; photon scenes
                    # take the staged px/py driver for the extra passes.
                    acc_d, zb_d, st = render_chunk_staged(
                        pack, cfg, cam, width, height, px_d, py_d, ck,
                        photon_map, acc_d, zb_d, False, st_prev=st_d)
                    st_d = st.vec
                else:
                    acc_d, zb_d, st_d = _chunk_fused_px_jit(
                        pack, cfg, cam, width, height, px_d, py_d, ck,
                        acc_d, zb_d, False, st_d)
            st_host = np.asarray(st_d, np.int64)
            total_drops[:] += st_host[:3]
            total_segments += int(st_host[3])
            accum[part] += np.asarray(acc_d, np.float32)[:count]
            sample_counts[part] += cfg.adaptive_spp

    img = accum / sample_counts[:, None].astype(np.float32)
    if cfg.use_gamma:
        img = np.power(np.maximum(img, 0.0), 1.0 / cfg.gamma)
    img = img.reshape(height, width, 3)
    if cfg.use_denoiser:
        # Denoise the (post-gamma) image, as the reference does with OIDN
        # (Main.cpp:220-238: colorArray holds gamma-corrected values). With
        # no explicit (model, params), the shipped pretrained weights load
        # (OIDN arrives pretrained too, Main.cpp:60-95).
        from bhraytracer_tpu.models.denoiser import denoise, load_pretrained

        model, dparams = denoiser if denoiser is not None else load_pretrained()
        aux = None
        if getattr(model, "aux_channels", 0) > 0 and want_aux:
            aux = jnp.asarray(np.concatenate(
                [aux_albedo.reshape(height, width, 3),
                 aux_normal.reshape(height, width, 3)], -1), jnp.float32)
        img = np.asarray(denoise(model, dparams, jnp.asarray(img, jnp.float32),
                                 aux=aux))
    if return_aux:
        return img, {"zbuffer": zbuffer.reshape(height, width),
                     "sample_count":
                         sample_counts.reshape(height, width).astype(np.int32),
                     "albedo": aux_albedo.reshape(height, width, 3),
                     "normal": aux_normal.reshape(height, width, 3),
                     "dropped_lanes": {"refr_overflow": int(total_drops[0]),
                                       "tir_overflow": int(total_drops[1]),
                                       "gi_overflow": int(total_drops[2])},
                     "traced_segments": total_segments}
    return img


def image_to_u8(img: np.ndarray) -> np.ndarray:
    """Color24 conversion (cyColor.h:231): clamp to [0,1], scale, round."""
    return np.clip(np.asarray(img) * 255.0 + 0.5, 0.0, 255.0).astype(np.uint8)


def zbuffer_to_u8(zbuffer: np.ndarray) -> np.ndarray:
    """ComputeZBufferImage (scene.h:579-601): normalize finite z to [0,255]
    with near = bright; misses (BIGFLOAT) map to 0."""
    z = np.asarray(zbuffer)
    mask = z < BIG
    if not mask.any():
        return np.zeros(z.shape, np.uint8)
    zmin = z[mask].min()
    zmax = z[mask].max()
    denom = max(zmax - zmin, 1e-30)
    img = np.clip((zmax - z) / denom * 255.0, 0, 255).astype(np.uint8)
    img[~mask] = 0
    return img
