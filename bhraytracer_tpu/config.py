"""Render configuration.

One declarative config replaces the reference's two-tier compile-time
`#define` flags (BHRayTracer/Main.cpp:41,52-53,127-141; MtlBlinn.cpp:10-29;
TriObj.cpp:2-6) — every reference constant becomes a runtime field here.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    """Static (trace-time) renderer configuration.

    Defaults mirror the reference build's compiled-in constants.
    """

    # Samples per pixel (reference: PT_SampleCount 32, Main.cpp:141).
    spp: int = 32
    # Reflect/refract (TIR) bounce budget (INTERNAL_REFLECTION_BOUNCE 16,
    # Main.cpp:41). Decremented only on total internal reflection, matching
    # RefractionRecusive (MtlBlinn.cpp:476-519).
    tir_bounces: int = 16
    # GI bounce budget (GIBounceCount 3, Main.cpp:130).
    gi_bounces: int = 3
    # Extra shade-tree levels past the GI budget where refraction chains may
    # still continue. The reference's recursion is *unbounded* here (a latent
    # stack-overflow bug: RefractionRecusive only decrements bounceCount on
    # TIR); we bound total tree depth at gi_bounces + 1 + extra_refr_levels.
    extra_refr_levels: int = 2
    # Gamma correction (USE_GamaCorrection, Main.cpp:220-227).
    gamma: float = 2.2
    use_gamma: bool = True
    # Shading biases (MtlBlinn.cpp:10, GenLight.cpp:5).
    bias: float = 1e-4
    shadow_bias: float = 1e-5
    # Texture filtering taps (TEXTURE_SAMPLE_COUNT 32, scene.h:18).
    texture_sample_count: int = 32
    # Glossy-refraction rejection-sampling tries. The reference loops until a
    # sample lands on the correct hemisphere (MtlBlinn.cpp:454-465); a
    # data-dependent loop is hostile to XLA so we take a fixed number of
    # tries and fall back to the perfect refraction direction.
    refr_gloss_tries: int = 4
    # Replicate the reference's plane-shadow bug (ShadowRayRecursive tests
    # the [-1,1] extent on the *untransformed* ray's point, GenLight.cpp:37;
    # golden images were rendered with this bug). False = correct behavior.
    parity_plane_shadow_bug: bool = False
    # Rays processed per device dispatch (memory knob; the shade tree
    # multiplies live state by ~sum(2^level)).
    chunk_rays: int = 16384
    # Number of photons for the caustic photon map build
    # (MAX_CausticPhotonCount 1000000, Main.cpp:53).
    photon_count: int = 1 << 20
    # Photon gather: k-NN cap and max search radius
    # (MAX_PhotonCountInArea 1000 / MAX_Area 0.5, MtlBlinn.cpp:28-29).
    photon_gather_max: int = 1000
    photon_gather_radius: float = 0.5
    # Russian-roulette absorb chance for photon bounces
    # (Photon_AbsorbChance 0.3, MtlBlinn.cpp:27).
    photon_absorb_chance: float = 0.3
    # Enable the caustic photon map gather in direct shading
    # (USE_PhotonMap, Main.cpp:51 — off by default in the reference too).
    use_photon_map: bool = False
    # Apply the learned denoiser head after rendering (replaces OIDN,
    # Main.cpp:57-95).
    use_denoiser: bool = False
    # Differentiable mode: the refraction/TIR chain runs as a fixed-length
    # lax.scan (reverse-mode AD cannot cross lax.while_loop). Inference keeps
    # the early-exiting while_loop. Set True for inverse rendering; pick a
    # small tir_bounces (the scan always pays max iterations).
    differentiable: bool = False

    # Depth of field: jitter the eye over the camera's `dof` aperture disc
    # (thin lens). The reference parses dof (scene.h:518) but only its GL
    # preview uses it (viewport.cpp:238-243) — the ray tracer renders pinhole
    # regardless; False keeps that parity, True completes the camera model.
    use_dof: bool = False

    # Rematerialize each shade-tree level in the backward pass
    # (jax.checkpoint around _shade_level): reverse-mode memory then holds
    # one level's working set plus the per-level LevelRecords instead of
    # every intermediate of every level — the difference between a 24x18
    # toy and a 256x256+ inverse render. Forward-only jits are unaffected.
    remat_levels: bool = True

    # Two-stage TIR chain: after tir_head_trips full-width trips, recompact
    # stragglers to 1/tir_tail_divisor width. Stragglers beyond that tail
    # contribute black — counted in LevelRecord.drop_tir; set
    # tir_tail_compaction=False for a guaranteed-lossless chain (used by
    # render_image's adaptive re-render of flagged chunks). Brute-force
    # stream traces cost ~width x F per trip regardless of live-lane count,
    # so trip widths — not live lanes — set the chain's price.
    # Round-4 480K TPU sweep (drops/chunk in parens): head3/div4 388.6
    # (11200), head1/div4 371.4 (11200), head1/div8 348.5 (11200 — zero
    # added), head1/div16 339.3 (12606 — real losses), head3/div16 357.4.
    # Most chain lanes settle on trip 1 (exit or early TIR), so one
    # full-width trip + a 1/8-width tail is the best zero-drop point.
    tir_tail_compaction: bool = True
    tir_head_trips: int = 1
    tir_tail_divisor: int = 8
    # Re-render any chunk whose drop counters are nonzero with full
    # refraction capacity + lossless TIR chain (one extra compile set, paid
    # only when a loss is detected).
    adaptive_full_capacity: bool = True
    # Chunks kept in flight (dispatched, unharvested) during render_image:
    # chunk i's host fetch overlaps chunks i+1..i+W executing on device.
    # render_image deliberately flips the tunneled client into eager
    # execution mode first (one tiny fetch) — in the client's initial
    # journaling mode dispatches are deferred and execution is slower
    # end-to-end (tools/drill_dispatch.py). 0 = no window: dispatch every
    # chunk, one readback barrier at the end (what bench.py measures).
    inflight_chunks: int = 4

    # Instrumentation ONLY (tools/sweep_variants.py): comma-separated set of
    # shade-level components to stub out so image-level ablation sweeps can
    # attribute per-chunk cost on hardware where per-op microbenchmarks are
    # unreliable (the tunnel journals/replays same-input calls). Supported:
    # "chain", "direct", "shadow", "gi", "rng", "trace", "resolve",
    # "compact", "raygen" (corner rays, no jitter RNG), "combine" (cheap
    # level-consuming reduction instead of the backward scatter/clamp
    # tree). Renders with a non-empty value are WRONG images by
    # construction.
    ablate: str = ""

    # Fine-grained coherence-reorder toggles, one per trace family.
    # CAUTION (round-4 semantics change): with the stream kernel default
    # ON, `reorder` also SELECTS the kernel — reorder=True routes to the
    # stream kernel (which needs no sort), reorder=False to the packet
    # kernel. Stream and packet agree everywhere except the documented
    # equal-t seam-tie family (<1% of seam pixels can swap faces at equal
    # t), so flipping these is value-safe but NOT guaranteed bit-identical
    # anymore. Within one kernel the sort itself is order-only. These
    # exist so image-level sweeps can price each family separately;
    # defaults reflect the round-4 TPU measurements.
    closest_reorder: bool = True
    shadow_reorder: bool = True
    chain_reorder: bool = True
    # Route the LEVEL-0 (scanline-coherent camera ray) closest/shadow
    # traces with reorder=True as well — i.e., through the stream kernel
    # when stream is on. MEASURED NEGATIVE on TPU (round 4, 480K fused):
    # 299.4 vs 290.5 ms/chunk — the packet kernel traverses coherent
    # tiles near-optimally and earns level 0. Keep False.
    level0_reorder: bool = False

    # Once-per-level coherence presort: sort the level's tasks by
    # (active, direction octant, origin cell) ONCE, run every trace in the
    # level with reorder=False (the closest trace directly; shadow rays
    # inherit origin coherence; chain lanes inherit it through the stable
    # partition), and unsort once at level end. One argsort + one
    # inverse-permutation scatter + cheap gathers per level, replacing that
    # pair PER TRACE plus per-chain-trip. Semantically order-only: per-lane
    # uniforms travel with their task, and the child compaction partitions
    # over the ORIGINAL lane order (composed through the permutation), so
    # slot-positional RNG pairing matches the non-presorted path exactly;
    # images differ only by XLA fusion-boundary rounding
    # (tests/test_level_presort.py pins stats/z equal, radiance ulp-close).
    # MEASURED NEGATIVE on TPU (round 4, 480K fused): 836.8 vs 601.9
    # ms/chunk — each trace family's own sort key (especially the shadow
    # wavefront's) buys more traversal coherence than the consolidated sort
    # saves in fabric. Kept as a documented negative result; leave False.
    level_presort: bool = False

    # Fuse the whole chunk (raygen + all shade levels + combine/finish) into
    # ONE compiled program instead of ~9 per-level stages. TPU-measured
    # (round 3): 89.0 vs 100.0 ms/chunk at 65K lanes, and the fused path is
    # the only one that compiles at 480K-lane whole-image chunks (the
    # staged stages hit remote-compile failures there). Costs one big
    # compile per (chunk, cfg) shape; the round-1 SIGILL in the TPU
    # compiler's fusion pass on this program has not reproduced since.
    # None (default) = auto: fused whenever no photon map is attached (the
    # fused graph does not thread pmap); numerics are bit-identical either
    # way (same functions, traced in one graph vs several).
    fused_levels: bool | None = None

    # Adaptive sampling (our extension; the reference's RenderImage carries
    # a per-pixel sample-count buffer for exactly this, scene.h:532-536,
    # 605-626, though its PathTracing uses a fixed 32 spp). After the base
    # cfg.spp pass, the `adaptive_fraction` highest-contrast pixels (plus
    # every pixel of any chunk that reported dropped lanes) receive
    # `adaptive_spp` EXTRA samples; the per-pixel sample-count aux buffer
    # then reflects the true counts and the image divides by them.
    adaptive_spp: int = 0
    adaptive_fraction: float = 0.15

    # Refraction-child compaction: each level reserves capacity for at most
    # ceil(N * refr_capacity) refraction children (rounded up to 128 lanes).
    # The reference recursion expands every refractive hit; compaction keeps
    # the wavefront from doubling per level — overflowing children (rare:
    # most lanes hit non-refractive materials) contribute black.
    refr_capacity: float = 0.25

    # GI-child compaction, mirroring refr_capacity: each level reserves at
    # most ceil(N * gi_capacity) slots for GI children. Lanes that MISSED
    # need no GI child, so open scenes (lots of background) shrink their
    # deeper levels; live lanes beyond capacity contribute black — counted
    # in LevelRecord.drop_gi and recovered by the adaptive re-render. 1.0
    # keeps the round-1 full-width behavior (bit-identical RNG streams).
    gi_capacity: float = 1.0

    @property
    def max_levels(self) -> int:
        """Total shade-tree depth (levels 0..max_levels-1 are shaded)."""
        return self.gi_bounces + 1 + self.extra_refr_levels

    def refr_cap(self, n: int) -> int:
        """Refraction-child slot count for a level of n tasks (never more
        than n: a level cannot have more candidates than lanes)."""
        k = int(np.ceil(n * self.refr_capacity))
        return min(n, max(128, (k + 127) // 128 * 128))

    def gi_cap(self, n: int) -> int:
        """GI-child slot count for a level of n tasks."""
        if self.gi_capacity >= 1.0:
            return n
        k = int(np.ceil(n * self.gi_capacity))
        return min(n, max(128, (k + 127) // 128 * 128))

    def level_sizes(self, chunk: int):
        """Task counts per level for a camera chunk of `chunk` lanes."""
        sizes = [chunk]
        for level in range(self.max_levels - 1):
            n = sizes[-1]
            k = self.refr_cap(n)
            sizes.append((self.gi_cap(n) if self.gi_active(level) else 0) + k)
        return sizes

    def gi_active(self, level: int) -> bool:
        """GI runs while the remaining budget gi_bounces - level >= 0."""
        return self.gi_bounces - level >= 0
