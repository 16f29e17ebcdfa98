"""ScenePack: the flat SoA device-array form of a scene.

The reference reaches scene state through a pointer-chasing node hierarchy
and global registries (scene.h:426-502, Main.cpp:17-37). The TPU design
flattens everything at compile time: world-folded per-instance transforms,
concatenated mesh/BVH arrays, a global material table, texture atlas, and a
light table. The pack is a JAX pytree — material / light / vertex / texture
arrays are differentiable leaves for inverse rendering.

Sharding note: the pack is small (KBs-MBs) and is *replicated* across
devices; parallelism is over rays/tiles (see parallel/).
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax

Array = Any


@dataclasses.dataclass
class ScenePack:
    # ---- sphere instances (unit sphere at origin; Sphere.cpp:8) ----
    sph_itm: Array  # (S,3,3) world->local
    sph_tm: Array  # (S,3,3) local->world
    sph_pos: Array  # (S,3)
    sph_mtl: Array  # (S,) i32

    # ---- plane instances (unit z=0 square; Plane.cpp:8) ----
    pln_itm: Array
    pln_tm: Array
    pln_pos: Array
    pln_mtl: Array

    # ---- mesh instances ----
    msh_itm: Array  # (Mi,3,3)
    msh_tm: Array
    msh_pos: Array
    msh_mtl: Array  # (Mi,) i32 instance-wide material (-1 = per-face table)

    # ---- per-instance mesh geometry (faces in world-BVH leaf order) ----
    # Face tables are flattened PER INSTANCE (an OBJ used by two nodes
    # contributes its faces twice); vertex/normal/uv pools are shared per
    # distinct mesh, so duplicate instances only duplicate the (F,3) index
    # rows. Together with the unified world BVH below this replaces the
    # reference's per-instance scene-graph recursion (`recursive`,
    # Main.cpp:389-413) with one flat world-space geometry set.
    verts: Array  # (V,3) f32 — LOCAL-frame positions (differentiable)
    normals: Array  # (VN,3)
    uvs: Array  # (VT,3)
    face_v: Array  # (F,3) i32 global vertex ids
    face_vn: Array  # (F,3)
    face_vt: Array  # (F,3)
    face_mtl: Array  # (F,) i32 global material id
    face_inst: Array  # (F,) i32 mesh-instance id (indexes msh_*)

    # ---- unified world-space BVH over all mesh instances ----
    # ONE tree over every instance's world-space triangles (transforms folded
    # at compile): traversal needs no per-instance ray transform and culls
    # across instances, unlike the reference's sequential per-object BVH walk
    # (TriObj.cpp:192-307 under Node::ToNodeCoords).
    bvh_bmin: Array  # (B,3)
    bvh_bmax: Array  # (B,3)
    bvh_left: Array  # (B,) i32 left child (global) / leaf face start (global)
    bvh_count: Array  # (B,) i32 leaf face count (0 = internal)
    # World-space triangle vertices in face order (XLA leaf tests read these
    # directly — no per-leaf vertex-index indirection).
    wtri_v0: Array  # (F,3) f32
    wtri_v1: Array  # (F,3) f32
    wtri_v2: Array  # (F,3) f32
    # Row-table mirrors for the Pallas packet kernel (dynamic pl.ds row
    # loads; Mosaic cannot scalar-gather 1-D VMEM): node row =
    # [bmin, bmax, left, count, pad...]; face row = [world v0, v1, v2, pad].
    pallas_nodes: Array  # (B,16) f32
    pallas_faces: Array  # (F,16) f32
    # Packed LOCAL-frame per-face resolve row (bit-identical copies of the
    # verts/normals/uvs pool lookups): [v0 v1 v2 | vn0 vn1 vn2 | uv0 uv1 uv2
    # | face_mtl | pad]. One row gather replaces resolve_hit's 9 dependent
    # pool gathers on the non-differentiable render path; the AD path keeps
    # the pools so vertex gradients reach `verts`/`normals`.
    resolve_rows: Array  # (F,32) f32

    # ---- material table (MtlBlinn params; materials.h:20-61) ----
    mtl_diffuse: Array  # (M,3)
    mtl_specular: Array  # (M,3)
    mtl_gloss: Array  # (M,)
    mtl_emission: Array  # (M,3)   parsed, unused by integrator (parity)
    mtl_reflection: Array  # (M,3) parsed, unused by integrator (parity)
    mtl_refl_gloss: Array  # (M,)
    mtl_refraction: Array  # (M,3)
    mtl_refr_gloss: Array  # (M,)
    mtl_ior: Array  # (M,)
    mtl_absorption: Array  # (M,3)
    mtl_diffuse_tm: Array  # (M,) i32 texmap id or -1
    mtl_specular_tm: Array
    mtl_emission_tm: Array
    mtl_reflection_tm: Array
    mtl_refraction_tm: Array

    # ---- texture maps (texture id + uvw transform; scene.h:364-386) ----
    tm_tex: Array  # (TM,) i32
    tm_itm: Array  # (TM,3,3)
    tm_pos: Array  # (TM,3)

    # ---- textures ----
    tex_kind: Array  # (T,) i32: 0=file, 1=checker
    tex_c1: Array  # (T,3) checker color1
    tex_c2: Array  # (T,3) checker color2
    tex_wh: Array  # (T,2) i32 width,height
    atlas: Array  # (T,Hm,Wm,3) uint8 padded image atlas

    # ---- background / environment (TexturedColor; scene.h:394-422) ----
    bg_color: Array  # (3,)
    bg_tm: Array  # () i32
    env_color: Array  # (3,)
    env_tm: Array  # () i32

    # ---- lights, sorted ascending by Gray() (Main.cpp:116-123) ----
    light_kind: Array  # (L,) i32: 0=ambient, 1=direct, 2=point
    light_intensity: Array  # (L,3)
    light_vec: Array  # (L,3) direction (direct) / position (point)
    light_size: Array  # (L,)

    # ---- static metadata (not traced) ----
    bvh_depth: int = dataclasses.field(default=1, metadata=dict(static=True))
    n_sph: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_pln: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_msh: int = dataclasses.field(default=0, metadata=dict(static=True))
    n_lights: int = dataclasses.field(default=0, metadata=dict(static=True))
    has_file_tex: bool = dataclasses.field(default=False, metadata=dict(static=True))
    n_texmaps: int = dataclasses.field(default=0, metadata=dict(static=True))
    # Treelet descriptors for STREAMED packet traversal when the node+face
    # row tables exceed the Pallas VMEM budget: a tuple of GLOBAL
    # (face_start, face_end) ranges, one per treelet. Empty = single-shot
    # (whole tree resident). When non-empty, `pallas_nodes`/`pallas_faces`
    # hold UNIFORM padded per-treelet blocks (T*NB, 16)/(T*FB, 16) — one
    # kernel shape streams every slice via lax.scan (children/leaf starts
    # LOCAL to the block; global face id = face_start + local row; all-zero
    # pad faces can never pass the plane test). The XLA-path bvh_*/wtri_*
    # arrays keep the global tree.
    treelets: tuple = dataclasses.field(default=(), metadata=dict(static=True))


_FIELDS = [f.name for f in dataclasses.fields(ScenePack)]
_META = ["bvh_depth", "n_sph", "n_pln", "n_msh", "n_lights", "has_file_tex",
         "n_texmaps", "treelets"]
_DATA = [n for n in _FIELDS if n not in _META]

jax.tree_util.register_dataclass(ScenePack, data_fields=_DATA, meta_fields=_META)
