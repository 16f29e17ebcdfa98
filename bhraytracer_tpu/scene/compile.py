"""Scene compiler: SceneDesc -> ScenePack (flat device arrays).

Folds node transform stacks to world space (replacing per-ray
ToNodeCoords/FromNodeCoords chains, scene.h:490-501), builds per-mesh BVHs
and concatenates them, resolves per-face material ids, packs textures into a
padded atlas, and sorts lights ascending by gray intensity exactly as
CalculateLightsIntensity does (Main.cpp:116-123).
"""

from __future__ import annotations

from typing import List

import jax.numpy as jnp
import numpy as np

from bhraytracer_tpu.accel.bvh import build_bvh
from bhraytracer_tpu.scene import desc as D
from bhraytracer_tpu.scene.pack import ScenePack

_LIGHT_KIND = {"ambient": 0, "direct": 1, "point": 2}


def compile_scene(sd: D.SceneDesc, leaf_size: int = 4) -> ScenePack:
    f32, i32 = np.float32, np.int32

    # ---------- materials ----------
    mats: List[D.MaterialDesc] = list(sd.materials)
    if not mats:
        mats = [D.MaterialDesc(name="__default__")]

    def tc_color(tc: D.TexturedColorDesc) -> np.ndarray:
        return np.asarray(tc.color, f32)

    m = len(mats)
    mtl = dict(
        mtl_diffuse=np.stack([tc_color(x.diffuse) for x in mats]),
        mtl_specular=np.stack([tc_color(x.specular) for x in mats]),
        mtl_gloss=np.array([x.glossiness for x in mats], f32),
        mtl_emission=np.stack([tc_color(x.emission) for x in mats]),
        mtl_reflection=np.stack([tc_color(x.reflection) for x in mats]),
        mtl_refl_gloss=np.array([x.reflection_glossiness for x in mats], f32),
        mtl_refraction=np.stack([tc_color(x.refraction) for x in mats]),
        mtl_refr_gloss=np.array([x.refraction_glossiness for x in mats], f32),
        mtl_ior=np.array([x.ior for x in mats], f32),
        mtl_absorption=np.stack([np.asarray(x.absorption, f32) for x in mats]),
        mtl_diffuse_tm=np.array([x.diffuse.texmap for x in mats], i32),
        mtl_specular_tm=np.array([x.specular.texmap for x in mats], i32),
        mtl_emission_tm=np.array([x.emission.texmap for x in mats], i32),
        mtl_reflection_tm=np.array([x.reflection.texmap for x in mats], i32),
        mtl_refraction_tm=np.array([x.refraction.texmap for x in mats], i32),
    )

    def mtl_index(name: str) -> int:
        for i, x in enumerate(mats):
            if x.name == name:
                return i
        return -1

    # ---------- instances ----------
    sph, pln, msh = [], [], []
    for node in sd.nodes:
        rec = (
            node.transform.itm.astype(f32),
            node.transform.tm.astype(f32),
            node.transform.pos.astype(f32),
            max(node.material, 0),
            node.mesh,
            node.name,
        )
        if node.kind == "sphere":
            sph.append(rec)
        elif node.kind == "plane":
            pln.append(rec)
        elif node.kind == "mesh":
            msh.append((*rec[:4], node.mesh, node.name, node.material))

    def pack_analytic(recs):
        # Pad empty categories with one inert identity instance so gathers in
        # resolve_hit stay in-bounds; trace skips them via the static n_* count.
        if recs:
            return (
                np.stack([r[0] for r in recs]),
                np.stack([r[1] for r in recs]),
                np.stack([r[2] for r in recs]),
                np.array([r[3] for r in recs], i32),
            )
        return (
            np.eye(3, dtype=f32)[None],
            np.eye(3, dtype=f32)[None],
            np.zeros((1, 3), f32),
            np.zeros((1,), i32),
        )

    sph_itm, sph_tm, sph_pos, sph_mtl = pack_analytic(sph)
    pln_itm, pln_tm, pln_pos, pln_mtl = pack_analytic(pln)

    # ---------- meshes + BVH ----------
    verts_l, normals_l, uvs_l = [], [], []
    fv_l, fvn_l, fvt_l, fmtl_l = [], [], [], []
    bmin_l, bmax_l, bleft_l, bcount_l = [], [], [], []
    mesh_roots: List[int] = []  # per distinct mesh
    bvh_depth = 1
    v_off = n_off = t_off = f_off = b_off = 0
    for mesh_idx, mesh in enumerate(sd.meshes):
        bvh = build_bvh(mesh.verts, mesh.faces, leaf_size=leaf_size)
        bvh_depth = max(bvh_depth, bvh.depth)
        order = bvh.face_order
        verts_l.append(mesh.verts)
        normals_l.append(mesh.normals)
        uvs_l.append(mesh.uvs)
        fv_l.append(mesh.faces[order] + v_off)
        fvn_l.append(mesh.face_normals[order] + n_off)
        fvt_l.append(mesh.face_uvs[order] + t_off)
        fmtl_l.append((mesh.face_mtl[order], mesh_idx))
        bmin_l.append(bvh.bmin)
        bmax_l.append(bvh.bmax)
        left = bvh.left.copy()
        left[bvh.count > 0] += f_off
        left[bvh.count == 0] += b_off
        bleft_l.append(left)
        bcount_l.append(bvh.count)
        mesh_roots.append(b_off)
        v_off += mesh.verts.shape[0]
        n_off += mesh.normals.shape[0]
        t_off += mesh.uvs.shape[0]
        f_off += mesh.faces.shape[0]
        b_off += bvh.bmin.shape[0]

    # Resolve per-face global material ids: the auto multi-material names are
    # "<node name>#<slot>" where node name is the OBJ path (xmlload.cpp:243).
    mesh_name_by_idx = {}
    for node in sd.nodes:
        if node.kind == "mesh" and node.mesh >= 0:
            mesh_name_by_idx.setdefault(node.mesh, node.name)
    fmtl_res = []
    for slots, mesh_idx in fmtl_l:
        name = mesh_name_by_idx.get(mesh_idx, "")
        out = np.zeros(slots.shape[0], i32)
        for slot in np.unique(slots):
            gid = mtl_index(f"{name}#{slot}") if slot >= 0 else -1
            out[slots == slot] = max(gid, 0)
        fmtl_res.append(out)

    def cat(lst, empty_shape, dtype):
        if lst:
            return np.concatenate(lst).astype(dtype)
        return np.zeros(empty_shape, dtype)

    verts = cat(verts_l, (1, 3), f32)
    normals = cat(normals_l, (1, 3), f32)
    uvs = cat(uvs_l, (1, 3), f32)
    face_v = cat(fv_l, (1, 3), i32)
    face_vn = cat(fvn_l, (1, 3), i32)
    face_vt = cat(fvt_l, (1, 3), i32)
    face_mtl = cat(fmtl_res, (1,), i32)
    bvh_bmin = cat(bmin_l, (1, 3), f32)
    bvh_bmax = cat(bmax_l, (1, 3), f32)
    bvh_left = cat(bleft_l, (1,), i32)
    bvh_count = cat(bcount_l, (1,), i32)
    if not bcount_l:
        bvh_count = np.ones((1,), i32)  # degenerate leaf w/ 1 dummy face

    nb = bvh_bmin.shape[0]
    pallas_nodes = np.zeros((nb, 16), f32)
    pallas_nodes[:, 0:3] = bvh_bmin
    pallas_nodes[:, 3:6] = bvh_bmax
    pallas_nodes[:, 6] = bvh_left.astype(f32)
    pallas_nodes[:, 7] = bvh_count.astype(f32)
    nf_all = face_v.shape[0]
    pallas_faces = np.zeros((nf_all, 16), f32)
    pallas_faces[:, 0:3] = verts[face_v[:, 0]]
    pallas_faces[:, 3:6] = verts[face_v[:, 1]]
    pallas_faces[:, 6:9] = verts[face_v[:, 2]]

    if msh:
        msh_itm = np.stack([r[0] for r in msh])
        msh_tm = np.stack([r[1] for r in msh])
        msh_pos = np.stack([r[2] for r in msh])
        # -1 instance material = use per-face table.
        msh_mtl = np.array([r[6] for r in msh], i32)
        msh_root = np.array([mesh_roots[r[4]] for r in msh], i32)
    else:
        msh_itm = np.eye(3, dtype=f32)[None]
        msh_tm = np.eye(3, dtype=f32)[None]
        msh_pos = np.zeros((1, 3), f32)
        msh_mtl = np.zeros((1,), i32)
        msh_root = np.zeros((1,), i32)

    # ---------- texture maps + atlas ----------
    texmaps = sd.texmaps or []
    ntm = max(1, len(texmaps))
    tm_tex = np.zeros(ntm, i32)
    tm_itm = np.tile(np.eye(3, dtype=f32), (ntm, 1, 1))
    tm_pos = np.zeros((ntm, 3), f32)
    for i, t in enumerate(texmaps):
        tm_tex[i] = t.texture
        tm_itm[i] = t.transform.itm.astype(f32)
        tm_pos[i] = t.transform.pos.astype(f32)

    textures = sd.textures or []
    nt = max(1, len(textures))
    tex_kind = np.zeros(nt, i32)
    tex_c1 = np.zeros((nt, 3), f32)
    tex_c2 = np.ones((nt, 3), f32)
    tex_wh = np.ones((nt, 2), i32)
    hmax = wmax = 1
    has_file_tex = any(t.kind == "file" for t in textures)
    for t in textures:
        if t.kind == "file" and t.image is not None:
            hmax = max(hmax, t.image.shape[0])
            wmax = max(wmax, t.image.shape[1])
    atlas = np.zeros((nt, hmax, wmax, 3), np.uint8)
    for i, t in enumerate(textures):
        if t.kind == "checker":
            tex_kind[i] = 1
            tex_c1[i] = t.color1
            tex_c2[i] = t.color2
        elif t.image is not None:
            h, w = t.image.shape[:2]
            tex_wh[i] = (w, h)
            atlas[i, :h, :w] = t.image

    # ---------- lights (sorted ascending by gray; Main.cpp:117) ----------
    lights = sorted(sd.lights, key=lambda li: li.gray)
    nl = max(1, len(lights))
    light_kind = np.zeros(nl, i32)
    light_intensity = np.zeros((nl, 3), f32)
    light_vec = np.zeros((nl, 3), f32)
    light_size = np.zeros(nl, f32)
    for i, li in enumerate(lights):
        light_kind[i] = _LIGHT_KIND[li.kind]
        light_intensity[i] = li.intensity
        light_vec[i] = li.direction if li.kind == "direct" else li.position
        light_size[i] = li.size

    pack = ScenePack(
        sph_itm=sph_itm, sph_tm=sph_tm, sph_pos=sph_pos, sph_mtl=sph_mtl,
        pln_itm=pln_itm, pln_tm=pln_tm, pln_pos=pln_pos, pln_mtl=pln_mtl,
        msh_itm=msh_itm, msh_tm=msh_tm, msh_pos=msh_pos, msh_mtl=msh_mtl,
        msh_root=msh_root,
        verts=verts, normals=normals, uvs=uvs,
        face_v=face_v, face_vn=face_vn, face_vt=face_vt, face_mtl=face_mtl,
        bvh_bmin=bvh_bmin, bvh_bmax=bvh_bmax, bvh_left=bvh_left,
        bvh_count=bvh_count, pallas_nodes=pallas_nodes, pallas_faces=pallas_faces,
        **{k: v for k, v in mtl.items()},
        tm_tex=tm_tex, tm_itm=tm_itm, tm_pos=tm_pos,
        tex_kind=tex_kind, tex_c1=tex_c1, tex_c2=tex_c2, tex_wh=tex_wh,
        atlas=atlas,
        bg_color=np.asarray(sd.background.color, f32),
        bg_tm=np.array(sd.background.texmap, i32),
        env_color=np.asarray(sd.environment.color, f32),
        env_tm=np.array(sd.environment.texmap, i32),
        light_kind=light_kind, light_intensity=light_intensity,
        light_vec=light_vec, light_size=light_size,
        bvh_depth=bvh_depth,
        n_sph=len(sph), n_pln=len(pln), n_msh=len(msh),
        n_lights=len(lights), has_file_tex=has_file_tex,
        n_texmaps=len(texmaps),
    )
    # Host numpy -> device jnp.
    import jax

    return jax.tree.map(jnp.asarray, pack)
