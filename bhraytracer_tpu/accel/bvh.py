"""Host-side BVH builder over triangle bounds.

Functional equivalent of cy::BVH's mid-split build (cyBVH.h:122-142,
242-328: split at the center of the widest axis by element centroid, with
axis fallbacks and a forced halving when a side comes up empty; small leaves)
— but emitting a TPU-friendly flat SoA layout instead of packed 32-bit node
words: per node AABB min/max, explicit child indices (siblings adjacent, as
in cyBVH.h:93), and a contiguous [face_start, face_start+count) range for
leaves (faces are reordered so every leaf is a contiguous slice).

The traversals consuming this layout live in ops/trace.py (XLA while_loop
short-stack: bvh_closest/bvh_anyhit) and ops/pallas_bvh.py (packet kernel).
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BVHArrays:
    # (B, 3) node bounds.
    bmin: np.ndarray
    bmax: np.ndarray
    # (B,) left child index (right child = left + 1); for leaves: face start.
    left: np.ndarray
    # (B,) leaf face count; 0 for internal nodes.
    count: np.ndarray
    # (F,) permutation: leaf-order slot -> original face index.
    face_order: np.ndarray
    # Maximum depth of the tree (traversal stack sizing).
    depth: int


def build_bvh(verts: np.ndarray, faces: np.ndarray, leaf_size: int = 4) -> BVHArrays:
    """Build a binary BVH. leaf_size mirrors TriObj's bvh.SetMesh(this, 4)
    (objects.h:59). Uses the native C++ builder when available; the Python
    fallback produces an equivalent (same-quality) tree."""
    from bhraytracer_tpu.native.build import get_lib

    lib = get_lib()
    if lib is not None and faces.shape[0] > 0:
        import ctypes

        nf = faces.shape[0]
        cap = 2 * nf + 2
        verts_c = np.ascontiguousarray(verts, np.float32)
        faces_c = np.ascontiguousarray(faces, np.int32)
        bmin = np.zeros((cap, 3), np.float32)
        bmax = np.zeros((cap, 3), np.float32)
        left = np.zeros(cap, np.int32)
        count = np.zeros(cap, np.int32)
        order = np.zeros(nf, np.int32)
        depth = ctypes.c_int32(0)
        nn = lib.bhrt_bvh_build(
            verts_c.ctypes.data, faces_c.ctypes.data, nf, leaf_size,
            bmin.ctypes.data, bmax.ctypes.data, left.ctypes.data,
            count.ctypes.data, order.ctypes.data, ctypes.byref(depth),
        )
        if nn > 0:
            return BVHArrays(
                bmin=bmin[:nn], bmax=bmax[:nn], left=left[:nn],
                count=count[:nn], face_order=order, depth=int(depth.value),
            )
    return _build_bvh_py(verts, faces, leaf_size)


def build_treelet_layout(left: np.ndarray, count: np.ndarray,
                         node_rows: np.ndarray, face_rows: np.ndarray,
                         budget_rows: int):
    """Partition the tree into UNIFORM VMEM-sized treelets for streaming.

    Walks down from the root until every subtree fits a fixed per-treelet
    (node, face) row budget, then re-emits each treelet's nodes in DFS order
    with LOCAL child indices (leaf `left` becomes the face offset local to
    the treelet's face block) and copies its face rows into a per-treelet
    block. EVERY treelet is padded to the same (NB, FB) shape — one Mosaic
    kernel shape serves all slices (and all big scenes), and the caller
    streams them with a `lax.scan`, so XLA program size is constant in the
    treelet count. Padding face rows are all-zero: a degenerate triangle's
    plane test can never pass (n = 0 -> |cos| < PERP_EPS).

    Returns (treelets, padded_nodes (T*NB, C), padded_faces (T*FB, C)) with
    `treelets` a tuple of (face_start, face_end) GLOBAL face ranges per
    treelet (global face id = face_start + local row). Relies on both
    builders' DFS-left-first emission: every subtree owns a contiguous face
    range and child ids exceed the parent's (asserted).

    The reference has no analogue (cyBVH traverses from host RAM); this is
    the TPU answer to meshes whose tables exceed the packet kernel's VMEM
    budget — per-lane best-t carries across treelets so pruning compounds."""
    n = left.shape[0]
    internal = count == 0
    li = left[internal]
    assert (li > np.nonzero(internal)[0]).all(), "child ids must follow parent"

    # Fixed split of the row budget: mid-split with leaf_size 4 gives
    # roughly one node per two faces, so reserve a third for nodes (a
    # leaf-heavy subtree then binds on NB and wastes face rows — only
    # padding, never correctness).
    nb = max(8, (budget_rows // 3) & ~7)
    fb = budget_rows - nb

    sub_nodes = np.ones(n, np.int64)
    sub_faces = count.astype(np.int64).copy()
    fstart = left.astype(np.int64).copy()
    for i in range(n - 1, -1, -1):
        if count[i] == 0:
            l = int(left[i])
            sub_nodes[i] += sub_nodes[l] + sub_nodes[l + 1]
            sub_faces[i] = sub_faces[l] + sub_faces[l + 1]
            fstart[i] = fstart[l]
    # DFS-contiguity check: right sibling's faces start where left's end.
    assert (fstart[li + 1] == fstart[li] + sub_faces[li]).all(), (
        "subtree face ranges are not contiguous")

    cut = []
    stack = [0]
    while stack:
        nid = stack.pop()
        if count[nid] > 0 or (sub_nodes[nid] <= nb and sub_faces[nid] <= fb):
            cut.append(nid)
        else:
            stack.append(int(left[nid]) + 1)
            stack.append(int(left[nid]))

    t = len(cut)
    nodes = np.zeros((t * nb, node_rows.shape[1]), node_rows.dtype)
    faces = np.zeros((t * fb, face_rows.shape[1]), face_rows.dtype)
    treelets = []
    for ti, cn in enumerate(cut):
        fs = int(fstart[cn])
        fe = fs + int(sub_faces[cn])
        faces[ti * fb:ti * fb + (fe - fs)] = face_rows[fs:fe]
        rows = nodes[ti * nb:(ti + 1) * nb]
        # Local ids in DFS pre-order with sibling pairs adjacent (the kernel
        # assumes right child = left + 1).
        loc = {cn: 0}
        nxt = 1
        st = [cn]
        while st:
            nid = st.pop()
            lid = loc[nid]
            rows[lid] = node_rows[nid]
            if count[nid] == 0:
                l = int(left[nid])
                loc[l] = nxt
                loc[l + 1] = nxt + 1
                nxt += 2
                rows[lid, 6] = float(loc[l])
                st.append(l + 1)
                st.append(l)
            else:
                rows[lid, 6] = float(int(left[nid]) - fs)
        treelets.append((fs, fe))
    return tuple(treelets), nodes, faces


def _build_bvh_py(verts: np.ndarray, faces: np.ndarray, leaf_size: int = 4) -> BVHArrays:
    """Pure-numpy builder fallback."""
    nf = faces.shape[0]
    tri = verts[faces]  # (F, 3, 3)
    tmin = tri.min(axis=1)
    tmax = tri.max(axis=1)
    centroids = 0.5 * (tmin + tmax)

    bmins: list = []
    bmaxs: list = []
    lefts: list = []
    counts: list = []
    order: list = []
    max_depth = 1

    def reserve() -> int:
        bmins.append(None)
        bmaxs.append(None)
        lefts.append(0)
        counts.append(0)
        return len(bmins) - 1

    root = reserve()
    work = [(root, np.arange(nf), 1)]
    while work:
        node_id, elem, depth = work.pop()
        max_depth = max(max_depth, depth)
        bmins[node_id] = tmin[elem].min(axis=0)
        bmaxs[node_id] = tmax[elem].max(axis=0)
        if elem.shape[0] <= leaf_size:
            lefts[node_id] = len(order)
            counts[node_id] = elem.shape[0]
            order.extend(elem.tolist())
            continue
        cen = centroids[elem]
        ext = cen.max(axis=0) - cen.min(axis=0)
        mask = None
        # Try axes from widest; mid-split by centroid (cyBVH "MeanSplit").
        for axis in np.argsort(-ext):
            mid = 0.5 * (cen[:, axis].max() + cen[:, axis].min())
            m = cen[:, axis] < mid
            if m.any() and (~m).any():
                mask = m
                break
        if mask is None:
            # All centroids identical: forced halving (cyBVH.h:318-327).
            mask = np.zeros(elem.shape[0], bool)
            mask[: elem.shape[0] // 2] = True
        left_id = reserve()
        right_id = reserve()
        assert right_id == left_id + 1
        lefts[node_id] = left_id
        work.append((right_id, elem[~mask], depth + 1))
        work.append((left_id, elem[mask], depth + 1))

    return BVHArrays(
        bmin=np.asarray(bmins, np.float32).reshape(-1, 3),
        bmax=np.asarray(bmaxs, np.float32).reshape(-1, 3),
        left=np.asarray(lefts, np.int32),
        count=np.asarray(counts, np.int32),
        face_order=np.asarray(order, np.int32),
        depth=max_depth,
    )
