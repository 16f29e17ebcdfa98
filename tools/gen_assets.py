"""Generate stand-in mesh assets for the bundled scenes.

The reference repository references OBJ meshes (teapot.obj etc.) that are
not checked in. This tool generates teapot-class surface-of-revolution
stand-ins so the mesh/BVH path of every bundled scene can run:

    python tools/gen_assets.py assets
    python -m bhraytracer_tpu render .../proj12.xml --resource-root assets ...

(The loader searches --resource-root before the scene directory, so
"Resource/Data/teapot.obj" resolves into the generated tree.)
"""

from __future__ import annotations

import os
import sys

import numpy as np

# Asset generation is pure numpy + the project PNG writer, but importing
# bhraytracer_tpu (for write_png) initializes JAX — and this host pins
# JAX_PLATFORMS=axon, whose backend init BLOCKS retrying the tunnel when the
# TPU is unreachable. Tests spawn this tool as a subprocess (no conftest), so
# force CPU before any bhraytracer_tpu import or the whole suite hangs.
import jax

jax.config.update("jax_platforms", "cpu")


def revolve(profile, n_seg: int = 64):
    """Surface of revolution around +z from an (M,2) (r, z) profile.

    Returns (verts (V,3), faces (F,3)) with smooth closure at both ends if
    the profile starts/ends at r=0.
    """
    profile = np.asarray(profile, np.float64)
    m = profile.shape[0]
    ang = np.linspace(0, 2 * np.pi, n_seg, endpoint=False)
    ca, sa = np.cos(ang), np.sin(ang)
    verts = []
    rows = []
    for r, z in profile:
        if r <= 1e-9:
            rows.append((len(verts), 1))
            verts.append((0.0, 0.0, z))
        else:
            rows.append((len(verts), n_seg))
            for c, s in zip(ca, sa):
                verts.append((r * c, r * s, z))
    faces = []
    for i in range(m - 1):
        s0, n0 = rows[i]
        s1, n1 = rows[i + 1]
        if n0 == 1 and n1 == 1:
            continue
        if n0 == 1:
            for k in range(n1):
                faces.append((s0, s1 + (k + 1) % n1, s1 + k))
        elif n1 == 1:
            for k in range(n0):
                faces.append((s0 + k, s0 + (k + 1) % n0, s1))
        else:
            for k in range(n_seg):
                k2 = (k + 1) % n_seg
                faces.append((s0 + k, s1 + k2, s1 + k))
                faces.append((s0 + k, s0 + k2, s1 + k2))
    return np.asarray(verts, np.float32), np.asarray(faces, np.int32)


def teapot_profile():
    """A teapot-ish body + lid profile (r, z), z in [0, ~14] like the classic
    teapot's scale (scenes scale it by ~0.3-0.5)."""
    body = [
        (0.0, 0.0), (5.0, 0.0), (6.6, 1.4), (7.3, 3.4), (7.0, 5.4),
        (6.0, 7.2), (4.6, 8.4), (4.2, 9.0),
    ]
    lid = [(4.4, 9.4), (2.4, 10.0), (1.3, 10.6), (1.4, 11.8), (0.0, 12.6)]
    return body + lid


def torus(r_major=3.0, r_minor=1.0, n_u=48, n_v=24):
    u = np.linspace(0, 2 * np.pi, n_u, endpoint=False)
    v = np.linspace(0, 2 * np.pi, n_v, endpoint=False)
    uu, vv = np.meshgrid(u, v, indexing="ij")
    x = (r_major + r_minor * np.cos(vv)) * np.cos(uu)
    y = (r_major + r_minor * np.cos(vv)) * np.sin(uu)
    z = r_minor * np.sin(vv)
    verts = np.stack([x, y, z], -1).reshape(-1, 3).astype(np.float32)
    faces = []
    for i in range(n_u):
        for j in range(n_v):
            a = i * n_v + j
            b = ((i + 1) % n_u) * n_v + j
            c = ((i + 1) % n_u) * n_v + (j + 1) % n_v
            d = i * n_v + (j + 1) % n_v
            faces.append((a, b, c))
            faces.append((a, c, d))
    return verts, np.asarray(faces, np.int32)


def thin_slab(w=1.0, h=1.0, t=0.05):
    """A thin two-sided sheet (stand-in for blend2.obj's glass pane)."""
    v = np.array(
        [
            [-w, -h, 0], [w, -h, 0], [w, h, 0], [-w, h, 0],
            [-w, -h, t], [w, -h, t], [w, h, t], [-w, h, t],
        ],
        np.float32,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # bottom (facing -z)
            [4, 5, 6], [4, 6, 7],  # top
            [0, 1, 5], [0, 5, 4],
            [1, 2, 6], [1, 6, 5],
            [2, 3, 7], [2, 7, 6],
            [3, 0, 4], [3, 4, 7],
        ],
        np.int32,
    )
    return v, f


def write_obj(path, verts, faces):
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with open(path, "w") as f:
        f.write("# generated stand-in mesh (tools/gen_assets.py)\n")
        for v in verts:
            f.write(f"v {v[0]:.6f} {v[1]:.6f} {v[2]:.6f}\n")
        for a, b, c in faces + 1:
            f.write(f"f {a} {b} {c}\n")


def box(w=1.0, d=1.0, h=1.0):
    return thin_slab(w, d, h)


def plank(hx=0.4, hy=0.06, hz=2.2):
    """Centered flat plank (metalBar.obj stand-in): thin in y, long in z."""
    v, f = thin_slab(hx, hy, 2 * hz)
    v = v - np.array([0.0, 0.0, hz], np.float32)
    return v, f


def studio_backdrop(half=4.0, wall_x=2.0, wall_h=4.0):
    """Open photo-studio backdrop (background.obj stand-in): a y=0 floor
    (normal +y) and a single back wall at x=wall_x (normal -x), open on
    every other side so cameras placed anywhere in front see the scene."""
    v = np.array(
        [
            [-half, 0, -half], [half, 0, -half],
            [half, 0, half], [-half, 0, half],
            [wall_x, 0, -half], [wall_x, 0, half],
            [wall_x, wall_h, half], [wall_x, wall_h, -half],
        ],
        np.float32,
    )
    f = np.array(
        [
            [0, 2, 1], [0, 3, 2],  # floor, normal +y
            [4, 5, 6], [4, 6, 7],  # back wall, normal -x
        ],
        np.int32,
    )
    return v, f


def dense_profile(profile, rows: int):
    """Catmull-Rom-ish densification of an (M,2) profile to ~`rows` rows
    (linear interp is enough for a benchmark asset; the point is face
    count, not beauty)."""
    p = np.asarray(profile, np.float64)
    seg = np.linalg.norm(np.diff(p, axis=0), axis=1)
    t = np.concatenate([[0.0], np.cumsum(seg)])
    tt = np.linspace(0.0, t[-1], rows)
    r = np.interp(tt, t, p[:, 0])
    z = np.interp(tt, t, p[:, 1])
    return np.stack([r, z], -1)


def gen_big_mesh(root: str, rows: int = 220, n_seg: int = 256) -> None:
    """teapot_hires.obj: a ~112K-face revolve of the same teapot profile —
    the big-mesh benchmark asset (the bundled scenes top out at 1408 faces,
    which hides the stream kernel's O(F) scaling; cyBVH handles arbitrary
    OBJs, TriObj.cpp:192-270)."""
    v, f = revolve(dense_profile(teapot_profile(), rows), n_seg=n_seg)
    write_obj(os.path.join(root, "Resource", "Data", "teapot_hires.obj"), v, f)
    print(f"teapot_hires: {v.shape[0]} verts, {f.shape[0]} tris")


def main(root: str) -> None:
    v, f = revolve(teapot_profile(), n_seg=64)
    for name in [
        "Resource/Data/teapot.obj",
        "Resource/Data/teapot2.obj",
        "Resource/Data/cat.obj",
        "Resource/BHRTFinal/01_teapot.obj",
    ]:
        write_obj(os.path.join(root, name), v, f)
    print(f"teapot stand-in: {v.shape[0]} verts, {f.shape[0]} tris")

    # proj12_metals' golden shows flat planks (long in z, thin in y), stacked
    # by the scene's +0.3 x/y translate steps; a torus stand-in at radius 3
    # filled the whole camera frustum and blacked the frame.
    v, f = plank()
    write_obj(os.path.join(root, "Resource/Data/metalBar.obj"), v, f)
    v, f = thin_slab()
    for name in [
        "Resource/Data/blend2.obj",
        "Resource/Data/backfaceTest.obj",
        "Resource/BHRTFinal/10_window.obj",
        "Resource/BHRTFinal/08_waterMesh.obj",
        "Resource/TestRoom/00_WallLeft.obj",
        "Resource/TestRoom/00_WallRight.obj",
        "Resource/TestRoom/00_WallTopDown.obj",
    ]:
        write_obj(os.path.join(root, name), v, f)
    v, f = revolve([(0.0, 0.0), (3.0, 0.0), (3.6, 2.0), (2.6, 4.2), (0.0, 4.6)], 48)
    write_obj(os.path.join(root, "Resource/BHRTFinal/02_cup.obj"), v, f)
    # proj12_metals puts its camera INSIDE background.obj's footprint: a
    # closed-box stand-in swallows the camera and renders black. The real
    # asset is a photo-studio backdrop, so the stand-in is an OPEN one —
    # floor plus back wall, normals facing the scene (no front/side walls).
    v, f = studio_backdrop()
    write_obj(os.path.join(root, "Resource/Data/background.obj"), v, f)
    v, f = box(4.0, 4.0, 0.8)
    for name in [
        "Resource/BHRTFinal/03_base.obj",
        "Resource/BHRTFinal/03_base_Internal.obj",
        "Resource/BHRTFinal/06_bigBase.obj",
        "Resource/BHRTFinal/07_OverallRoom.obj",
        "Resource/BHRTFinal/12_woodStand.obj",
    ]:
        write_obj(os.path.join(root, name), v, f)
    # Stand-in textures referenced by the final scenes.
    import sys as _sys
    _sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from bhraytracer_tpu.utils.png import write_png

    yy, xx = np.mgrid[0:256, 0:256]
    china = np.stack([
        200 + 40 * np.sin(xx / 9.0) * np.sin(yy / 9.0),
        200 + 30 * np.sin(xx / 17.0),
        230 + 20 * np.cos(yy / 13.0),
    ], -1).clip(0, 255).astype(np.uint8)
    wood = np.stack([
        120 + 60 * np.sin((xx + 3 * np.sin(yy / 23.0)) / 6.0),
        80 + 40 * np.sin((xx + 3 * np.sin(yy / 23.0)) / 6.0),
        40 + 20 * np.sin((xx + 3 * np.sin(yy / 23.0)) / 6.0),
    ], -1).clip(0, 255).astype(np.uint8)
    for name, img in [("china.png", china), ("wood.png", wood)]:
        path = os.path.join(root, "Resource", "BHRTFinal", name)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        write_png(path, img)
    print(f"wrote assets under {root}")


if __name__ == "__main__":
    root = sys.argv[1] if len(sys.argv) > 1 else "assets"
    main(root)
    if "--big" in sys.argv:
        gen_big_mesh(root)
