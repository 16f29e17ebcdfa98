import os

import numpy as np

from bhraytracer_tpu.scene.xml_loader import load_scene, parse_scene_xml


def test_parse_proj2(reference_dir):
    path = os.path.join(reference_dir, "Resource", "Data", "proj2.xml")
    sd = parse_scene_xml(path, resource_root=reference_dir)
    # 3 spheres (one nested), 2 materials, 3 lights.
    assert len(sd.nodes) == 3
    assert all(nd.kind == "sphere" for nd in sd.nodes)
    assert len(sd.materials) == 2
    assert len(sd.lights) == 3
    assert sd.camera.width == 800 and sd.camera.height == 600
    # Nested sphere3's world transform composes sphere2's.
    s3 = [n for n in sd.nodes if n.name == "sphere3"][0]
    # sphere2: scale 8, rotate 30 about y, translate (0,50,5.1);
    # sphere3 local: scale .2, translate (0,0,1.2)
    # world pos of sphere3 center = R_y(30) @ (8*(0,0,1.2)) + (0,50,5.1)
    from bhraytracer_tpu.scene.desc import rotation_matrix

    expect = rotation_matrix(np.array([0, 1, 0]), 30.0) @ np.array([0, 0, 9.6]) + np.array(
        [0, 50, 5.1]
    )
    np.testing.assert_allclose(s3.transform.pos, expect, atol=1e-5)


def test_material_value_multiplier(reference_dir):
    path = os.path.join(reference_dir, "Resource", "Data", "proj2.xml")
    sd = parse_scene_xml(path, resource_root=reference_dir)
    m1 = [m for m in sd.materials if m.name == "mtl1"][0]
    np.testing.assert_allclose(m1.diffuse.color, [0.8, 0.2, 0.2])
    # specular r=1 g=1 b=1 value=0.7 -> (0.7, 0.7, 0.7)
    np.testing.assert_allclose(m1.specular.color, [0.7, 0.7, 0.7])
    assert m1.glossiness == 20.0


def test_lights_sorted_ascending(reference_dir):
    path = os.path.join(reference_dir, "Resource", "Data", "proj2.xml")
    pack, cam = load_scene(path, resource_root=reference_dir)
    gray = np.sum(np.asarray(pack.light_intensity), axis=1) / 3.0
    assert (np.diff(gray) >= 0).all()
    assert pack.n_lights == 3


def test_compile_proj12(reference_dir):
    # Cornell-style path tracing scene: planes + spheres (+ absent teapot OBJ
    # tolerated in lenient mode).
    path = os.path.join(reference_dir, "Resource", "Data", "proj12.xml")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pack, cam = load_scene(path, resource_root=reference_dir)
    assert pack.n_pln == 6
    assert pack.n_sph == 6
    # Refractive sphere material has ior 2.0 somewhere in the table.
    assert np.isclose(np.asarray(pack.mtl_ior).max(), 2.0)


def test_texture_scene_proj10(reference_dir):
    path = os.path.join(reference_dir, "Resource", "Data", "proj10.xml")
    import warnings

    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        pack, cam = load_scene(path, resource_root=reference_dir)
    # clouds.png (dedup'd), bricks.png, one checker.
    assert pack.tex_kind.shape[0] == 3
    assert int(pack.bg_tm) >= 0
    assert int(pack.env_tm) >= 0
    assert pack.has_file_tex
