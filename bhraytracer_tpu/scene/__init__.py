from bhraytracer_tpu.scene.desc import (
    Camera,
    LightDesc,
    MaterialDesc,
    NodeDesc,
    SceneDesc,
    TexturedColorDesc,
    TextureMapDesc,
)
from bhraytracer_tpu.scene.xml_loader import load_scene, parse_scene_xml
from bhraytracer_tpu.scene.pack import ScenePack
from bhraytracer_tpu.scene.compile import compile_scene

__all__ = [
    "Camera",
    "LightDesc",
    "MaterialDesc",
    "NodeDesc",
    "SceneDesc",
    "TexturedColorDesc",
    "TextureMapDesc",
    "load_scene",
    "parse_scene_xml",
    "ScenePack",
    "compile_scene",
]
