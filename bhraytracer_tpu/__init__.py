"""bhraytracer_tpu — a TPU-native differentiable Monte-Carlo path tracer.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference
C++ renderer (BosonHBC/BHRayTracer): XML scene loading, sphere/plane/OBJ-mesh
geometry with BVH acceleration, Blinn-Phong path tracing with Fresnel
reflect/refract + total internal reflection + Beer-Lambert absorption,
one-bounce-budgeted global illumination, soft-shadowed point lights, textures
(file / checker / environment), photon-map caustics, and a learned denoiser
head — all as batched wavefront compute on TPU with reverse-mode gradients
w.r.t. camera, material, light and vertex parameters.

The reference's recursive per-pixel megakernel (BHRayTracer/Main.cpp:143,
Materials/Blinn/MtlBlinn.cpp:89) is re-architected here as a bounded-depth
*tree wavefront*: each shade level is a flat SoA batch traced and shaded in
parallel; radiance is combined in a backward sweep that reproduces the
reference's per-stage clamping semantics.
"""

__version__ = "0.1.0"

from bhraytracer_tpu.config import RenderConfig
from bhraytracer_tpu.scene.xml_loader import load_scene
from bhraytracer_tpu.models.pathtracer import render_image

__all__ = ["RenderConfig", "load_scene", "render_image", "__version__"]
