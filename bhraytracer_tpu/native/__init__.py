from bhraytracer_tpu.native.build import get_lib, have_native

__all__ = ["get_lib", "have_native"]
