"""Persistent XLA compilation cache (big win: TPU compiles of the staged
integrator take seconds after the first run)."""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    # TPU-only: with the axon plugin present, enabling the persistent cache
    # on CPU-forced runs deadlocks the compile (futex wait inside the remote
    # compile path). TPU compiles are the multi-minute ones anyway.
    if jax.default_backend() != "tpu":
        return
    path = path or os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__)))), ".jax_cache")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2)
    except Exception:
        pass  # older jax without these options
