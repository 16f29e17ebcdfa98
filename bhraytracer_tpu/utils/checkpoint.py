"""Checkpoint / resume.

The reference's only persistence is the photon-map `.dat` dump — a killed
render loses everything (SURVEY §5). Here render accumulation state and
inverse-rendering train state are checkpointable:

  - render state: accumulation buffer + z-buffer + per-chunk completion map
    + the RNG seed and a config fingerprint (a resumed render continues the
    exact same sample streams);
  - train state: any parameter/optimizer pytree via orbax (sharded-array
    aware), with a .npz fallback when orbax is unavailable.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Optional

import numpy as np


def _cfg_fingerprint(cfg, width: int, height: int, seed: int) -> str:
    d = dataclasses.asdict(cfg)
    d.update(width=width, height=height, seed=seed)
    return json.dumps(d, sort_keys=True)


def save_render_state(path: str, accum, zbuffer, done, cfg, width, height, seed):
    os.makedirs(path, exist_ok=True)
    # np.savez appends ".npz" unless the name already ends with it.
    tmp = os.path.join(path, "render_state.tmp.npz")
    np.savez_compressed(
        tmp,
        accum=np.asarray(accum, np.float32),
        zbuffer=np.asarray(zbuffer, np.float32),
        done=np.asarray(done, bool),
    )
    # Atomic publish: a kill mid-save never corrupts the previous checkpoint.
    os.replace(tmp, os.path.join(path, "render_state.npz"))
    with open(os.path.join(path, "render_meta.json"), "w") as f:
        f.write(_cfg_fingerprint(cfg, width, height, seed))


def load_render_state(path: str, cfg, width, height, seed):
    """Returns (accum, zbuffer, done) or None if absent/incompatible."""
    npz = os.path.join(path, "render_state.npz")
    meta = os.path.join(path, "render_meta.json")
    if not (os.path.exists(npz) and os.path.exists(meta)):
        return None
    with open(meta) as f:
        if f.read() != _cfg_fingerprint(cfg, width, height, seed):
            return None  # different render; start over
    data = np.load(npz)
    return data["accum"], data["zbuffer"], data["done"]


# ---------------------------------------------------------------------------
# train-state checkpoints (orbax with npz fallback)
# ---------------------------------------------------------------------------


def save_train_state(path: str, state) -> None:
    """state: any pytree of arrays."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        ckptr.save(os.path.abspath(path), state, force=True)
    except Exception:
        import jax

        flat, treedef = jax.tree.flatten(state)
        os.makedirs(path, exist_ok=True)
        np.savez(
            os.path.join(path, "state.npz"),
            *[np.asarray(x) for x in flat],
        )
        with open(os.path.join(path, "treedef.txt"), "w") as f:
            f.write(str(treedef))


def load_train_state(path: str, like) -> Optional[object]:
    """Restore a pytree with the same structure as `like`."""
    try:
        import orbax.checkpoint as ocp

        ckptr = ocp.PyTreeCheckpointer()
        return ckptr.restore(os.path.abspath(path), item=like)
    except Exception:
        import jax

        npz = os.path.join(path, "state.npz")
        if not os.path.exists(npz):
            return None
        data = np.load(npz)
        flat, treedef = jax.tree.flatten(like)
        vals = [data[k] for k in data.files]
        if len(vals) != len(flat):
            return None
        return jax.tree.unflatten(treedef, vals)
