"""Inverse rendering demo (BASELINE config 5): recover material colors by
gradient descent on a rendered target across the device mesh.

Ground-truth scene -> render target image; perturb the material table;
optimize it back with Adam on sharded lanes (gradients psum over dp).

    python examples/inverse_render.py [--steps 60] [--out /tmp/invrender]
"""

from __future__ import annotations

import argparse
import dataclasses
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=60)
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--out", default="/tmp/invrender")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import warnings

    warnings.filterwarnings("ignore")
    import jax.numpy as jnp
    import numpy as np
    import optax

    from __graft_entry__ import _tiny_scene
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import _render_chunk, image_to_u8, render_image
    from bhraytracer_tpu.ops.camera import from_scene_camera
    from bhraytracer_tpu.parallel.sharding import _apply_params, make_mesh, trainable_params
    from bhraytracer_tpu.utils.png import write_png

    pack, cam = _tiny_scene()
    cfg = RenderConfig(
        spp=1, gi_bounces=1, extra_refr_levels=0, tir_bounces=2,
        chunk_rays=args.lanes, texture_sample_count=1, differentiable=True,
    )
    cam_p = from_scene_camera(cam)
    mesh = make_mesh()
    n = args.lanes
    idx = np.linspace(0, cam.width * cam.height - 1, n).astype(np.int64)
    px = jnp.asarray(idx % cam.width, jnp.int32)
    py = jnp.asarray(idx // cam.width, jnp.int32)
    key = jax.random.PRNGKey(11)

    # Ground truth + target lanes.
    target, _, _ = _render_chunk(pack, cfg, cam_p, cam.width, cam.height, px, py, key)
    true_diffuse = np.asarray(pack.mtl_diffuse).copy()

    # Perturb: wrong material colors. Optimize ONLY the diffuse table (the
    # full parameter set includes camera basis vectors, which a hot Adam LR
    # would denormalize).
    full_params = trainable_params(pack, cam_p)
    rng = np.random.default_rng(0)
    diffuse0 = jnp.asarray(
        np.clip(true_diffuse + rng.uniform(-0.35, 0.35, true_diffuse.shape), 0.02, 0.98),
        jnp.float32,
    )

    tx = optax.adam(args.lr)
    opt_state = tx.init(diffuse0)

    @jax.jit
    def step(diffuse, opt_state):
        def loss_fn(dv):
            p = dict(full_params, mtl_diffuse=dv)
            pk, cm = _apply_params(pack, cam_p, p)
            rad, _, _ = _render_chunk(pk, cfg, cm, cam.width, cam.height, px, py, key)
            return jnp.mean((rad - target) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(diffuse)
        updates, opt_state = tx.update(grads, opt_state)
        new = optax.apply_updates(diffuse, updates)
        return jnp.clip(new, 0.0, 1.0), opt_state, loss

    os.makedirs(args.out, exist_ok=True)
    params = dict(full_params, mtl_diffuse=diffuse0)
    pk0, _ = _apply_params(pack, cam_p, params)
    write_png(os.path.join(args.out, "start.png"),
              image_to_u8(render_image(pk0, cam, dataclasses.replace(cfg, spp=4))))

    diffuse = diffuse0
    err0 = float(np.abs(np.asarray(diffuse) - true_diffuse).mean())
    for i in range(args.steps):
        diffuse, opt_state, loss = step(diffuse, opt_state)
        if i % 10 == 0 or i == args.steps - 1:
            err = float(np.abs(np.asarray(diffuse) - true_diffuse).mean())
            print(f"step {i:4d}  loss {float(loss):.6f}  diffuse L1 err {err:.4f}")

    err1 = float(np.abs(np.asarray(diffuse) - true_diffuse).mean())
    params = dict(full_params, mtl_diffuse=diffuse)
    pk1, _ = _apply_params(pack, cam_p, params)
    write_png(os.path.join(args.out, "recovered.png"),
              image_to_u8(render_image(pk1, cam, dataclasses.replace(cfg, spp=4))))
    write_png(os.path.join(args.out, "truth.png"),
              image_to_u8(render_image(pack, cam, dataclasses.replace(cfg, spp=4))))
    print(f"diffuse L1 error: {err0:.4f} -> {err1:.4f}")
    print(f"images in {args.out}/ (start / recovered / truth)")


if __name__ == "__main__":
    main()
