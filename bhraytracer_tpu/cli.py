"""Command-line interface — the offline replacement for the reference's
interactive GLUT viewport (viewport.cpp) and the PhotonMapViewer tool.

  python -m bhraytracer_tpu render scene.xml -o out.png [--spp N] ...
      BeginRender + SaveImages (Main.cpp:178-242, 414-417); --zbuffer and
      --probe replace the viewport's z-view and click-to-inspect
      (viewport.cpp:375-387, 489-500).

  python -m bhraytracer_tpu photonviz map.dat -o out.png
      PhotonMapViewer's point-cloud view (PhotonMapViz.cpp:159-231) as an
      orthographic splat render.

  python -m bhraytracer_tpu bench / info
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys
import time

import numpy as np


def _add_render_args(p):
    p.add_argument("scene", help="scene XML file (reference dialect)")
    p.add_argument("-o", "--output", default="out.png")
    p.add_argument("--resource-root", default=None,
                   help="root for OBJ/texture paths (default: scene dir)")
    p.add_argument("--spp", type=int, default=32)
    p.add_argument("--gi-bounces", type=int, default=3)
    p.add_argument("--tir-bounces", type=int, default=16)
    p.add_argument("--extra-refr-levels", type=int, default=2)
    p.add_argument("--width", type=int, default=None, help="override camera width")
    p.add_argument("--height", type=int, default=None)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--chunk-rays", type=int, default=None,
                   help="lanes per dispatch (default: 16384 on CPU; 491520 "
                        "on TPU, where whole-image fused chunks amortize "
                        "the tunnel's ~25ms/program dispatch floor)")
    p.add_argument("--no-gamma", action="store_true")
    p.add_argument("--adaptive", type=int, metavar="EXTRA_SPP", default=0,
                   help="adaptive sampling: give the highest-contrast "
                        "pixels EXTRA_SPP extra samples after the base pass")
    p.add_argument("--adaptive-fraction", type=float, default=0.15,
                   help="fraction of pixels the adaptive pass refines")
    p.add_argument("--texture-taps", type=int, default=32)
    p.add_argument("--photon-map", action="store_true",
                   help="build + use a caustic photon map (USE_PhotonMap)")
    p.add_argument("--photon-count", type=int, default=1 << 17)
    p.add_argument("--save-photons", default=None,
                   help="write the built photon map to a reference-format .dat")
    p.add_argument("--zbuffer", default=None, help="also save the z-buffer PNG")
    p.add_argument("--probe", type=int, nargs=2, metavar=("X", "Y"), default=None,
                   help="print color + z at a pixel (viewport click inspector)")
    p.add_argument("--cpu", action="store_true", help="force the CPU backend")
    p.add_argument("--progressive", type=int, metavar="PASSES", default=0,
                   help="render in PASSES progressive passes, rewriting the "
                        "output PNG with the running mean after each one — "
                        "the headless stand-in for the reference viewport's "
                        "live in-progress view (viewport.cpp:354-366). The "
                        "final image draws exactly the same samples as a "
                        "single-pass render")
    p.add_argument("--serve", type=int, metavar="PORT", default=0,
                   help="serve a live auto-refreshing view of the render at "
                        "http://localhost:PORT while it runs — the headless "
                        "equivalent of the reference viewport's live "
                        "in-progress window (viewport.cpp:94-139, 344-391); "
                        "most useful with --progressive")
    p.add_argument("--checkpoint", default=None, metavar="DIR",
                   help="checkpoint render state per chunk; re-running with "
                        "the same args resumes (killed renders lose nothing)")
    p.add_argument("--profile", default=None, metavar="DIR",
                   help="capture a jax.profiler trace of the render "
                        "(experimental: hangs under tunneled-TPU "
                        "environments; use on standard JAX installs)")


def _render_progressive(args, pack, cam, cfg, photon_map,
                        image_to_u8, render_image, write_png, liveview=None):
    """Progressive preview: K passes over the sample budget, rewriting the
    output PNG with the running mean after each. sample_offset keeps the
    union of the passes' RNG streams identical to a single-pass render, so
    the final image converges to exactly the non-progressive result."""
    import dataclasses

    import numpy as np

    passes = min(args.progressive, cfg.spp)
    m = cfg.spp // passes
    sizes = [m + (1 if j < cfg.spp % passes else 0) for j in range(passes)]
    accum = None
    aux = None
    spp_done = 0
    off = 0
    t0 = time.time()
    for j, mj in enumerate(sizes):
        cfg_pass = dataclasses.replace(cfg, spp=mj, use_gamma=False,
                                       use_denoiser=False)
        out = render_image(pack, cam, cfg_pass, seed=args.seed,
                           photon_map=photon_map, return_aux=True,
                           sample_offset=off)
        img_j, aux_j = out
        if accum is None:
            accum = img_j * mj
            aux = aux_j
        else:
            accum += img_j * mj
            for k in aux["dropped_lanes"]:
                aux["dropped_lanes"][k] += aux_j["dropped_lanes"][k]
            aux["traced_segments"] += aux_j["traced_segments"]
            aux["sample_count"] = aux["sample_count"] + aux_j["sample_count"]
        spp_done += mj
        off += mj
        preview = accum / spp_done
        if cfg.use_gamma:
            preview = np.power(np.maximum(preview, 0.0), 1.0 / cfg.gamma)
        write_png(args.output, image_to_u8(preview))
        if liveview is not None:
            # Aux view modes (the viewport's 1-5 keys, viewport.cpp:419-485):
            # z-buffer + sample-count PNGs refreshed per pass.
            from bhraytracer_tpu.models.pathtracer import zbuffer_to_u8

            root, _ = os.path.splitext(args.output)
            zp, sp = root + ".z.png", root + ".samples.png"
            write_png(zp, zbuffer_to_u8(aux["zbuffer"]))
            sc = aux["sample_count"].astype(np.float32)
            sc8 = (sc / max(float(sc.max()), 1.0) * 255.0).astype(np.uint8)
            write_png(sp, sc8)
            liveview.register_aux("zbuffer", zp)
            liveview.register_aux("samples", sp)
            liveview.note_pass(j + 1, spp_done)
        print(f"pass {j + 1}/{passes}: {spp_done}/{cfg.spp} spp in "
              f"{time.time() - t0:.1f}s -> {args.output}")
    img = accum / cfg.spp
    if cfg.use_gamma:
        img = np.power(np.maximum(img, 0.0), 1.0 / cfg.gamma)
    if cfg.use_denoiser:
        import jax.numpy as jnp

        from bhraytracer_tpu.models.denoiser import denoise, load_pretrained

        model, dparams = load_pretrained()
        aux_ch = None
        if getattr(model, "aux_channels", 0) > 0:
            aux_ch = jnp.asarray(np.concatenate(
                [aux["albedo"], aux["normal"]], -1), jnp.float32)
        img = np.asarray(denoise(model, dparams,
                                 jnp.asarray(img, jnp.float32), aux=aux_ch))
    return img, aux


def cmd_render(args) -> int:
    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")
    from bhraytracer_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from bhraytracer_tpu.config import RenderConfig
    from bhraytracer_tpu.models.pathtracer import (
        image_to_u8,
        render_image,
        zbuffer_to_u8,
    )
    from bhraytracer_tpu.scene.xml_loader import load_scene
    from bhraytracer_tpu.utils.png import write_png

    pack, cam = load_scene(args.scene, resource_root=args.resource_root)
    if args.width:
        cam.width = args.width
    if args.height:
        cam.height = args.height
    import jax as _jax

    chunk_rays = args.chunk_rays
    if chunk_rays is None:
        # Photon-mapped renders use the per-level staged path (pmap is
        # threaded per level), which hits remote-compile failures at
        # ~480K-lane stages — cap its default chunk (round-3 ledger).
        if _jax.default_backend() == "tpu":
            chunk_rays = 65536 if args.photon_map else 491520
        else:
            chunk_rays = 16384
    cfg = RenderConfig(
        spp=args.spp,
        gi_bounces=args.gi_bounces,
        tir_bounces=args.tir_bounces,
        extra_refr_levels=args.extra_refr_levels,
        chunk_rays=chunk_rays,
        use_gamma=not args.no_gamma,
        texture_sample_count=args.texture_taps,
        use_photon_map=args.photon_map,
        photon_count=args.photon_count,
        adaptive_spp=args.adaptive,
        adaptive_fraction=args.adaptive_fraction,
    )
    import jax

    if jax.default_backend() == "tpu":
        # Probe-compile the trace/shade kernels; on a Mosaic failure the
        # switches flip off and rendering survives on the XLA paths.
        from bhraytracer_tpu.ops.pallas_shade import probe_shade_kernel
        from bhraytracer_tpu.ops.trace import probe_trace_kernels

        probe_trace_kernels(pack)
        probe_shade_kernel(pack, cfg)

    photon_map = None
    if args.photon_map:
        from bhraytracer_tpu.models.photonmap import build_photon_map

        t0 = time.time()
        photon_map = build_photon_map(pack, cfg, seed=args.seed, caustic=True)
        print(f"photon map: {int(photon_map.pos.shape[0])} photons "
              f"in {time.time() - t0:.1f}s")
        if args.save_photons:
            from bhraytracer_tpu.io.photon_dat import write_dat

            write_dat(args.save_photons, np.asarray(photon_map.pos),
                      np.asarray(photon_map.dirn), np.asarray(photon_map.power))
            print(f"wrote {args.save_photons}")

    liveview = None
    if args.serve:
        from bhraytracer_tpu.utils.liveview import LiveView

        liveview = LiveView(args.output, cfg.spp)
        port = liveview.serve(args.serve)
        print(f"live view: http://localhost:{port}/")

    t0 = time.time()
    if args.progressive and args.progressive > 1:
        if args.checkpoint:
            print("--progressive is incompatible with --checkpoint")
            return 2
        img, aux = _render_progressive(args, pack, cam, cfg, photon_map,
                                       image_to_u8, render_image, write_png,
                                       liveview=liveview)
    elif args.profile:
        import jax

        with jax.profiler.trace(args.profile):
            img, aux = render_image(pack, cam, cfg, seed=args.seed,
                                    photon_map=photon_map, return_aux=True,
                                    checkpoint_dir=args.checkpoint)
    else:
        img, aux = render_image(pack, cam, cfg, seed=args.seed,
                                photon_map=photon_map, return_aux=True,
                                checkpoint_dir=args.checkpoint)
    dt = time.time() - t0
    # Render-time report, like the viewport's completion timer
    # (viewport.cpp:399-410).
    print(f"rendered {cam.width}x{cam.height} @ {cfg.spp}spp in "
          f"{int(dt // 3600)}:{int(dt % 3600 // 60):02d}:{dt % 60:05.2f}")
    segments = sum(cfg.level_sizes(min(cfg.chunk_rays, cam.width * cam.height))) * 2
    segments *= cfg.spp * max(1, (cam.width * cam.height) // min(cfg.chunk_rays, cam.width * cam.height))
    print(f"~{segments / max(dt, 1e-9) / 1e6:.2f}M ray segments/s")
    dropped = aux.get("dropped_lanes", {})
    if any(dropped.values()):
        print(f"WARNING: dropped lanes (energy loss): {dropped}")
    write_png(args.output, image_to_u8(img))
    print(f"wrote {args.output}")
    if liveview is not None:
        liveview.note_pass(max(args.progressive, 1), cfg.spp)
        liveview.finish()
        # Keep the finished image viewable (the reference window stays open
        # after rendering, viewport.cpp:399-410) — but only when a human is
        # attached; scripts and tests exit immediately.
        if sys.stdin.isatty():
            try:
                input("live view still serving - press Enter to exit ")
            except EOFError:
                pass
        liveview.shutdown()
    if args.zbuffer:
        write_png(args.zbuffer, zbuffer_to_u8(aux["zbuffer"]))
        print(f"wrote {args.zbuffer}")
    if args.probe:
        x, y = args.probe
        c = img[y, x]
        z = aux["zbuffer"][y, x]
        print(f"pixel ({x}, {y}): color ({c[0]:.6f}, {c[1]:.6f}, {c[2]:.6f}) z {z:.6f}")
    return 0


def cmd_photonviz(args) -> int:
    from bhraytracer_tpu.io.photon_dat import read_dat
    from bhraytracer_tpu.utils.png import write_png

    pos, dirn, power = read_dat(args.dat)
    n = pos.shape[0]
    print(f"{n} photons")
    axes = {"x": (1, 2), "y": (0, 2), "z": (0, 1)}[args.axis]
    a = pos[:, axes[0]]
    b = pos[:, axes[1]]
    lo_a, hi_a = np.percentile(a, [1, 99])
    lo_b, hi_b = np.percentile(b, [1, 99])
    res = args.size
    ia = np.clip(((a - lo_a) / max(hi_a - lo_a, 1e-9) * (res - 1)), 0, res - 1).astype(int)
    ib = np.clip(((b - lo_b) / max(hi_b - lo_b, 1e-9) * (res - 1)), 0, res - 1).astype(int)
    img = np.zeros((res, res, 3), np.float64)
    np.add.at(img, (res - 1 - ib, ia), power)
    if img.max() > 0:
        img = img / np.percentile(img[img > 0], 99)
    write_png(args.output, (np.clip(img, 0, 1) * 255).astype(np.uint8))
    print(f"wrote {args.output}")
    return 0


def cmd_info(args) -> int:
    from bhraytracer_tpu.scene.xml_loader import parse_scene_xml

    sd = parse_scene_xml(args.scene, resource_root=args.resource_root)
    info = {
        "nodes": [
            {"kind": n.kind, "name": n.name, "material": n.material}
            for n in sd.nodes
        ],
        "materials": [m.name for m in sd.materials],
        "lights": [
            {"kind": li.kind, "name": li.name, "gray": li.gray} for li in sd.lights
        ],
        "meshes": [
            {"name": m.name, "verts": int(m.verts.shape[0]), "faces": int(m.faces.shape[0])}
            for m in sd.meshes
        ],
        "textures": [t.name for t in sd.textures],
        "camera": {
            "width": sd.camera.width,
            "height": sd.camera.height,
            "fov": sd.camera.fov,
        },
    }
    print(json.dumps(info, indent=2))
    return 0


def main(argv=None) -> int:
    parser = argparse.ArgumentParser(prog="bhraytracer_tpu")
    sub = parser.add_subparsers(dest="cmd", required=True)

    pr = sub.add_parser("render", help="render a scene XML to PNG")
    _add_render_args(pr)

    pv = sub.add_parser("photonviz", help="visualize a photon .dat as PNG")
    pv.add_argument("dat")
    pv.add_argument("-o", "--output", default="photons.png")
    pv.add_argument("--axis", choices=["x", "y", "z"], default="z",
                    help="projection axis")
    pv.add_argument("--size", type=int, default=512)

    pi = sub.add_parser("info", help="print scene structure as JSON")
    pi.add_argument("scene")
    pi.add_argument("--resource-root", default=None)

    args = parser.parse_args(argv)
    if args.cmd == "render":
        return cmd_render(args)
    if args.cmd == "photonviz":
        return cmd_photonviz(args)
    if args.cmd == "info":
        return cmd_info(args)
    return 1


if __name__ == "__main__":
    sys.exit(main())
