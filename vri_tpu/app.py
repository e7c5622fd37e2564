"""Headless application loop — ``python -m vri_tpu.app``.

The CLI replacement for the reference's windowed app (Source/Main.cpp:78-315:
GLFW window, ImGui stage picker + debug dropdowns + FPS/VRAM HUD, WASD
camera).  Headless on TPU that becomes: flags pick the stage / resolution /
debug mode / camera path; frames are written as PNGs; the HUD becomes
periodic log lines (runtime/profiler.FrameStats + HBM stats).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser("vri_tpu", description=__doc__)
    p.add_argument("--stage", help="path to a .usda stage; omit for a "
                                   "built-in scene")
    p.add_argument("--builtin", default="cornell",
                   choices=["cornell", "kitchen", "animated", "city"],
                   help="procedural scene when --stage is not given")
    p.add_argument("--width", type=int, default=512)
    p.add_argument("--height", type=int, default=512)
    p.add_argument("--frames", type=int, default=1)
    p.add_argument("--mode", default="none",
                   help="debug mode: none|mesh_id|prim_id|barycentric|depth|"
                        "albedo|normal|sdf_distance|sdf_uvw|sdf_iterations|"
                        "sdf_grad|sdf_brick_id|sdf_cascade_id")
    p.add_argument("--no-gi", action="store_true",
                   help="direct lighting only (no SDF cascades)")
    p.add_argument("--sdf", default="room",
                   choices=["reference", "room", "tiny"],
                   help="SDF cascade preset (scale of the GI structure)")
    p.add_argument("--backend", default="raster",
                   choices=["raster", "bvh", "brute"])
    p.add_argument("--samples", type=int, default=1, help="GI samples/frame")
    p.add_argument("--orbit", action="store_true",
                   help="orbit the camera over --frames frames")
    p.add_argument("--out", default="/tmp/vri_frames",
                   help="output directory for PNG frames")
    p.add_argument("--cache", help="scene cache path: loads it when present, "
                                   "writes it after sync otherwise")
    p.add_argument("--progressive", action="store_true",
                   help="accumulate frames instead of re-rendering")
    p.add_argument("--multichip", action="store_true",
                   help="shard the framebuffer over all local devices "
                        "(shard_map row tiling; 1-device mesh degenerates "
                        "to single-chip)")
    p.add_argument("--lod", type=int, default=0, metavar="LEVELS",
                   help="pack N decimated LOD levels per mesh; each "
                        "instance renders the coarsest level within "
                        "--lod-tau pixels of geometric error (0 = off)")
    p.add_argument("--lod-tau", type=float, default=0.75,
                   help="LOD screen-space error budget in pixels")
    p.add_argument("--trace", help="write a jax profiler trace to this dir")
    p.add_argument("-v", "--verbose", action="store_true")
    return p.parse_args(argv)


def main(argv=None) -> int:
    args = parse_args(argv)
    logging.basicConfig(
        level=logging.DEBUG if args.verbose else logging.INFO,
        format="[%(levelname)s] %(message)s")
    log = logging.getLogger("vri_tpu")

    from vri_tpu.config import DebugMode, RenderConfig
    from vri_tpu.hydra.camera import FreeCamera
    from vri_tpu.renderer import Renderer
    from vri_tpu.runtime import profiler
    from vri_tpu.usd import scenes
    from vri_tpu.utils.image import write_png

    from vri_tpu.config import SDFConfig

    mode = getattr(DebugMode, args.mode.upper())
    cfg = RenderConfig(width=args.width, height=args.height,
                       sdf=SDFConfig.preset(args.sdf),
                       lod_levels=args.lod, lod_tau=args.lod_tau)
    renderer = Renderer(cfg)

    if args.cache and os.path.exists(args.cache):
        with profiler.span("load_cache", log_ms=True):
            renderer.load_cache(args.cache)
        # cache has no camera; synthesize an orbit one below
    elif args.stage:
        with profiler.span("load_stage", log_ms=True):
            renderer.load_stage(args.stage)
    else:
        builder = {"cornell": scenes.cornell_box,
                   "kitchen": scenes.kitchen_stress,
                   "animated": scenes.animated_stage,
                   "city": scenes.city_stress}[args.builtin]
        with profiler.span("build_stage", log_ms=True):
            renderer.load_stage(builder())
    if args.cache and not os.path.exists(args.cache):
        renderer.save_cache(args.cache)

    os.makedirs(args.out, exist_ok=True)
    stats = profiler.FrameStats()
    free_cam = FreeCamera() if (args.orbit or renderer.camera is None) else None
    aspect = args.width / args.height

    if args.trace:
        profiler.start_trace(args.trace)
    gi = not args.no_gi

    if args.multichip:
        import jax

        from vri_tpu.parallel import make_mesh, tiling
        from vri_tpu.passes.frame import FrameParams

        mesh = make_mesh()
        n = mesh.shape["tiles"]
        h = (args.height // (8 * n)) * 8 * n or 8 * n
        cam = renderer.camera or FreeCamera().at_time(0.0, aspect)
        cascades = renderer.ensure_cascades(eye=cam.eye)
        out = tiling.render_frame_tiled(
            renderer.scene, FrameParams.from_camera(cam, h), cascades,
            jax.random.PRNGKey(0), mesh=mesh, height=h, width=args.width,
            config=renderer.config.sdf, gi=gi, samples=args.samples)
        path = os.path.join(args.out, "multichip.png")
        write_png(path, np.asarray(out["color"]))
        stats_v = np.asarray(out["stats"])
        log.info("multichip frame over %d device(s): %s | rays %d hits %d",
                 n, path, int(stats_v[0]), int(stats_v[1]))
    elif args.progressive:
        img = renderer.render_progressive(args.frames, samples=args.samples,
                                          backend=args.backend)
        path = os.path.join(args.out, "progressive.png")
        write_png(path, img)
        log.info("wrote %s", path)
    else:
        for i in range(args.frames):
            cam = (free_cam.at_time(i / 30.0, aspect)
                   if free_cam is not None else None)
            stats.tick()
            # authored timeSamples (the "animated" builtin or any stage
            # carrying them) advance one time code per frame
            tc = float(i) if args.builtin == "animated" else None
            with profiler.span(f"frame{i}"):
                aovs = renderer.render(camera=cam, mode=mode, gi=gi,
                                       samples=args.samples,
                                       backend=args.backend, time_code=tc)
            path = os.path.join(args.out, f"frame_{i:04d}.png")
            tonemapped = mode != DebugMode.NONE
            write_png(path, aovs["color"], tonemapped=tonemapped)
            if i % 10 == 0 or i == args.frames - 1:
                log.info("frame %d -> %s | %s | HBM %s", i, path,
                         stats.summary(),
                         profiler.device_memory_stats() or "n/a")
    if args.trace:
        profiler.stop_trace()
    log.info("scene device bytes: %d",
             renderer.delegate.registry.device_bytes())
    return 0


if __name__ == "__main__":
    sys.exit(main())
