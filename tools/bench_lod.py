"""Measure primary-visibility frame time with/without LOD at scale.

In-jit frame loop (axon tunnel: ~5 ms/dispatch host overhead, so the
loop lives inside one jit with a cross-frame data dependency; single
fenced readback).  The LOD path includes the per-frame mask computation
(camera-dependent selection is part of the production frame).

Usage: python tools/bench_lod.py [tess ...]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax

if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from vri_tpu.config import RenderConfig  # noqa: E402
from vri_tpu.hydra.delegate import RenderDelegate  # noqa: E402
from vri_tpu.passes import frame as frame_mod  # noqa: E402
from vri_tpu.registry import bake_world  # noqa: E402
from vri_tpu.usd import scenes  # noqa: E402

ITERS = 30
H, W = 1080, 1920


def measure(tess: int, lod_levels: int, tau: float) -> tuple:
    cfg = RenderConfig(width=W, height=H, lod_levels=lod_levels,
                       lod_min_faces=64)
    d = RenderDelegate(cfg)
    d.populate(scenes.kitchen_stress(num_objects=256, tess=tess))
    scene = d.sync()
    world = bake_world(scene)
    fp = frame_mod.FrameParams.from_camera(d.camera, H)

    hit = frame_mod._visibility_raster(scene, world, fp, H, W,
                                       lod_tau=tau)
    over = int(hit.overflow)

    # selected-level face count (diagnostic)
    live = int(scene.num_faces)
    if scene.tri_lod is not None and tau > 0:
        from vri_tpu.ops import lod as lod_mod
        focal = 1.0 / jnp.maximum(fp.pixel_spread, 1e-8)
        mask, levels = lod_mod.face_mask(scene, fp.eye, focal, tau)
        live = int(mask[:int(scene.num_faces_total)].sum())

    @jax.jit
    def loop(v0):
        def body(i, v):
            f2 = frame_mod.FrameParams(
                view_proj=v, inv_view_proj=fp.inv_view_proj, eye=fp.eye,
                near=fp.near, far=fp.far, pixel_spread=fp.pixel_spread)
            h = frame_mod._visibility_raster(scene, world, f2, H, W,
                                             lod_tau=tau)
            return v + 0.0 * h.t[0] + 0.0 * h.tri[0] + 0.0 * h.u[0]
        return jax.lax.fori_loop(0, ITERS, body, v0)

    _ = np.asarray(loop(fp.view_proj))
    t0 = time.time()
    _ = np.asarray(loop(fp.view_proj))
    ms = (time.time() - t0 - 0.04) / ITERS * 1e3
    return ms, over, live


def main():
    for tess in [int(a) for a in (sys.argv[1:] or ["4", "6"])]:
        for levels, tau in ((0, 0.0), (3, 0.75)):
            ms, over, live = measure(tess, levels, tau)
            mrays = H * W / ms / 1e3
            print(f"tess={tess} lod={levels} tau={tau}: {ms:.1f} ms "
                  f"({mrays:.1f} Mrays/s), live tris {live}, overflow {over}",
                  flush=True)


if __name__ == "__main__":
    main()
