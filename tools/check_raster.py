"""Correctness + perf sweep for rasterize_sorted vs the capacity-free
oracle (`rasterize`) across representative scenes, on whatever backend
is active.  Usage: python tools/check_raster.py [--perf]"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

PERF = "--perf" in sys.argv
ITERS = 20

CASES = [
    ("cornell-1080p", lambda: scenes.cornell_box(), 1080, 1920),
    ("kitchen512-3k", lambda: scenes.kitchen_stress(num_objects=256,
                                                    tess=1), 512, 512),
    ("kitchen1080-3k", lambda: scenes.kitchen_stress(num_objects=256,
                                                     tess=1), 1080, 1920),
    ("kitchen1080-49k", lambda: scenes.kitchen_stress(num_objects=256,
                                                      tess=4), 1080, 1920),
]
if "--big" in sys.argv:
    CASES.append(("kitchen1080-111k",
                  lambda: scenes.kitchen_stress(num_objects=256, tess=6),
                  1080, 1920))

for label, mk, H, W in CASES:
    d = RenderDelegate(RenderConfig(width=W, height=H))
    d.populate(mk())
    scene = d.sync()
    world = bake_world(scene)
    vp = jnp.asarray(d.camera.view_proj)
    nf = int(scene.num_faces)

    hit, z = rasterize.rasterize_sorted(
        world, scene.tri_vertices, scene.num_faces, vp, height=H, width=W)
    oh, oz = rasterize.rasterize(
        world, scene.tri_vertices, scene.num_faces, vp, height=H, width=W)
    tri_s, tri_o = np.asarray(hit.tri), np.asarray(oh.tri)
    z_s, z_o = np.asarray(z).reshape(-1), np.asarray(oz).reshape(-1)
    cov_o = (tri_o >= 0).mean()
    cov_s = (tri_s >= 0).mean()
    same = (tri_s == tri_o)
    # z-agreement: where both hit, depth within 1e-3 (tie-broken ids ok)
    both = (tri_s >= 0) & (tri_o >= 0)
    zok = np.abs(z_s - z_o) < 1e-3
    agree_strict = same.mean()
    agree_z = (same | (both & zok)).mean()
    print(f"{label} ({nf} tris): cov sorted {cov_s:.4f} oracle {cov_o:.4f}"
          f" id-agree {agree_strict:.4f} z-agree {agree_z:.4f}"
          f" overflow {int(hit.overflow)}", flush=True)

    if PERF:
        @jax.jit
        def loop(v0):
            def body(i, v):
                h, zz = rasterize.rasterize_sorted(
                    world, scene.tri_vertices, scene.num_faces, v,
                    height=H, width=W)
                return vp + 0.0 * zz[:4, :4] + 0.0 * h.tri[0]
            return jax.lax.fori_loop(0, ITERS, body, v0)
        _ = np.asarray(loop(vp))
        t0 = time.time()
        _ = np.asarray(loop(vp))
        per = (time.time() - t0 - 0.04) / ITERS
        print(f"  {per*1e3:8.2f} ms/frame = {H*W/per/1e6:7.1f} Mrays/s",
              flush=True)
