"""Round-3 raster profiling at representative scale (in-jit, fenced)."""
import sys; sys.path.insert(0, "/root/repo")
import json, sys, time
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

ITERS = 20
H, W = 1080, 1920

def bench(fn, vp, label):
    @jax.jit
    def loop(v0):
        def body(i, v):
            hit, z = fn(v)
            return vp + 0.0 * z[:4, :4] + 0.0 * hit.tri[0]
        return jax.lax.fori_loop(0, ITERS, body, v0)
    _ = np.asarray(loop(vp))
    t0 = time.time()
    _ = np.asarray(loop(vp))
    per = (time.time() - t0 - 0.04) / ITERS
    mrays = H * W / per / 1e6
    print(f"{label}: {per*1e3:.2f} ms/frame, {mrays:.1f} Mrays/s", flush=True)
    return per

for tess, n_obj in [(4, 256), (6, 256)]:
    d = RenderDelegate(RenderConfig(width=W, height=H))
    d.populate(scenes.kitchen_stress(num_objects=n_obj, tess=tess))
    scene = d.sync()
    world = bake_world(scene)
    vp = jnp.asarray(d.camera.view_proj)
    nf = int(scene.num_faces)
    print(f"--- tess={tess}: {nf} tris", flush=True)
    hit, _ = rasterize.rasterize_sorted(world, scene.tri_vertices, scene.num_faces, vp, height=H, width=W)
    print("  sorted overflow:", int(hit.overflow), " hitrate:", float((np.asarray(hit.tri)>=0).mean()), flush=True)
    bench(lambda v: rasterize.rasterize_sorted(world, scene.tri_vertices, scene.num_faces, v, height=H, width=W), vp, f"sorted@{nf}")
    if tess <= 4:
        hit, _ = rasterize.rasterize_binned(world, scene.tri_vertices, scene.num_faces, vp, height=H, width=W)
        print("  binned overflow:", int(hit.overflow), " hitrate:", float((np.asarray(hit.tri)>=0).mean()), flush=True)
        bench(lambda v: rasterize.rasterize_binned(world, scene.tri_vertices, scene.num_faces, v, height=H, width=W), vp, f"binned@{nf}")
