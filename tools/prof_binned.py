"""Time rasterize_binned vs rasterize_sorted at several scales (TPU)."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize as R
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
ITERS = 20

for tess in (1, 4):
    d = RenderDelegate(RenderConfig(width=W, height=H))
    d.populate(scenes.kitchen_stress(num_objects=256, tess=tess))
    scene = d.sync()
    world = bake_world(scene)
    vp = jnp.asarray(d.camera.view_proj)
    nf = int(scene.num_faces)
    for name, fn in (("binned", R.rasterize_binned),
                     ("sorted", R.rasterize_sorted)):
        try:
            hit, z = fn(world, scene.tri_vertices, scene.num_faces, vp,
                        height=H, width=W)
            over = int(hit.overflow)

            @jax.jit
            def loop(v0):
                def body(i, v):
                    h, zz = fn(world, scene.tri_vertices, scene.num_faces,
                               v, height=H, width=W)
                    return vp + 0.0 * zz[:4, :4] + 0.0 * h.tri[0]
                return jax.lax.fori_loop(0, ITERS, body, v0)
            _ = np.asarray(loop(vp))
            t0 = time.time()
            _ = np.asarray(loop(vp))
            per = (time.time() - t0 - 0.04) / ITERS
            print(f"{nf:7d} tris {name}: {per*1e3:7.2f} ms "
                  f"{H*W/per/1e6:6.1f} Mrays/s overflow={over}", flush=True)
        except Exception as e:
            print(f"{nf:7d} tris {name}: FAIL {str(e)[:160]}", flush=True)
