"""Does the fused-singleton sorted kernel beat the binned kernel at 3k?

The binned path owns the small-scene headline (measured crossover r3:
binned 22.7 vs sorted 27.1 ms).  Fused singleton steps (rasterize.py
_pass1_kernel) cut the sorted walk's per-tile cost; at 3k every tile is
a singleton, so the crossover may have flipped.
"""
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

d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=1))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)


def bench(fn, label, iters=30):
    hit0, _ = fn(world, scene.tri_vertices, scene.num_faces, vp,
                 height=H, width=W)
    print(f"{label}: overflow {int(hit0.overflow)}", flush=True)

    @jax.jit
    def loop(v0):
        def body(i, v):
            hit, z = fn(world, scene.tri_vertices, scene.num_faces, v,
                        height=H, width=W)
            return vp + 0.0 * z[:4, :4] + 0.0 * hit.tri[0] + 0.0 * hit.u[0]
        return jax.lax.fori_loop(0, iters, body, v0)

    _ = np.asarray(loop(vp))
    t0 = time.time()
    _ = np.asarray(loop(vp))
    ms = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label}: {ms:.2f} ms ({H*W/ms/1e3:.1f} Mrays/s)", flush=True)


bench(R.rasterize_binned, "binned @3k")
bench(R.rasterize_sorted, "sorted(fused) @3k")
