"""Prep vs walk split of rasterize_sorted post-K6 (uses probe='prep')."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W, ITERS = 1080, 1920, 30
TESS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=TESS))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)
cs = frame_mod._cull_sign(scene)

def bench(label, **kw):
    fn = rasterize.rasterize_sorted
    @jax.jit
    def loop(v0):
        def body(i, v):
            hit, z = fn(world, scene.tri_vertices, scene.num_faces, v,
                        height=H, width=W, cull_sign=cs, **kw)
            s = (jnp.sum(hit.u) + jnp.sum(hit.v)
                 + jnp.sum(hit.tri.astype(jnp.float32))
                 + jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)))
            return vp + jnp.tanh(s * 1e-20) * 1e-20
        return jax.lax.fori_loop(0, ITERS, body, v0)
    _ = np.asarray(loop(vp)); t0 = time.time()
    _ = np.asarray(loop(vp))
    per = (time.time() - t0 - 0.04) / ITERS * 1e3
    print(f"{label}: {per:6.2f} ms", flush=True)
    return per

p = bench("prep only (setup+emit+sort+templates)", probe="prep")
f = bench("full frame                           ")
print(f"walk+resolve share: {f-p:6.2f} ms")
