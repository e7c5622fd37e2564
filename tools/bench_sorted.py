"""Full-frame rasterize_sorted ms at the given tess levels (in-jit)."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp

from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize as R
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

CULL = "--nocull" not in sys.argv
args = [a for a in sys.argv[1:] if not a.startswith("--")]
H, W = 1080, 1920
for tess in [int(t) for t in (args or ["1", "4", "6"])]:
    d = RenderDelegate(RenderConfig(width=W, height=H))
    d.populate(scenes.kitchen_stress(num_objects=256, tess=tess))
    scene = d.sync()
    world = bake_world(scene)
    vp = jnp.asarray(d.camera.view_proj)
    cs = frame_mod._cull_sign(scene) if CULL else None

    def full(v):
        h, zz = R.rasterize_sorted(world, scene.tri_vertices,
                                   scene.num_faces, v, height=H, width=W,
                                   cull_sign=cs)
        return zz[:4, :4], h.tri[0], h.u[0], h.overflow

    jfn = jax.jit(full)
    out = jfn(vp)
    assert int(out[3]) == 0, "overflow"
    iters = 20

    @jax.jit
    def loop(v0):
        def body(i, v):
            zz, t, u, _ = jfn(vp + 0.0 * v)
            return v + 0.0 * (zz.sum() + t.astype(jnp.float32) + u)
        return jax.lax.fori_loop(0, iters, body, v0)

    _ = np.asarray(loop(jnp.float32(0)))
    t0 = time.time()
    _ = np.asarray(loop(jnp.float32(0)))
    ms = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"tess {tess}: faces {int(scene.num_faces):7d}  {ms:7.2f} ms  "
          f"({H * W / ms / 1e3:.1f} Mrays/s)")
