"""A/B the grouped-singleton tier on the production sorted raster."""
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

H, W = 1080, 1920
ITERS = 20


def run(tess, grouped):
    d = RenderDelegate(RenderConfig(width=W, height=H))
    d.populate(scenes.kitchen_stress(num_objects=256, tess=tess))
    scene = d.sync()
    world = bake_world(scene)
    vp = jnp.asarray(d.camera.view_proj)
    fn = rasterize.rasterize_sorted

    hit0, _ = fn(world, scene.tri_vertices, scene.num_faces, vp,
                 height=H, width=W, grouped=grouped)
    assert int(hit0.overflow) == 0

    @jax.jit
    def loop(v0):
        def body(i, v):
            hit, z = fn(world, scene.tri_vertices, scene.num_faces, v,
                        height=H, width=W, grouped=grouped)
            return vp + 0.0 * z[:4, :4] + 0.0 * hit.tri[0] + 0.0 * hit.u[0]
        return jax.lax.fori_loop(0, ITERS, body, v0)

    _ = np.asarray(loop(vp))
    t0 = time.time()
    _ = np.asarray(loop(vp))
    per = (time.time() - t0 - 0.04) / ITERS
    mrays = H * W / per / 1e6
    print(f"tess={tess} grouped={grouped}: {per*1e3:6.2f} ms "
          f"({mrays:6.1f} Mrays/s)", flush=True)
    return hit0


if __name__ == "__main__":
    for tess in (1, 4, 6):
        ha = run(tess, True)
        hb = run(tess, False)
        # id agreement between the two paths
        agree = (np.asarray(ha.tri) == np.asarray(hb.tri)).mean()
        print(f"  id agreement grouped vs dense: {agree:.6f}", flush=True)
