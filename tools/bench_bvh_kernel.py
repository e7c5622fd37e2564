"""Measure the Pallas packet-LBVH traversal (ops/bvh_kernel.py) on TPU.

The north-star experiment (VERDICT r2 #7): an honest kernel-level number
for wavefront BVH traversal, vs the production raster. Results recorded
in docs/ROADMAP.md.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import bvh as bvh_mod
from vri_tpu.ops import bvh_kernel, raygen
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 540, 960   # quarter-1080p: enough rays to amortize, bounded runtime
for tess, label in [(1, "3k"), (4, "49k")]:
    d = RenderDelegate(RenderConfig(width=W, height=H))
    d.populate(scenes.kitchen_stress(num_objects=256, tess=tess))
    scene = d.sync()
    world = bake_world(scene)
    bvh = bvh_mod.build_bvh(world, scene.tri_vertices, scene.num_faces)
    cam = d.camera
    o, dirs = raygen.camera_rays(jnp.asarray(cam.inv_view_proj),
                                 jnp.asarray(cam.eye), H, W)
    o = o.reshape(-1, 3)
    dirs = dirs.reshape(-1, 3)

    @jax.jit
    def once(dd):
        t, tri = bvh_kernel.trace_packet(bvh, o, dd, max_nodes=16384)
        return t.sum() + tri.sum()

    r = once(dirs)
    _ = np.asarray(r)
    iters = 3
    @jax.jit
    def loop(dd):
        def body(i, acc):
            s = once(dd + 0.0 * acc * 1e-30)
            return s.astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = np.asarray(loop(dirs))
    t0 = time.time()
    _ = np.asarray(loop(dirs))
    per = (time.time() - t0 - 0.04) / iters
    mrays = H * W / per / 1e6
    print(f"packet-LBVH @{label}: {per*1e3:8.1f} ms/frame ({H}x{W}) = "
          f"{mrays:7.3f} Mrays/s", flush=True)
