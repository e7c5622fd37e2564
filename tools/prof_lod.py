"""Isolate why the LOD-masked sorted raster lost to full-rate @111k.

A: base pack (111k pool), no mask            -> prior 46.9 ms
B: LOD pack (153k pool), mask = level 0      -> pool-growth overhead at
                                                identical live work
C: LOD pack, production mask (41.8k live)    -> prior 56.2 ms
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize as R
from vri_tpu.ops import lod as lod_mod
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
TESS = 6

def make(levels):
    d = RenderDelegate(RenderConfig(width=W, height=H, lod_levels=levels,
                                    lod_min_faces=64))
    d.populate(scenes.kitchen_stress(num_objects=256, tess=TESS))
    s = d.sync()
    return d, s, bake_world(s)

def bench(label, scene, world, vp, num_faces, mask, iters=20):
    def fn(v):
        hit, z = R.rasterize_sorted(world, scene.tri_vertices, num_faces,
                                    v, height=H, width=W, face_mask=mask)
        return v + 0.0 * z[:4, :4] + 0.0 * hit.tri[0] + 0.0 * hit.u[0]
    jfn = jax.jit(fn)
    _ = np.asarray(jfn(vp))
    @jax.jit
    def loop(v0):
        return jax.lax.fori_loop(0, iters, lambda i, v: jfn(v), v0)
    _ = np.asarray(loop(vp))
    t0 = time.time()
    _ = np.asarray(loop(vp))
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label:40s}: {per:7.2f} ms", flush=True)

d0, s0, w0 = make(0)
vp = jnp.asarray(d0.camera.view_proj)
bench("A base pool, no mask", s0, w0, vp, s0.num_faces, None)

d1, s1, w1 = make(3)
fp1 = frame_mod.FrameParams.from_camera(d1.camera, H)
focal = 1.0 / jnp.maximum(fp1.pixel_spread, 1e-8)
mask_sel, levels = lod_mod.face_mask(s1, fp1.eye, focal, 0.75)
mask0 = s1.tri_lod == 0
print("live sel:", int(mask_sel[:int(s1.num_faces_total)].sum()),
      "live l0:", int(mask0[:int(s1.num_faces_total)].sum()))
bench("B lod pool, mask=level0 (full live)", s1, w1, vp,
      s1.num_faces_total, mask0)
bench("C lod pool, mask=selected", s1, w1, vp, s1.num_faces_total, mask_sel)
