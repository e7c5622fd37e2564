"""Bit-exactness check for the EXPERIMENTAL walker='tileloop' kernel
(ADVICE r4: the DMA-pipelined tile-loop walker has no production caller,
so regressions in it would be invisible).  Runs on the real TPU (the
tile-loop path needs manual DMA semantics; interpret mode keeps the step
walker) and asserts the tile-loop walk reproduces the step walk EXACTLY
on both resolve modes over a kitchen-scale scene.

Usage: python tools/check_tileloop.py   (exit 0 = bit-exact)
"""
import sys; sys.path.insert(0, "/root/repo")

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
import numpy as np

from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

assert jax.default_backend() == "tpu", \
    "tileloop needs a real TPU (interpret mode keeps the step walker)"

H, W = 540, 960
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=96))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)
cs = frame_mod._cull_sign(scene)

rc = 0
for fused in (False, True):
    hs, _ = rasterize.rasterize_sorted(
        world, scene.tri_vertices, scene.num_faces, vp, height=H, width=W,
        cull_sign=cs, fused=fused, walker="steps")
    ht, _ = rasterize.rasterize_sorted(
        world, scene.tri_vertices, scene.num_faces, vp, height=H, width=W,
        cull_sign=cs, fused=fused, walker="tileloop")
    for f in ("t", "tri", "u", "v"):
        a, b = np.asarray(getattr(hs, f)), np.asarray(getattr(ht, f))
        n = (a != b).sum()
        tag = "OK " if n == 0 else "FAIL"
        if n:
            rc = 1
        print(f"{tag} fused={fused} field {f}: {n} mismatches")
sys.exit(rc)
