"""Finer attribution: list-build internals + kernel + resolve @49k."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize as R
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=4))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)

def bench(fn, label, iters=20, arg=None):
    a0 = vp if arg is None else arg
    jfn = jax.jit(fn)
    _ = np.asarray(jax.tree_util.tree_leaves(jfn(a0))[0].ravel()[0])
    @jax.jit
    def loop(v0):
        def body(i, v):
            out = jfn(v)
            lead = jax.tree_util.tree_leaves(out)[0]
            return v0 + (0 * lead.ravel()[0]).astype(v0.dtype)
        return jax.lax.fori_loop(0, iters, body, v0)
    _ = np.asarray(loop(a0))
    t0 = time.time()
    _ = np.asarray(loop(a0))
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label:40s}: {per:7.2f} ms", flush=True)
    return per

# isolated pieces
rng = np.random.default_rng(0)
skeys = jnp.sort(jnp.asarray(rng.integers(0, 2025, 790_000).astype(np.uint32)))
bench(lambda k: jnp.searchsorted(k, jnp.arange(2026, dtype=jnp.uint32)).astype(jnp.int32)[0],
      "searchsorted 2026 over 790k", arg=skeys)
svals = jnp.asarray(rng.integers(0, 99000, 790_000).astype(np.int32))
starts = jnp.asarray((rng.integers(0, 780_000, 2025)).astype(np.int32))
def listbuild(st):
    k_ids = jnp.arange(1024, dtype=jnp.int32)
    gidx = st[:, None] + k_ids[None, :]
    return svals[jnp.minimum(gidx, 789_999)]
bench(listbuild, "list gather (2025,1024)", arg=starts)

# full frame pieces via public API
bench(lambda v: R.rasterize_sorted(world, scene.tri_vertices, scene.num_faces,
                                   v, height=H, width=W)[1][0, 0],
      "FULL rasterize_sorted")
bench(lambda v: R.rasterize_sorted(world, scene.tri_vertices, scene.num_faces,
                                   v, height=H, width=W, cap=512)[1][0, 0],
      "FULL rasterize_sorted cap=512")
# resolve cost: full frame incl. G-buffer resolve
from vri_tpu.ops import shading
from vri_tpu.ops import raygen
def with_resolve(v):
    hit, z = R.rasterize_sorted(world, scene.tri_vertices, scene.num_faces,
                                v, height=H, width=W)
    o, dirs = raygen.camera_rays(jnp.linalg.inv(v), jnp.zeros(3), H, W)
    gb = shading.resolve_gbuffer(scene, world, hit, o.reshape(-1,3), dirs.reshape(-1,3))
    return gb.albedo[0, 0]
bench(with_resolve, "FULL + gbuffer resolve")
