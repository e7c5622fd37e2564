"""searchsorted replacement + kernel/resolve isolation @49k."""
import sys; sys.path.insert(0, "/root/repo")
import time, functools
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

def bench(fn, label, arg, iters=20):
    jfn = jax.jit(fn)
    r0 = jfn(arg)
    _ = np.asarray(jax.tree_util.tree_leaves(r0)[0].ravel()[0])
    @jax.jit
    def loop(v0):
        def body(i, v):
            out = jfn(v)
            lead = jax.tree_util.tree_leaves(out)[0]
            return v0 + (0 * lead.ravel()[0] + 0 * v[0].astype(jnp.float32)).astype(v0.dtype)
        return jax.lax.fori_loop(0, iters, body, v0)
    _ = np.asarray(loop(arg))
    t0 = time.time()
    _ = np.asarray(loop(arg))
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label:44s}: {per:7.2f} ms", flush=True)

def binsearch(sorted_arr, queries, n_iters):
    """starts[i] = first index with sorted_arr[idx] >= queries[i]."""
    lo = jnp.zeros_like(queries, jnp.int32)
    hi = jnp.full_like(queries, sorted_arr.shape[0], jnp.int32)
    for _ in range(n_iters):
        mid = (lo + hi) >> 1
        v = sorted_arr[jnp.minimum(mid, sorted_arr.shape[0] - 1)]
        go_hi = v < queries
        lo = jnp.where(go_hi, mid + 1, lo)
        hi = jnp.where(go_hi, hi, mid)
    return lo

rng = np.random.default_rng(0)
sk = jnp.sort(jnp.asarray(rng.integers(0, 2025, 790_000).astype(np.uint32)))
q = jnp.arange(2026, dtype=jnp.uint32)
bench(lambda k: binsearch(k, q, 20)[0], "manual binsearch 2026/790k", sk)

# kernel + prep without the per-pixel attribute resolve
def no_resolve(v):
    hit, z = R.rasterize_sorted(world, scene.tri_vertices, scene.num_faces,
                                v, height=H, width=W)
    return z[0, 0]
# full for reference (already cached)
def full(v):
    hit, z = R.rasterize_sorted(world, scene.tri_vertices, scene.num_faces,
                                v, height=H, width=W)
    return hit.u[0] + z[0, 0]
bench(full, "FULL (z + resolved attrs)", vp)
bench(no_resolve, "NO-RESOLVE (z only; resolve DCE'd)", vp)
