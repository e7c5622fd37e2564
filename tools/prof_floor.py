import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp

def bench(fn, label, arg, iters=50):
    jfn = jax.jit(fn)
    _ = np.asarray(jax.tree_util.tree_leaves(jfn(arg))[0].ravel()[0])
    @jax.jit
    def loop(v0):
        def body(i, v):
            out = jfn(v)
            lead = jax.tree_util.tree_leaves(out)[0]
            return v0 + (0 * lead.ravel()[0] + 0 * v.ravel()[0]).astype(v0.dtype)
        return jax.lax.fori_loop(0, iters, body, v0)
    _ = np.asarray(loop(arg))
    t0 = time.time()
    _ = np.asarray(loop(arg))
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label:40s}: {per:7.3f} ms", flush=True)

x = jnp.ones((8, 128), jnp.float32)
bench(lambda v: v + 1.0, "no-op floor (tiny add)", x)
big = jnp.ones((790_000,), jnp.uint32)
bench(lambda v: v + 1, "790k u32 add", big)
rng = np.random.default_rng(0)
sk = jnp.sort(jnp.asarray(rng.integers(0, 2025, 790_000).astype(np.uint32)))
bench(lambda v: jnp.bincount(jnp.minimum(v, 2025), length=2026).astype(jnp.int32)[0], "bincount 790k -> 2026", sk)
