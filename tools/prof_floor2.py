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
            out = jfn(v + i.astype(v.dtype))   # true data dependency chain
            return out
        return jax.lax.fori_loop(0, iters, body, v0)
    r = loop(arg)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    t0 = time.time()
    r = loop(arg)
    _ = np.asarray(jax.tree_util.tree_leaves(r)[0].ravel()[0])
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label:40s}: {per:7.3f} ms", flush=True)

bench(lambda v: v + 1, "(790k,) u32 chain add", jnp.ones((790_000,), jnp.uint32))
bench(lambda v: v + 1, "(790k,) f32 chain add", jnp.ones((790_000,), jnp.float32))
bench(lambda v: v + 1, "(6172,128) u32 chain add", jnp.ones((6172, 128), jnp.uint32))
bench(lambda v: v + 1, "(1024,1024) f32 chain add", jnp.ones((1024, 1024), jnp.float32))
bench(lambda v: v + 1, "(8192,1024) f32 chain add", jnp.ones((8192, 1024), jnp.float32))
