import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp

def bench(fn, *args, iters=20, label=""):
    jfn = jax.jit(fn)
    _ = np.asarray(jax.tree_util.tree_leaves(jfn(*args))[0].ravel()[0])
    @jax.jit
    def loop(a0):
        def body(i, a):
            out = jfn(*((a,) + args[1:]))
            lead = jax.tree_util.tree_leaves(out)[0]
            return a0 + (0 * lead.ravel()[0]).astype(a0.dtype)
        return jax.lax.fori_loop(0, iters, body, a0)
    _ = np.asarray(loop(args[0]))
    t0 = time.time()
    _ = np.asarray(loop(args[0]))
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label}: {per:.2f} ms", flush=True)

rng = np.random.default_rng(0)
for n in (1_000_000, 3_200_000, 7_200_000):
    keys = jnp.asarray(rng.integers(0, 2**31, n).astype(np.uint32))
    vals = jnp.arange(n, dtype=jnp.int32)
    bench(lambda k, v: jax.lax.sort_key_val(k, v)[1], keys, vals,
          label=f"sort_key_val {n/1e6:.1f}M u32")

# 2-D per-tile sort (compaction): (2025, 1024) u32 keys + i32 vals
k2 = jnp.asarray(rng.integers(0, 2, (2025, 1024)).astype(np.uint32))
v2 = jnp.broadcast_to(jnp.arange(1024, dtype=jnp.int32)[None], (2025, 1024))
bench(lambda k, v: jax.lax.sort_key_val(k, v, dimension=1)[1], k2, v2,
      label="2-D sort (2025,1024)")

# row gather: (tiles*capT) consecutive-ish rows of 10 floats
table = jnp.asarray(rng.random((230_000, 10), np.float32))
idx = jnp.asarray(rng.integers(0, 230_000, (2025, 1024)).astype(np.int32))
bench(lambda t, i: t[i], table, idx, label="row gather (2025,1024,10)")

# scalar gather (2025,1024) from 800k
big = jnp.arange(800_000, dtype=jnp.int32)
bench(lambda t, i: t[i], big, idx, label="scalar gather (2025,1024)")

# take_along_axis 2-D (tiles, capT)
src2 = jnp.asarray(rng.integers(0, 100, (2025, 1024)).astype(np.int32))
perm = jnp.broadcast_to(jnp.arange(1024, dtype=jnp.int32)[None], (2025, 1024))
bench(lambda s, p: jnp.take_along_axis(s, p, axis=1), src2, perm,
      label="take_along_axis (2025,1024)")
