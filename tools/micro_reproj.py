"""Isolate reprojection + composite costs: (N,3) lane padding, 4x(N,8)
gathers vs 2x(N,16) slice gathers, upsample."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.ops.rowgather import gather_rows, gather_slices

N = 2073600          # 1080p pixels
NG = N // 4          # gi-res pixels


def bench(fn, label, arg, iters=50):
    """fn: f32 array -> pytree; chained via a scalar feedback term
    (0 * lead keeps the data dependency: XLA cannot fold 0*x for f32)."""
    @jax.jit
    def loop(v0):
        def body(i, v):
            out = fn(v)
            lead = jax.tree_util.tree_leaves(out)[0]
            return v + 0.0 * lead.ravel()[0].astype(v.dtype)
        return jax.lax.fori_loop(0, iters, body, v0)
    _ = np.asarray(loop(arg).ravel()[0])
    t0 = time.time()
    _ = np.asarray(loop(arg).ravel()[0])
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label:46s}: {per:7.3f} ms", flush=True)
    return per


a3 = jnp.ones((N, 3), jnp.float32)
base3 = bench(lambda v: v, "chain overhead (2M,3)", a3)
bench(lambda v: v * 1.0001 + 0.5, "(2M,3) one elementwise op", a3)
bench(lambda v: jnp.where(v[:, 0:1] > 0, v + v * (v + v), 0.0),
      "composite chain (2M,3)", a3)
a3n = jnp.ones((3, N), jnp.float32)
bench(lambda v: v, "chain overhead (3,2M)", a3n)
bench(lambda v: v * 1.0001 + 0.5, "(3,2M) one elementwise op", a3n)

sm = jnp.ones((NG, 3), jnp.float32)
def ups(v):
    x = v.reshape(540, 960, 3)
    x = jnp.repeat(jnp.repeat(x, 2, axis=0), 2, axis=1)
    return x.reshape(-1, 3)
bench(ups, "upsample repeat 540p->1080p (N,3)", sm)

table = jnp.ones((NG, 8), jnp.float32)
idx = jnp.arange(NG, dtype=jnp.int32)[::-1].copy()
def g4(t):
    acc = 0.0
    for d in range(4):
        f = gather_rows(t + 0.0 * t.ravel()[0], jnp.clip(idx + d, 0, NG - 1))
        acc = acc + f(0) + f(3) + f(7)
    return acc[:, None] * jnp.ones((1, 1), jnp.float32)
bench(g4, "4x gather_rows (518k,8)", table)

def g2(t):
    flat = (t + 0.0 * t.ravel()[0]).ravel()
    acc = 0.0
    for d in range(2):
        st_ = jnp.clip((idx + d * 960) * 8, 0, NG * 8 - 16)
        f = gather_slices(flat, st_, 16)
        acc = acc + f(0) + f(3) + f(7) + f(8) + f(11) + f(15)
    return acc[:, None] * jnp.ones((1, 1), jnp.float32)
bench(g2, "2x gather_slices (518k,16)", table)
