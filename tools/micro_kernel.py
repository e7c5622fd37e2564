"""Marginal per-sub cost of the sorted-raster kernel (synthetic data).

Calls _chunks_to_frame with controlled activity bitmasks: k active subs
per tile for k = 0, 1, 2, 4 -> floor + marginal cost per sub-walk.
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.ops import rasterize as R

H, W = 1080, 1920
tile_h, tile_w, tc = 8, 128, 128
grid = (H // tile_h, W // tile_w)
num_tiles = grid[0] * grid[1]
S = 9

rng = np.random.default_rng(0)
rows_np = np.zeros((num_tiles, S, 10, tc), np.float32)
# random small triangles in pixel space (x in [0,1920), y in [0,1080))
x0 = rng.uniform(0, W, (num_tiles, S, 1, tc)).astype(np.float32)
y0 = rng.uniform(0, H, (num_tiles, S, 1, tc)).astype(np.float32)
rows_np[:, :, 0:3] = np.concatenate([x0, x0 + 12, x0 + 3], axis=2)
rows_np[:, :, 3:6] = np.concatenate([y0, y0 + 4, y0 + 14], axis=2)
rows_np[:, :, 6:9] = 0.5
rows_np[:, :, 9] = rng.integers(0, 50000, (num_tiles, S, tc))
rows_c = jnp.asarray(rows_np)

fp = 52608
tx = jnp.asarray(rng.uniform(0, W, (fp, 3)).astype(np.float32))
ty = jnp.asarray(rng.uniform(0, H, (fp, 3)).astype(np.float32))
tw = jnp.ones((fp, 3), jnp.float32)
b1 = jnp.zeros((fp, 3), jnp.float32)
b2 = jnp.zeros((fp, 3), jnp.float32)
src = jnp.arange(fp, dtype=jnp.int32)

def bench(k):
    bits_np = np.full((num_tiles,), (1 << k) - 1, np.int32)
    bits = jnp.asarray(bits_np)

    @jax.jit
    def run(rc):
        hit, z = R._chunks_to_frame(
            rc, bits, tx, ty, tw, b1, b2, src, jnp.bool_(False),
            height=H, width=W, hp=H, wp=W, grid=grid, tile_h=tile_h,
            tile_w=tile_w, tri_chunk=tc, interpret=False)
        return z[:4, :4] + 0.0 * hit.tri[0]

    _ = np.asarray(run(rows_c))
    iters = 20
    @jax.jit
    def loop(rc):
        def body(i, acc):
            out = run(rc + 0.0 * acc)
            return out[0, 0].reshape(())
        return jax.lax.fori_loop(0, iters, body, jnp.float32(0))
    _ = np.asarray(loop(rows_c))
    t0 = time.time()
    _ = np.asarray(loop(rows_c))
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"k={k}: {per:7.2f} ms  ({num_tiles*k} sub-walks)", flush=True)
    return per

ks = [0, 1, 2, 4]
res = {k: bench(k) for k in ks}
m1 = (res[2] - res[1]) / num_tiles * 1e3
m2 = (res[4] - res[2]) / (2 * num_tiles) * 1e3
print(f"floor (k=0): {res[0]:.2f} ms;  marginal per sub: "
      f"{m1:.3f} us (k1->2), {m2:.3f} us (k2->4)")
