"""Stage breakdown of rasterize_sorted at 49k/1080p + overflow cause."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize as R
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
TESS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=TESS))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)
print("faces:", int(scene.num_faces))

tile_h, tile_w, tc = 8, 128, 128
hp = R._round_up(H, tile_h); wp = R._round_up(W, tile_w)
grid = (hp // tile_h, wp // tile_w)
num_tiles = grid[0] * grid[1]
cap, cap_glob = 1024, 512

# replicate the emission front half, report sizes + live stats
@jax.jit
def front(vp):
    extra = max(scene.tri_vertices.shape[0] // 16, 256)
    tx, ty, tz, tw, b1, b2, src_id, valid, clip_over = \
        R.triangle_setup_clipped(world, scene.tri_vertices,
                                 scene.num_faces, vp, H, W,
                                 extra_cap=extra)
    f2 = tx.shape[0]
    fp = R._round_up(f2 + 1, tc)
    pad = fp - f2
    padf = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    tx, ty, valid = map(padf, (tx, ty, valid))
    lox, hix = tx.min(axis=1), tx.max(axis=1)
    loy, hiy = ty.min(axis=1), ty.max(axis=1)
    tx0 = jnp.floor(lox / tile_w).astype(jnp.int32)
    tx1 = jnp.floor(hix / tile_w).astype(jnp.int32)
    ty0 = jnp.floor(loy / tile_h).astype(jnp.int32)
    ty1 = jnp.floor(hiy / tile_h).astype(jnp.int32)
    on = (tx1 >= 0) & (tx0 < grid[1]) & (ty1 >= 0) & (ty0 < grid[0])
    vis = valid & on
    rows_of = jnp.where(vis, ty1 - ty0, 0)
    cols_of = jnp.where(vis, tx1 - tx0, 0)
    area = jnp.where(vis, (jnp.minimum(ty1, grid[0]-1) - jnp.maximum(ty0, 0) + 1)
                     * (jnp.minimum(tx1, grid[1]-1) - jnp.maximum(tx0, 0) + 1), 0)
    return (vis.sum(), area.sum(), clip_over,
            jnp.bincount(jnp.clip(rows_of, 0, 64), length=65),
            jnp.bincount(jnp.clip(cols_of, 0, 16), length=17))

nvis, live_pairs, clip_over, rh, ch = jax.device_get(front(vp))
print(f"visible slots {nvis}, exact live pairs {live_pairs}, clip_over {clip_over}")
print("row-span hist (0..8, >8):", rh[:9], rh[9:].sum())
print("col-span hist (0..4, >4):", ch[:5], ch[5:].sum())

# per-tile list length distribution via the real path
hit, z = R.rasterize_sorted(world, scene.tri_vertices, scene.num_faces, vp,
                            height=H, width=W)
print("overflow:", int(hit.overflow))

def bench(label, fn, iters=20):
    _ = jax.device_get(jax.tree_util.tree_leaves(fn(vp))[0])
    @jax.jit
    def loop(v0):
        def body(i, v):
            out = fn(v)
            lead = jax.tree_util.tree_leaves(out)[0]
            return v0 + 0 * lead.ravel()[0].astype(jnp.float32) * 0
        return jax.lax.fori_loop(0, iters, body, v0)
    _ = np.asarray(loop(vp))
    t0 = time.time()
    _ = np.asarray(loop(vp))
    print(f"{label:36s}: {(time.time()-t0-0.04)/iters*1e3:7.2f} ms",
          flush=True)

bench("full rasterize_sorted", lambda v: R.rasterize_sorted(
    world, scene.tri_vertices, scene.num_faces, v, height=H, width=W)[1])
bench("triangle_setup_clipped", lambda v: R.triangle_setup_clipped(
    world, scene.tri_vertices, scene.num_faces, v, H, W,
    extra_cap=max(scene.tri_vertices.shape[0] // 16, 256))[0])
