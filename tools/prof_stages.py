"""Piecewise timing of the sorted-raster pipeline at 49k (in-jit prefixes)."""
import sys; sys.path.insert(0, "/root/repo")
import time, functools
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
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
NF, TV = scene.num_faces, scene.tri_vertices

def bench(fn, label, iters=20):
    jfn = jax.jit(fn)
    _ = np.asarray(jfn(vp))
    @jax.jit
    def loop(v0):
        def body(i, v):
            out = jfn(v)
            return vp + 0.0 * out
        return jax.lax.fori_loop(0, iters, body, v0)
    _ = np.asarray(loop(vp))
    t0 = time.time()
    _ = np.asarray(loop(vp))
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label:32s}: {per:7.2f} ms", flush=True)
    return per

tile_h, tile_w, tc = 8, 128, 128
grid = (1080 // 8, 1920 // 128)
num_tiles = grid[0] * grid[1]

def setup(v):
    return R.triangle_setup_clipped(world, TV, NF, v, H, W)

bench(lambda v: setup(v)[0][0, 0], "1 setup")

def emit_sort(v):
    tx, ty, tz, tw, b1, b2, src, valid = setup(v)
    f2 = tx.shape[0]
    fp = R._round_up(f2 + 1, tc)
    pad = fp - f2
    padf = lambda a: jnp.concatenate([a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    tx, ty, tz, tw, b1, b2, valid = map(padf, (tx, ty, tz, tw, b1, b2, valid))
    tz = jnp.where(valid[:, None], tz, 10.0)
    lox, hix = tx.min(1), tx.max(1)
    loy, hiy = ty.min(1), ty.max(1)
    tx0 = jnp.floor(lox / tile_w).astype(jnp.int32)
    tx1 = jnp.floor(hix / tile_w).astype(jnp.int32)
    ty0 = jnp.floor(loy / tile_h).astype(jnp.int32)
    ty1 = jnp.floor(hiy / tile_h).astype(jnp.int32)
    on = (tx1 >= 0) & (tx0 < grid[1]) & (ty1 >= 0) & (ty0 < grid[0])
    vis = valid & on
    small = vis & (tx1 - tx0 < 2) & (ty1 - ty0 < 4)
    oy = jnp.arange(4, dtype=jnp.int32); ox = jnp.arange(2, dtype=jnp.int32)
    cy = ty0[:, None, None] + oy[None, :, None]
    cx = tx0[:, None, None] + ox[None, None, :]
    ok = (small[:, None, None] & (cy <= ty1[:, None, None]) & (cy >= 0)
          & (cy < grid[0]) & (cx <= tx1[:, None, None]) & (cx >= 0) & (cx < grid[1]))
    keys = jnp.where(ok, cy * grid[1] + cx, 0x7FFFFFFF).astype(jnp.uint32).reshape(-1)
    slot_ids = jnp.arange(fp, dtype=jnp.int32)
    vals = jnp.broadcast_to(slot_ids[:, None, None], (fp, 4, 2)).reshape(-1)
    skeys, svals = jax.lax.sort_key_val(keys, vals, is_stable=True)
    return (tx, ty, tz, tw, b1, b2, skeys, svals, vis, small, fp)

bench(lambda v: emit_sort(v)[6][0].astype(jnp.float32), "2 +emission+sort")

CAP = 1024
def lists_(v):
    tx, ty, tz, tw, b1, b2, skeys, svals, vis, small, fp = emit_sort(v)
    starts = jnp.searchsorted(skeys, jnp.arange(num_tiles + 1, dtype=jnp.uint32))
    count = (starts[1:] - starts[:-1]).astype(jnp.int32)
    k_ids = jnp.arange(CAP, dtype=jnp.int32)
    gidx = starts[:num_tiles, None].astype(jnp.int32) + k_ids[None, :]
    in_seg = k_ids[None, :] < count[:, None]
    lists = jnp.where(in_seg, svals[jnp.minimum(gidx, skeys.shape[0] - 1)], fp - 1)
    return tx, ty, tz, lists, count

bench(lambda v: lists_(v)[3][0, 0].astype(jnp.float32), "3 +list build")

def rows_(v):
    tx, ty, tz, lists, count = lists_(v)
    fp_ids = jnp.arange(tx.shape[0], dtype=jnp.float32)[:, None]
    packed = jnp.concatenate([tx, ty, tz, fp_ids], axis=1)
    rows = packed[lists]
    return rows, count

bench(lambda v: rows_(v)[0][0, 0, 0], "4 +rows gather")
