"""Sub-stage breakdown of rasterize_sorted's PREP (everything before the
kernels) at a given tess, by timing cumulative prefixes in-jit.  Code is a
faithful copy of the front half of ops/rasterize.rasterize_sorted."""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp

from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize as R
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
TESS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=TESS))
scene = d.sync()
world = bake_world(scene)
vp0 = jnp.asarray(d.camera.view_proj)
print("faces:", int(scene.num_faces))

tile_h, tile_w, tc = 8, 128, 128
hp = R._round_up(H, tile_h); wp = R._round_up(W, tile_w)
grid = (hp // tile_h, wp // tile_w)
num_tiles = grid[0] * grid[1]
cap = R._round_up(2048, tc)


CS = frame_mod._cull_sign(scene)


def front(vp, stage):
    extra = max(scene.tri_vertices.shape[0] // 16, 256)
    tx, ty, tz, tw, b1, b2, src_id, valid, clip_over = \
        R.triangle_setup_clipped(world, scene.tri_vertices,
                                 scene.num_faces, vp, H, W,
                                 extra_cap=extra, cull_sign=CS)
    acc = tx.sum() + tz.sum() + tw.sum() + b1.sum() + b2.sum()
    if stage == 0:
        return acc
    f2 = tx.shape[0]
    fp = R._round_up(f2 + 1, tc)
    pad = fp - f2
    padf = lambda a: jnp.concatenate(
        [a, jnp.zeros((pad,) + a.shape[1:], a.dtype)])
    tx, ty, tz, tw, b1, b2, valid = map(
        padf, (tx, ty, tz, tw, b1, b2, valid))
    src_sorted = jnp.concatenate([src_id, jnp.zeros((pad,), jnp.int32)])
    tz = jnp.where(valid[:, None], tz, 10.0)
    fill = fp - 1

    lox, hix = tx.min(axis=1), tx.max(axis=1)
    loy, hiy = ty.min(axis=1), ty.max(axis=1)
    tx0 = jnp.floor(lox / tile_w).astype(jnp.int32)
    tx1 = jnp.floor(hix / tile_w).astype(jnp.int32)
    ty0 = jnp.floor(loy / tile_h).astype(jnp.int32)
    ty1 = jnp.floor(hiy / tile_h).astype(jnp.int32)
    on_screen = ((tx1 >= 0) & (tx0 < grid[1])
                 & (ty1 >= 0) & (ty0 < grid[0]))
    vis = valid & on_screen
    pairs_cap = R._round_up(max(6 * fp, 128 * 1024), tc)
    ry0 = jnp.clip(ty0, 0, grid[0] - 1)
    rx0 = jnp.clip(tx0, 0, grid[1] - 1)
    e_rows = jnp.where(vis, jnp.clip(ty1, 0, grid[0] - 1) - ry0 + 1, 0)
    e_cols = jnp.where(vis, jnp.clip(tx1, 0, grid[1] - 1) - rx0 + 1, 0)
    area_t = e_rows * e_cols
    starts_x = jnp.cumsum(area_t) - area_t
    total_pairs = starts_x[-1] + area_t[-1]
    acc = acc + total_pairs.astype(jnp.float32) + area_t.sum() \
        + starts_x.sum()
    if stage == 1:
        return acc

    live_slot = area_t > 0
    sx = max(grid[1] - 1, 1).bit_length()
    sy = max(grid[0] - 1, 1).bit_length()
    cb = sx + 1
    word_a = (jnp.arange(fp, dtype=jnp.int32) << (sx + sy)) \
        | (ry0 << sx) | rx0
    word_b = (starts_x.astype(jnp.int32) << cb) | e_cols

    def seg_carry(field):
        masked = jnp.where(live_slot, field, -1)
        prev_live = jnp.concatenate(
            [jnp.full((1,), -1, jnp.int32), jax.lax.cummax(masked)[:-1]])
        diff = jnp.where(live_slot, field - jnp.maximum(prev_live, 0), 0)
        buf = jnp.zeros((pairs_cap,), jnp.int32).at[
            jnp.where(live_slot, starts_x, pairs_cap)].add(diff,
                                                           mode="drop")
        return jnp.cumsum(buf)

    a = seg_carry(word_a)
    b = seg_carry(word_b)
    sid = a >> (sx + sy)
    k_start = b >> cb
    cols_s = jnp.maximum(b & ((1 << cb) - 1), 1)
    j = jnp.arange(pairs_cap, dtype=jnp.int32)
    k_local = j - k_start
    dy = jnp.floor((k_local.astype(jnp.float32) + 0.5)
                   / cols_s.astype(jnp.float32)).astype(jnp.int32)
    dx = k_local - dy * cols_s
    tile_of = (((a >> sx) & ((1 << sy) - 1)) + dy) * grid[1] \
        + (a & ((1 << sx) - 1)) + dx
    dead_pair = j >= total_pairs
    keys = jnp.where(dead_pair, jnp.uint32(0x7FFFFFFF),
                     tile_of.astype(jnp.uint32))
    vals = jnp.where(dead_pair, fill, sid)
    acc = acc + keys.sum().astype(jnp.float32) + vals.sum()
    if stage == 2:
        return acc
    skeys, svals = jax.lax.sort_key_val(keys, vals, is_stable=True)
    acc = acc + skeys.sum().astype(jnp.float32) + svals.sum()
    if stage == 3:
        return acc
    starts = R._binsearch_first_geq(
        skeys, jnp.arange(num_tiles + 1, dtype=jnp.uint32))
    count = (starts[1:] - starts[:-1]).astype(jnp.int32)
    acc = acc + count.sum().astype(jnp.float32)
    if stage == 4:
        return acc

    ox = jnp.floor(lox); oy = jnp.floor(loy)
    gx = tx - ox[:, None]; gy = ty - oy[:, None]
    ax_, bx_, cx_ = gx[:, 0], gx[:, 1], gx[:, 2]
    ay_, by_, cy_ = gy[:, 0], gy[:, 1], gy[:, 2]
    az_, bz_, cz_ = tz[:, 0], tz[:, 1], tz[:, 2]
    area = (bx_ - ax_) * (cy_ - ay_) - (by_ - ay_) * (cx_ - ax_)
    dead = ~valid | (jnp.abs(area) <= 1e-12)
    inv = jnp.where(dead, 0.0, 1.0 / jnp.where(dead, 1.0, area))
    ka1 = -(ay_ - cy_) * inv
    kb1 = (ax_ - cx_) * inv
    kc1 = (cx_ * (ay_ - cy_) - cy_ * (ax_ - cx_)) * inv
    ka2 = -(by_ - ay_) * inv
    kb2 = (bx_ - ax_) * inv
    kc2 = (ax_ * (by_ - ay_) - ay_ * (bx_ - ax_)) * inv
    dz1, dz2 = bz_ - az_, cz_ - az_
    kaz = ka1 * dz1 + ka2 * dz2
    kbz = kb1 * dz1 + kb2 * dz2
    kcz = az_ + kc1 * dz1 + kc2 * dz2
    kcz = jnp.where(dead, 10.0, kcz)
    kaz = jnp.where(dead, 0.0, kaz)
    kbz = jnp.where(dead, 0.0, kbz)
    packed = jnp.stack(
        [ka1, kb1, kc1, ka2, kb2, kc2, kaz, kbz, kcz, ox, oy,
         jnp.arange(fp, dtype=jnp.float32)], axis=1)
    acc = acc + packed.sum()
    if stage == 5:
        return acc
    stream = packed[svals[:pairs_cap]]
    acc = acc + stream.sum()
    if stage == 6:
        return acc
    cm = stream.reshape(pairs_cap // tc, tc, 12).transpose(0, 2, 1)

    def grp(i, jj, k):
        return jnp.concatenate([cm[:, i], cm[:, jj], cm[:, k]], axis=-1)
    rep = lambda i: jnp.tile(cm[:, i], (1, 3))
    zero3 = jnp.zeros_like(cm[:, 0:1])
    chunks = jnp.stack(
        [grp(0, 3, 6), grp(1, 4, 7), grp(2, 5, 8),
         rep(9), rep(10), rep(11)], axis=1)
    chunks = jnp.concatenate(
        [chunks, jnp.tile(zero3, (1, 2, 3))], axis=1)
    acc = acc + chunks.sum()
    if stage == 7:
        return acc
    fl_g, chunks_g, src_row, grouped_tile, n_gsteps = R._pack_grouped(
        count, starts[:num_tiles].astype(jnp.int32), stream,
        num_tiles=num_tiles, num_tx=grid[1], tile_h=tile_h,
        tile_w=tile_w, tri_chunk=tc, pairs_cap=pairs_cap)
    acc = acc + chunks_g.sum() + fl_g.sum().astype(jnp.float32) \
        + src_row.sum().astype(jnp.float32)
    if stage == 8:
        return acc
    max_subs = cap // tc + 1
    num_chunks = pairs_cap // tc
    start_chunk = jnp.minimum(starts[:num_tiles].astype(jnp.int32) // tc,
                              num_chunks - 1)
    end = starts[1:].astype(jnp.int32)
    span = end - start_chunk * tc
    nsub = jnp.clip((span + tc - 1) // tc, 1, max_subs)
    nsub = jnp.where(grouped_tile, 0, nsub)
    cum = jnp.cumsum(nsub)
    total_work = cum[-1]
    offs = cum - nsub
    wcap = num_tiles + pairs_cap // tc
    widx = jnp.arange(wcap, dtype=jnp.int32)
    wt = jnp.searchsorted(cum, widx, side="right").astype(jnp.int32)
    live = widx < total_work
    wt = jnp.where(live, jnp.minimum(wt, num_tiles - 1), num_tiles - 1)
    within = widx - offs[wt]
    wchunk = jnp.minimum(start_chunk[wt] + within, num_chunks - 1)
    wchunk = jnp.where(live, wchunk, 0)
    return (acc + wt.sum().astype(jnp.float32) + wchunk.sum())


NAMES = ["setup+clip", "+bbox/emission counts", "+seg_carry+pair geom",
         "+sort", "+binsearch", "+coefficients/packed", "+stream gather",
         "+template build", "+grouped pack", "+worklist build"]


def bench(stage, iters=20):
    fn = jax.jit(lambda v: front(v, stage))
    _ = jax.device_get(fn(vp0))

    @jax.jit
    def loop(v0):
        def body(i, v):
            out = fn(vp0 + 0.0 * v)
            return v + 0.0 * out
        return jax.lax.fori_loop(0, iters, body, v0)

    _ = np.asarray(loop(jnp.float32(0)))
    t0 = time.time()
    _ = np.asarray(loop(jnp.float32(0)))
    return (time.time() - t0 - 0.04) / iters * 1e3


prev = 0.0
for s, name in enumerate(NAMES):
    ms = bench(s)
    print(f"stage {s} {name:28s} {ms:7.2f} ms   (+{ms - prev:6.2f})")
    prev = ms
