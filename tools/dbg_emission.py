"""Numpy replication of rasterize_sorted's emission + work list; checks
the per-tile invariant (every covering slot reachable in the walked
span).  Usage: python tools/dbg_emission.py [num_objects tess H W]"""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_platforms", "cpu")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize as R
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

num, tess, H, W = (int(x) for x in (sys.argv[1:] + [256, 1, 1080, 1920][len(sys.argv) - 1:]))
tile_h, tile_w, tc = 8, 128, 128
grid = ((H + 7) // 8, (W + 127) // 128)
num_tiles = grid[0] * grid[1]
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=num, tess=tess))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)
tx, ty, tz, tw, b1, b2, src_id, valid, clip_over = R.triangle_setup_clipped(
    world, scene.tri_vertices, scene.num_faces, vp, H, W,
    extra_cap=max(scene.tri_vertices.shape[0] // 16, 256))
tx, ty, valid = map(np.asarray, (tx, ty, valid))
print("clip_over", int(np.asarray(clip_over)))
f2 = tx.shape[0]
fp = ((f2 + 1 + 127) // 128) * 128
pad = fp - f2
tx = np.concatenate([tx, np.zeros((pad, 3), np.float32)])
ty = np.concatenate([ty, np.zeros((pad, 3), np.float32)])
valid = np.concatenate([valid, np.zeros(pad, bool)])
lox, hix = tx.min(1), tx.max(1)
loy, hiy = ty.min(1), ty.max(1)
tx0 = np.floor(lox / tile_w).astype(np.int64)
tx1 = np.floor(hix / tile_w).astype(np.int64)
ty0 = np.floor(loy / tile_h).astype(np.int64)
ty1 = np.floor(hiy / tile_h).astype(np.int64)
on = (tx1 >= 0) & (tx0 < grid[1]) & (ty1 >= 0) & (ty0 < grid[0])
vis = valid & on
rows_of = ty1 - ty0
cols_of = tx1 - tx0
ladder = [(2, 1, None), (4, 1, max(fp // 6, 512)), (8, 1, max(fp // 5, 512)),
          (8, 2, max(fp // 8, 512)), (16, 2, max(fp // 8, 512)),
          (64, 4, max(fp // 64, 512)), (grid[0] + 1, grid[1] + 1, 256)]
n_cls = len(ladder)
cls = np.full(fp, n_cls, np.int64)
for c in range(n_cls - 1, -1, -1):
    if c == n_cls - 1:
        fits = vis
    else:
        wr, wc_, _ = ladder[c]
        fits = vis & (rows_of < wr) & (cols_of < wc_)
    cls = np.where(fits, c, cls)
order = np.lexsort((np.arange(fp), cls))
cls_count = np.array([(cls == c).sum() for c in range(n_cls)])
print("cls counts:", cls_count.tolist(), "caps:", [c for _, _, c in ladder])
cls_start = np.concatenate([[0], np.cumsum(cls_count)])
max_cap = max(c for _, _, c in ladder if c is not None)
svals_pad = np.concatenate([order, np.full(max_cap, fp)])


def emit(ids, wr, wc_):
    ids = np.asarray(ids)
    idc = np.minimum(ids, fp - 1)
    oy = np.arange(wr)
    ox = np.arange(wc_)
    oy0 = np.clip(ty0[idc], 0, grid[0] - 1)
    ox0 = np.clip(tx0[idc], 0, grid[1] - 1)
    cy = oy0[:, None, None] + oy[None, :, None]
    cx = ox0[:, None, None] + ox[None, None, :]
    live = (ids < fp)[:, None, None]
    ok = ((cy <= ty1[idc][:, None, None]) & (cy >= 0) & (cy < grid[0])
          & (cx <= tx1[idc][:, None, None]) & (cx >= 0)
          & (cx < grid[1]) & live)
    k = np.where(ok, cy * grid[1] + cx, 0x7FFFFFFF).reshape(-1)
    v = np.broadcast_to(ids[:, None, None],
                        ids.shape + (wr, wc_)).reshape(-1)
    return k, v


keys_l, vals_l = [], []
carry = 0
slot_ids = np.arange(fp)
for c, (wr, wc_, cap_ids) in enumerate(ladder):
    if cap_ids is None:
        ids = np.where(cls == c, slot_ids, fp)
    else:
        seg = cls_count[c] + carry
        st = cls_start[c] - carry
        ids = svals_pad[st:st + cap_ids]
        live = np.arange(cap_ids) < seg
        ids = np.where(live, ids, fp)
        carry = max(seg - cap_ids, 0)
    k, v = emit(np.where(ids < fp, np.minimum(ids, fp - 1), fp), wr, wc_)
    keys_l.append(k)
    vals_l.append(v)
print("final carry:", carry)
keys = np.concatenate(keys_l)
vals = np.minimum(np.concatenate(vals_l), fp - 1)
o = np.argsort(keys, kind="stable")
skeys, svals = keys[o], vals[o]
starts = np.searchsorted(skeys, np.arange(num_tiles + 1), side="left")
count = starts[1:] - starts[:num_tiles]
live_pairs = int(starts[num_tiles])
pairs_cap = ((keys.size + 127) // 128) * 128
num_chunks = pairs_cap // tc
print("emission", keys.size, "live", live_pairs, "pairs_cap", pairs_cap)
cap = 1024
max_subs = cap // tc + 1
start_chunk = np.minimum(starts[:num_tiles] // tc, num_chunks - 1)
span = starts[1:num_tiles + 1] - start_chunk * tc
print("span > max_subs*tc tiles:", int((span > max_subs * tc).sum()),
      "max span", int(span.max()), "cap", max_subs * tc)
bad = 0
examples = []
for t in range(num_tiles):
    ty_, tx_ = t // grid[1], t % grid[1]
    cover = vis & (ty0 <= ty_) & (ty1 >= ty_) & (tx0 <= tx_) & (tx1 >= tx_)
    want = set(np.nonzero(cover)[0].tolist())
    nsub = min(max((span[t] + tc - 1) // tc, 1), max_subs)
    span0 = start_chunk[t] * tc
    span1 = min(span0 + nsub * tc, svals.size)
    got = set(svals[span0:span1].tolist())
    missing = want - got
    if missing:
        bad += 1
        if len(examples) < 3:
            m = sorted(missing)[:4]
            examples.append((t, len(missing), m, [int(cls[x]) for x in m]))
print("tiles with missing slots:", bad, "/", num_tiles)
for e in examples:
    print("  tile", e[0], "missing", e[1], "e.g. slots", e[2], "cls", e[3])
