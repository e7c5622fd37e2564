"""Per-tile (tile, slot) pair-count distribution for the sorted raster
path at the three bench scales — sizes the grouped-singleton-kernel win
(tiles with <= W pairs can share one kernel step, G = 128/W per step).
"""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax
import jax.numpy as jnp

from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920


def hist(tess):
    d = RenderDelegate(RenderConfig(width=W, height=H))
    d.populate(scenes.kitchen_stress(num_objects=256, tess=tess))
    scene = d.sync()
    world = bake_world(scene)
    vp = jnp.asarray(d.camera.view_proj)

    tx, ty, tz, tw, b1, b2, src_id, valid, _ = \
        rasterize.triangle_setup_clipped(
            world, scene.tri_vertices, scene.num_faces, vp, H, W,
            extra_cap=max(scene.tri_vertices.shape[0] // 16, 256))
    grid = (1080 // 8, 1920 // 128)
    lox, hix = tx.min(axis=1), tx.max(axis=1)
    loy, hiy = ty.min(axis=1), ty.max(axis=1)
    tx0 = np.clip(np.floor(np.asarray(lox) / 128).astype(np.int64), 0,
                  grid[1] - 1)
    tx1 = np.floor(np.asarray(hix) / 128).astype(np.int64)
    ty0 = np.clip(np.floor(np.asarray(loy) / 8).astype(np.int64), 0,
                  grid[0] - 1)
    ty1 = np.floor(np.asarray(hiy) / 8).astype(np.int64)
    on = ((tx1 >= 0) & (np.asarray(lox) / 128 < grid[1])
          & (ty1 >= 0) & (np.asarray(loy) / 8 < grid[0]))
    vis = np.asarray(valid) & on & (tx0 <= np.clip(tx1, 0, grid[1] - 1)) \
        & (ty0 <= np.clip(ty1, 0, grid[0] - 1))
    tx1 = np.clip(tx1, 0, grid[1] - 1)
    ty1 = np.clip(ty1, 0, grid[0] - 1)

    counts = np.zeros(grid[0] * grid[1], np.int64)
    for f in np.nonzero(vis)[0]:
        for tyy in range(ty0[f], ty1[f] + 1):
            counts[tyy * grid[1] + tx0[f]:tyy * grid[1] + tx1[f] + 1] += 1

    total = counts.sum()
    nt = counts.size
    print(f"tess={tess}: tris~{int(np.asarray(valid).sum())} pairs={total} "
          f"tiles={nt} mean={total/nt:.1f}")
    for thr in (0, 8, 16, 32, 64, 128, 256, 512, 1024):
        n = (counts <= thr).sum()
        print(f"  <= {thr:5d}: {n:5d} tiles ({100*n/nt:5.1f}%)")
    # step counts: current kernel vs grouped classes
    cur = np.maximum(np.ceil(counts / 128), 1).sum()
    for ws in ([(128,)], [(32, 128)], [(8, 32, 128)], [(8, 16, 32, 64, 128)]):
        ws = ws[0]
        steps = 0
        for i, w in enumerate(ws):
            lo = 0 if i == 0 else ws[i - 1]
            sel = (counts > lo) & (counts <= w) if i else (counts <= w)
            g = 128 // w
            steps += np.ceil(sel.sum() / g) if w < 128 else \
                np.maximum(np.ceil(counts[sel] / 128), 1).sum()
        # tiles above the largest class walk the dense path
        sel = counts > ws[-1]
        steps += np.maximum(np.ceil(counts[sel] / 128), 1).sum()
        print(f"  classes {ws}: steps {int(steps)} (current {int(cur)})")


for tess in (1, 4, 6):
    hist(tess)
