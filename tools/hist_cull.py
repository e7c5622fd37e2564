"""How many (tile, slot) pairs survive an EXACT edge-vs-tile-rect test
(vs the bbox emission)?  Sizes the emission-cull lever: a pair whose
triangle's edge functions exclude the whole tile rect contributes zero
covered pixels but still costs kernel walk time today.

Max of an affine field a*x+b*y+c over a rect = evaluate at the corner
selected by coefficient signs.  Keep a pair iff all three half-plane
fields have max >= 0 AND z has min <= 1 and max >= 0 over the rect.
"""
import sys; sys.path.insert(0, "/root/repo")
import numpy as np
import jax.numpy as jnp

from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
TH, TW = 8, 128


def run(tess):
    d = RenderDelegate(RenderConfig(width=W, height=H))
    d.populate(scenes.kitchen_stress(num_objects=256, tess=tess))
    scene = d.sync()
    world = bake_world(scene)
    vp = jnp.asarray(d.camera.view_proj)
    tx, ty, tz, tw, b1, b2, src_id, valid, _ = \
        rasterize.triangle_setup_clipped(
            world, scene.tri_vertices, scene.num_faces, vp, H, W,
            extra_cap=max(scene.tri_vertices.shape[0] // 16, 256))
    tx, ty, tz = map(np.asarray, (tx, ty, tz))
    valid = np.asarray(valid)
    grid = (H // TH, W // TW)

    lox, hix = tx.min(1), tx.max(1)
    loy, hiy = ty.min(1), ty.max(1)
    tx0 = np.floor(lox / TW).astype(np.int64)
    tx1 = np.floor(hix / TW).astype(np.int64)
    ty0 = np.floor(loy / TH).astype(np.int64)
    ty1 = np.floor(hiy / TH).astype(np.int64)
    on = (tx1 >= 0) & (tx0 < grid[1]) & (ty1 >= 0) & (ty0 < grid[0])
    vis = valid & on
    rx0 = np.clip(tx0, 0, grid[1] - 1)
    ry0 = np.clip(ty0, 0, grid[0] - 1)
    rx1 = np.clip(tx1, 0, grid[1] - 1)
    ry1 = np.clip(ty1, 0, grid[0] - 1)
    ec = np.where(vis, rx1 - rx0 + 1, 0)
    er = np.where(vis, ry1 - ry0 + 1, 0)
    area = ec * er
    total = int(area.sum())

    # affine coefficients (same construction as rasterize_sorted)
    ax_, bx_, cx_ = tx[:, 0], tx[:, 1], tx[:, 2]
    ay_, by_, cy_ = ty[:, 0], ty[:, 1], ty[:, 2]
    az_, bz_, cz_ = tz[:, 0], tz[:, 1], tz[:, 2]
    tri_area = (bx_ - ax_) * (cy_ - ay_) - (by_ - ay_) * (cx_ - ax_)
    dead = ~valid | (np.abs(tri_area) <= 1e-12)
    inv = np.where(dead, 0.0, 1.0 / np.where(dead, 1.0, tri_area))
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
    # l3 = 1 - l1 - l2
    ka3, kb3, kc3 = -(ka1 + ka2), -(kb1 + kb2), 1.0 - (kc1 + kc2)

    # emit pairs (vectorized repeat)
    sid = np.repeat(np.arange(tx.shape[0]), area)
    starts = np.cumsum(area) - area
    j = np.arange(total) - starts[sid]
    dyy = j // ec[sid]
    dxx = j - dyy * ec[sid]
    tyy = ry0[sid] + dyy
    txx = rx0[sid] + dxx
    x0 = txx * TW + 0.5
    x1 = txx * TW + TW - 0.5
    y0 = tyy * TH + 0.5
    y1 = tyy * TH + TH - 0.5

    def fmax(a, b, c):
        return (a[sid] * np.where(a[sid] > 0, x1, x0)
                + b[sid] * np.where(b[sid] > 0, y1, y0) + c[sid])

    def fmin(a, b, c):
        return (a[sid] * np.where(a[sid] > 0, x0, x1)
                + b[sid] * np.where(b[sid] > 0, y0, y1) + c[sid])

    keep = ((fmax(ka1, kb1, kc1) >= 0)
            & (fmax(ka2, kb2, kc2) >= 0)
            & (fmax(ka3, kb3, kc3) >= 0)
            & (fmin(kaz, kbz, kcz) <= 1.0)
            & (fmax(kaz, kbz, kcz) >= 0.0))
    kept = int(keep.sum())
    print(f"tess={tess}: pairs {total} -> {kept} "
          f"({100*kept/total:.1f}% survive; cull {100*(1-kept/total):.1f}%)",
          flush=True)
    # per-tile counts before/after -> step estimate
    tid = tyy * grid[1] + txx
    nt = grid[0] * grid[1]
    cb = np.bincount(tid, minlength=nt)
    ca = np.bincount(tid[keep], minlength=nt)
    for label, c in (("bbox", cb), ("edge-culled", ca)):
        dense_steps = np.maximum(np.ceil(c / 128), 1).sum()
        g_steps = 0
        prev = 0
        for w in (8, 16, 32, 64):
            selm = (c > prev) & (c <= w)
            g_steps += np.ceil(selm.sum() / (128 // w))
            prev = w
        selm = c > 64
        g_steps += np.maximum(np.ceil(c[selm] / 128), 1).sum() if selm.any() else 0
        print(f"  {label:12s}: dense-only steps {int(dense_steps)}, "
              f"grouped-class steps {int(g_steps)}", flush=True)


for tess in (1, 4, 6):
    run(tess)
