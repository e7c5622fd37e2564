"""Stage isolation of rasterize_sorted at a given tess: prep vs dense
kernel vs grouped kernel vs resolve.  Captures the REAL intermediates by
recording _worklist_to_frame's arguments from one eager run, then times
each stage in-jit with a loop-carried perturbation."""
import sys; sys.path.insert(0, "/root/repo")
import functools
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize as R
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
CULL = "--nocull" not in sys.argv
sys.argv = [a for a in sys.argv if not a.startswith("--")]
TESS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=TESS))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)
print("faces:", int(scene.num_faces))

# ---- capture the back-half arguments from one eager run -------------------
captured = {}
orig = R._worklist_to_frame


def spy(*args, **kw):
    captured["args"] = jax.tree_util.tree_map(
        lambda a: a if isinstance(a, jnp.ndarray) else a, args)
    captured["kw"] = kw
    return orig(*args, **kw)


R._worklist_to_frame = spy
cs = frame_mod._cull_sign(scene) if CULL else None
raw = getattr(R.rasterize_sorted, "__wrapped__", R.rasterize_sorted)
hit, z = raw(world, scene.tri_vertices, scene.num_faces, vp,
             height=H, width=W, cull_sign=cs)
R._worklist_to_frame = orig
assert int(hit.overflow) == 0
args = captured["args"]
kw = dict(captured["kw"])
(wt, wchunk, flags, chunks, overflowed,
 tx, ty, tw, b1, b2, src_sorted) = args
grouped_args = kw["grouped_args"]
total_work = int(kw["total_work"])
tc = kw["tri_chunk"]
grid = kw["grid"]
tile_h, tile_w = kw["tile_h"], kw["tile_w"]
num_tiles = grid[0] * grid[1]
p = tile_h * tile_w
print(f"total_work {total_work}, tiles {num_tiles}, "
      f"chunks {chunks.shape}, grouped steps {int(grouped_args[4])}, "
      f"grouped tiles {int(np.asarray(grouped_args[3]).sum())}")


def bench(label, fn, iters=20):
    jfn = jax.jit(fn)
    _ = jax.device_get(jax.tree_util.tree_leaves(jfn(jnp.float32(0)))[0])

    @jax.jit
    def loop(v0):
        def body(i, v):
            out = jfn(v)
            lead = jax.tree_util.tree_leaves(out)[0]
            return v + 0.0 * lead.ravel()[0].astype(jnp.float32)
        return jax.lax.fori_loop(0, iters, body, v0)

    _ = np.asarray(loop(jnp.float32(0)))
    t0 = time.time()
    _ = np.asarray(loop(jnp.float32(0)))
    ms = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label:34s} {ms:7.2f} ms")
    return ms


# ---- full frame (reference point) -----------------------------------------
def full(i):
    h, zz = R.rasterize_sorted(world, scene.tri_vertices, scene.num_faces,
                               vp + 0.0 * i, height=H, width=W, cull_sign=cs)
    return zz[:4, :4], h.tri[0], h.u[0]


t_full = bench("full rasterize_sorted", full)


# ---- back half (kernels + merge + resolve) ---------------------------------
def back(i):
    h, zz = orig(wt + (0.0 * i).astype(jnp.int32), wchunk, flags, chunks, overflowed,
                 tx, ty, tw, b1, b2, src_sorted, **kw)
    return zz[:4, :4], h.tri[0], h.u[0]


t_back = bench("back half (kernels+resolve)", back)


# ---- dense pass1 kernel only ------------------------------------------------
def pass1(i):
    row_spec = pl.BlockSpec((1, 1, p), lambda g, wt_r, wc_r, fl_r:
                            (wt_r[g], 0, 0), memory_space=pltpu.VMEM)
    chunk_spec = pl.BlockSpec((1, 8, 3 * tc), lambda g, wt_r, wc_r, fl_r:
                              (wc_r[g], 0, 0), memory_space=pltpu.VMEM)
    grid1 = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3, grid=(total_work,),
        in_specs=[chunk_spec], out_specs=[row_spec] * 2,
        scratch_shapes=[pltpu.VMEM((p, 1), jnp.int32),
                        pltpu.VMEM((p, 1), jnp.float32)])
    kernel1 = functools.partial(R._pass1_kernel, tile_h=tile_h,
                                tile_w=tile_w, tri_chunk=tc, num_tx=grid[1])
    z_rows, slot_rows = pl.pallas_call(
        kernel1, grid_spec=grid1,
        out_shape=[jax.ShapeDtypeStruct((num_tiles, 1, p), jnp.float32),
                   jax.ShapeDtypeStruct((num_tiles, 1, p), jnp.int32)],
    )(wt + (0.0 * i).astype(jnp.int32), wchunk, flags, chunks)
    return z_rows[0, 0, 0], slot_rows[0, 0, 0]


t_p1 = bench("dense pass1 kernel", pass1)


# ---- grouped kernel only ----------------------------------------------------
fl_g, chunks_g, src_row, grouped_tile, n_gsteps = grouped_args
gcap = chunks_g.shape[0]
maxg = tc // R._GROUP_WIDTHS[0]
ng = int(n_gsteps)


def gk(i):
    grow_spec = pl.BlockSpec((1, maxg, p), lambda g, fl_r: (g, 0, 0),
                             memory_space=pltpu.VMEM)
    gchunk_spec = pl.BlockSpec((1, 8, 3 * tc), lambda g, fl_r: (g, 0, 0),
                               memory_space=pltpu.VMEM)
    gspec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1, grid=(ng,),
        in_specs=[gchunk_spec], out_specs=[grow_spec] * 2)
    zg, sg = pl.pallas_call(
        functools.partial(R._grouped_kernel, tile_h=tile_h, tile_w=tile_w,
                          tri_chunk=tc),
        grid_spec=gspec,
        out_shape=[jax.ShapeDtypeStruct((gcap, maxg, p), jnp.float32),
                   jax.ShapeDtypeStruct((gcap, maxg, p), jnp.int32)],
    )(fl_g + (0.0 * i).astype(jnp.int32), chunks_g)
    return zg[0, 0, 0], sg[0, 0, 0]


t_gk = bench("grouped kernel", gk)

print("---- derived ----")
print(f"prep (emission+sort+template)      {t_full - t_back:7.2f} ms")
print(f"merge+resolve                      {t_back - t_p1 - t_gk:7.2f} ms")
print(f"per dense step                     {t_p1 / max(total_work,1) * 1e3:7.2f} us"
      f"  ({total_work} steps)")
print(f"per grouped step                   {t_gk / max(ng,1) * 1e3:7.2f} us"
      f"  ({ng} steps)")
