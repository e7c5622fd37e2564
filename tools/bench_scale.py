"""Beyond-bench-scale measurement (VERDICT r3 #6): the city stress stage
at ~1.3M instanced triangles / 4500 instances (vs the reference's 4096
draw-item bindless ceiling, Source/ResourceRegistry.cpp:25-34).

Measures, in-jit (fenced single readback, full HitRecord consumed):
  1. sorted-raster visibility frame ms, full-rate geometry (lod_tau=0)
  2. the same with discrete LOD selection (lod_tau=0.75)
  3. scene HBM bytes (stored-prototype pools vs instanced counts)
  4. SDF cascade build at an outdoor preset: bricks, overflow counts
Results table goes to BASELINE.md.
"""
import sys; sys.path.insert(0, "/root/repo")
import time

import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
import numpy as np
import jax.numpy as jnp

from vri_tpu.config import RenderConfig, SceneLimits, SDFConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
ITERS = 5

print("authoring city (4500 towers, tess=5)...", flush=True)
t0 = time.time()
stage = scenes.city_stress(num_buildings=4500, tess=5, num_protos=24)
lim = SceneLimits(max_instances=8192, max_vertices=1 << 22,
                  max_faces=1 << 22)   # room for the LOD chain tail
cfg = RenderConfig(width=W, height=H, limits=lim, lod_tau=0.75,
                   lod_levels=3, lod_min_faces=64)
d = RenderDelegate(cfg)
d.populate(stage)
scene = d.sync()
world = bake_world(scene)
print(f"sync {time.time()-t0:.1f}s: {int(scene.num_instances)} instances, "
      f"{int(scene.num_faces)} instanced faces, "
      f"{scene.positions.shape[0]} stored verts", flush=True)
hbm = sum(int(np.prod(getattr(scene, k).shape))
          * getattr(scene, k).dtype.itemsize
          for k in scene.__dataclass_fields__
          if isinstance(getattr(scene, k), jnp.ndarray))
print(f"scene device bytes: {hbm/1e6:.1f} MB", flush=True)

fp = frame_mod.FrameParams.from_camera(d.camera, H)

# pair-count diagnostic: how much (tile, tri) work the view really has
from vri_tpu.ops import rasterize as R

def pair_stats(face_mask=None, label=""):
    num_faces = scene.num_faces if face_mask is None else scene.num_faces_total
    tx, ty, tz, tw, b1, b2, src, valid, over = R.triangle_setup_clipped(
        world, scene.tri_vertices, num_faces, jnp.asarray(fp.view_proj),
        H, W, extra_cap=8192, face_mask=face_mask,
        cull_sign=frame_mod._cull_sign(scene))
    th, tw_ = 8, 128
    grid = ((H + 7) // 8, (W + 127) // 128)
    lox, hix = tx.min(1), tx.max(1)
    loy, hiy = ty.min(1), ty.max(1)
    tx0 = jnp.floor(lox / tw_).astype(jnp.int32)
    tx1 = jnp.floor(hix / tw_).astype(jnp.int32)
    ty0 = jnp.floor(loy / th).astype(jnp.int32)
    ty1 = jnp.floor(hiy / th).astype(jnp.int32)
    on = valid & (tx1 >= 0) & (tx0 < grid[1]) & (ty1 >= 0) & (ty0 < grid[0])
    er = jnp.where(on, jnp.clip(ty1, 0, grid[0]-1) - jnp.clip(ty0, 0, grid[0]-1) + 1, 0)
    ec = jnp.where(on, jnp.clip(tx1, 0, grid[1]-1) - jnp.clip(tx0, 0, grid[1]-1) + 1, 0)
    print(f"pairs{label}: visible tris {int(jnp.sum(on))}, "
          f"(tile,tri) pairs {int(jnp.sum(er*ec))}", flush=True)

pair_stats(label=" full-rate")
if scene.tri_lod is not None:
    from vri_tpu.ops import lod as lod_mod
    focal_px = 1.0 / float(np.maximum(np.asarray(fp.pixel_spread), 1e-8))
    mask, _ = lod_mod.face_mask(scene, jnp.asarray(fp.eye), focal_px, 0.75)
    pair_stats(face_mask=mask, label=" with-LOD")


def bench_raster(lod_tau, label, cull=None, compact_cap=None):
    def one(v):
        fpv = fp.replace(view_proj=v)
        hit = frame_mod._visibility_raster(scene, world, fpv, H, W,
                                           caps_scale=2, lod_tau=lod_tau,
                                           cull_instances=cull,
                                           compact_cap=compact_cap)
        s = (jnp.sum(hit.u) + jnp.sum(hit.v)
             + jnp.sum(hit.tri.astype(jnp.float32))
             + jnp.sum(jnp.where(jnp.isfinite(hit.t), hit.t, 0.0)))
        return s, hit.overflow

    @jax.jit
    def loop(v0):
        def body(i, carry):
            v, ov = carry
            s, o = one(v)
            return v + jnp.tanh(s * 1e-20) * 1e-20, ov + o
        return jax.lax.fori_loop(0, ITERS, body,
                                 (v0, jnp.zeros((), jnp.int32)))

    v0 = jnp.asarray(fp.view_proj)
    out = loop(v0)
    _ = np.asarray(out[0])
    over = int(np.asarray(out[1]))
    t0 = time.time()
    out = loop(v0)
    _ = np.asarray(out[0])
    per = (time.time() - t0 - 0.04) / ITERS * 1e3
    mrays = H * W / per / 1e3
    print(f"{label}: {per:.1f} ms ({mrays/1e3:.1f} Mrays/s), "
          f"overflow tiles {over}", flush=True)
    return per


bench_raster(0.0, "raster full-rate CULLED+compacted (cap 512k)",
             cull=True, compact_cap=1 << 18)   # x2 caps_scale -> 512k
bench_raster(0.0, "raster full-rate UNCULLED (r4 baseline)  ", cull=False)
bench_raster(0.75, "raster with LOD (lod_tau=.75, uncompacted)")

# SDF build through the PRODUCTION chains-free base view (round 5:
# registry.SceneBuffers.base_view — the r4 workaround authored a second
# LOD-free delegate because the LOD-expanded pool made the binner
# allocate ~50M-pair arrays and crash the worker)
scene = scene.base_view()
world = bake_world(scene)
from vri_tpu.ops import sdf, sdf_build

sdf_cfg = SDFConfig(num_cascades=6, cascade_resolution=64,
                    base_voxel_size=0.5, max_bricks=1 << 17,
                    truncation_voxels=2.0, max_triangles_per_brick=24,
                    march_max_steps=96)
centers = sdf.default_centers(sdf_cfg, jnp.zeros(3))


def build():
    cas, st = sdf_build.build_for_scene(scene, world, centers, sdf_cfg)
    _ = np.asarray(cas.num_bricks)
    return cas


t0 = time.time()
cas = build()
print(f"SDF build compile+run {time.time()-t0:.1f}s", flush=True)
t0 = time.time()
cas = build()
print(f"SDF build steady: {(time.time()-t0-0.04)*1e3:.0f} ms, "
      f"bricks {int(cas.num_bricks)}/{sdf_cfg.max_bricks}, "
      f"list overflow {int(cas.overflow)}, near-drop {int(cas.near_drop)}",
      flush=True)
