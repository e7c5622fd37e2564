"""Measure GI-march lane divergence and the upside of ray reordering.

The march kernel pays sum-over-blocks of the block MAX iterations (lock-step
(8,128) lanes, sequential grid).  This probe extracts the production GI ray
set (540p subsample of the 1080p kitchen G-buffer, cosine-sampled bounce
directions), runs the kernel once for the per-ray iteration counts, and
computes the total block-step cost under candidate orderings:
  natural | octant(wi) | octant+coarse-t | oracle (sort by it).
"""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.renderer import Renderer
from vri_tpu.passes import frame as frame_mod
from vri_tpu.ops import gi as gi_mod, raygen, shading, march_kernel
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

W, H, S = 1920, 1080, 2
cfg = RenderConfig(width=W, height=H, sdf=SDFConfig.preset("room"))
sdf = cfg.sdf
r = Renderer(cfg)
r.load_stage(scenes.kitchen_stress(num_objects=256))
cascades = r.ensure_cascades()
scene = r.scene
fp = frame_mod.FrameParams.from_camera(r.camera, H)
world = bake_world(scene)
key = jax.random.PRNGKey(0)


@jax.jit
def gi_rays():
    o0, d0 = raygen.camera_rays(fp.inv_view_proj, fp.eye, H, W)
    o0, d0 = o0.reshape(-1, 3), d0.reshape(-1, 3)
    hit = frame_mod._visibility_raster(scene, world, fp, H, W,
                                       variant="sorted", caps_scale=1)
    gb = shading.resolve_gbuffer(scene, world, hit, o0, d0,
                                 pixel_spread=fp.pixel_spread)
    sub, _ = frame_mod._subsample_pn(gb, H, W, S)
    bias = gi_mod.surface_bias(sub.position, cascades, sdf)[:, None]
    u = jax.random.uniform(key, (sub.position.shape[0], 2))
    wi = gi_mod.cosine_sample_hemisphere(sub.normal, u[:, 0], u[:, 1])
    o = sub.position + sub.normal * bias
    return o, wi


o, wi = gi_rays()
gi_range = float(cascades.voxel_size[-1] * sdf.cascade_resolution
                 * sdf.gi_range_factor)
ks = sdf.gi_steps * 2 + 16
rec = march_kernel.march(cascades, o, wi, t_max=gi_range, config=sdf,
                         max_steps=ks, payload=False)
it = np.asarray(rec.iterations)
hit = np.asarray(rec.hit)
t = np.asarray(rec.t)
wi_h = np.asarray(wi)
m = it.shape[0]
print(f"rays {m}  hit-rate {hit.mean():.3f}  it mean {it.mean():.1f} "
      f"p50 {np.median(it):.0f} p95 {np.percentile(it, 95):.0f} "
      f"max {it.max()}")


def block_cost(perm):
    v = it[perm]
    nb = (len(v) + 1023) // 1024
    pad = nb * 1024 - len(v)
    v = np.pad(v, (0, pad))
    return int(v.reshape(nb, 1024).max(1).sum())


nat = block_cost(np.arange(m))
oracle = block_cost(np.argsort(it, kind="stable"))
oct_key = ((wi_h[:, 0] > 0).astype(np.int64) * 4
           + (wi_h[:, 1] > 0) * 2 + (wi_h[:, 2] > 0))
octp = np.argsort(oct_key, kind="stable")
# octant + quantized coarse direction (4x4 bins of the two minor axes)
fine = oct_key * 256 + (np.clip((np.abs(wi_h[:, 0]) * 16), 0, 15)
                        .astype(np.int64) * 16
                        + np.clip(np.abs(wi_h[:, 1]) * 16, 0, 15)
                        .astype(np.int64))
finep = np.argsort(fine, kind="stable")
print(f"block-steps  natural {nat}  octant {block_cost(octp)}  "
      f"oct+dir16 {block_cost(finep)}  oracle {oracle}")
print(f"upside: octant {1 - block_cost(octp)/nat:.1%}  "
      f"oct+dir16 {1 - block_cost(finep)/nat:.1%}  "
      f"oracle {1 - oracle/nat:.1%}")
