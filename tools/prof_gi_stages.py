"""Cumulative-prefix breakdown of the 1080p production GI frame.

Times prefixes of render_frame_gi_temporal's body in-jit (data-dependent
fori_loop, single scalar readback) so successive deltas attribute the
frame to: visibility raster, G-buffer resolve, direct (shadow march),
indirect (GI march + fetch), reprojection+temporal blend, composite.

Note: the "full" prefix ends at the composite — it omits the
pack_temporal / AOV-assembly tail that render_frame_gi_temporal also
runs, so the final delta slightly under-attributes the real composite
stage (measure the whole function with tools/prof_gi.py for the total).
"""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.renderer import Renderer
from vri_tpu.passes import frame as frame_mod
from vri_tpu.ops import gi as gi_mod, shading, raygen, intersect
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W, S = 1080, 1920, 2
cfg = RenderConfig(width=W, height=H, sdf=SDFConfig.preset("room"))
r = Renderer(cfg)
r.load_stage(scenes.kitchen_stress(num_objects=256))
cascades = r.ensure_cascades()
scene = r.scene
fp = frame_mod.FrameParams.from_camera(r.camera, H)
key = jax.random.PRNGKey(0)
st0 = frame_mod.init_temporal(H, W, S)
sdf = cfg.sdf


def prefix(stage):
    def fn(k):
        world_verts = bake_world(scene)
        origins, dirs = raygen.camera_rays(fp.inv_view_proj, fp.eye, H, W)
        o = origins.reshape(-1, 3); d = dirs.reshape(-1, 3)
        # variant="auto" so the profiled kernel is exactly the production
        # dispatch (size-based: sorted work-list at 1080p full frames)
        hit = frame_mod._visibility_raster(scene, world_verts, fp, H, W,
                                           variant="auto", caps_scale=1)
        if stage == "vis":
            return hit.tri[0] + hit.u[0]
        gb = shading.resolve_gbuffer(scene, world_verts, hit, o, d,
                                     pixel_spread=fp.pixel_spread)
        t = jnp.linalg.norm(gb.position - fp.eye[None, :], axis=-1)
        gb = gb.replace(depth=jnp.where(gb.valid, t, intersect.INF))
        if stage == "gbuf":
            return gb.albedo[0, 0] + gb.depth[0]
        direct = frame_mod._direct_lighting(gb, scene, cascades, sdf, H, W)
        if stage == "direct":
            return direct[0, 0] + gb.depth[0]
        sub, valid_s = frame_mod._subsample_pn(gb, H, W, S)
        ind = gi_mod.indirect_radiance(sub, scene, cascades, k,
                                       config=sdf, samples=1,
                                       use_cache=True)
        if stage == "indirect":
            return ind[0, 0] + direct[0, 0]
        hs, ws = H // S, W // S
        h_ind, h_count = frame_mod._reproject(st0, sub.position, sub.normal,
                                              valid_s, hs, ws)
        count = jnp.minimum(h_count, 16.0) + 1.0
        ind_blend_s = h_ind + (ind - h_ind) / count[:, None]
        if stage == "reproj":
            return ind_blend_s[0, 0] + direct[0, 0]
        ind_blend = frame_mod._upsample(ind_blend_s, hs, ws, S)
        color = gb.emissive + gb.albedo * (direct + ind_blend)
        color = jnp.where(gb.valid[:, None], color, 0.0)
        return color[0, 0]
    return fn


def bench(label, fn, iters=10):
    @jax.jit
    def loop(k0):
        def body(i, carry):
            k, acc = carry
            k2 = jax.random.fold_in(k, i)
            return k2, acc + fn(k2)
        return jax.lax.fori_loop(0, iters, body, (k0, jnp.float32(0)))
    _ = np.asarray(loop(key)[1])
    t0 = time.time()
    _ = np.asarray(loop(key)[1])
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label:28s}: {per:7.2f} ms", flush=True)
    return per


prev = 0.0
for st in ("vis", "gbuf", "direct", "indirect", "reproj", "full"):
    cur = bench(st, prefix(st))
    print(f"    delta {st}: {cur - prev:+.2f} ms", flush=True)
    prev = cur
