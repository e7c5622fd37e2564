"""march vs march_stream on the production GI ray set (518k rays),
sweeping (queue, service_every).  In-jit loops, single readback."""
import sys; sys.path.insert(0, "/root/repo")
import time
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


o, wi = jax.block_until_ready(gi_rays())
gi_range = float(cascades.voxel_size[-1] * sdf.cascade_resolution
                 * sdf.gi_range_factor)
ks = sdf.gi_steps * 2 + 16
ITERS = 20


def bench(label, fn, **kw):
    @jax.jit
    def loop(o0):
        def body(i, o_acc):
            rec = fn(cascades, o_acc, wi, t_max=gi_range, config=sdf,
                     max_steps=ks, payload=False, **kw)
            return o_acc + 0.0 * rec.t[:, None]
        return jax.lax.fori_loop(0, ITERS, body, o0)
    out = np.asarray(loop(o)[0, 0])
    t0 = time.time()
    out = np.asarray(loop(o)[0, 0])
    per = (time.time() - t0 - 0.04) / ITERS * 1e3
    rec = fn(cascades, o, wi, t_max=gi_range, config=sdf, max_steps=ks,
             payload=False, **kw)
    hits = float(np.asarray(rec.hit).mean())
    print(f"{label:28s}: {per:7.2f} ms  hit {hits:.3f}", flush=True)
    return per, np.asarray(rec.t)


base, t_ref = bench("block (baseline)", march_kernel.march)
for q in (16, 32, 64):
    for srv in (2, 4, 8):
        per, t_s = bench(f"stream q={q} srv={srv}",
                         march_kernel.march_stream, queue=q,
                         service_every=srv)
        exact = np.array_equal(t_ref, t_s)
        print(f"    -> {base/per:.2f}x  exact={exact}", flush=True)
