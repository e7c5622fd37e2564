"""march_compact A/B: production GI frame with compact_march on/off."""
import sys; sys.path.insert(0, "/root/repo")
import dataclasses
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.renderer import Renderer
from vri_tpu.passes import frame as frame_mod
from vri_tpu.usd import scenes

W = 1920


def run(compact: bool, iters=10):
    sdf = dataclasses.replace(SDFConfig.preset("room"),
                              compact_march=compact)
    cfg = RenderConfig(width=W, height=1080, sdf=sdf)
    r = Renderer(cfg)
    r.load_stage(scenes.kitchen_stress(num_objects=256))
    cascades = r.ensure_cascades()
    scene = r.scene
    fp = frame_mod.FrameParams.from_camera(r.camera, 1080)
    key = jax.random.PRNGKey(0)
    st0 = frame_mod.init_temporal(1080, W, 2)

    def one(st, k):
        aovs, st2 = frame_mod.render_frame_gi_temporal(
            scene, fp, cascades, k, st, height=1080, width=W,
            config=sdf, backend="raster", samples=1, use_cache=True,
            gi_scale=2, band=None)
        return st2, aovs["color"]

    @jax.jit
    def loop(st):
        def body(i, carry):
            st, acc = carry
            st2, color = one(st, jax.random.fold_in(key, i))
            return st2, acc + color[0, 0]
        return jax.lax.fori_loop(0, iters, body, (st, jnp.zeros(3)))

    ref = np.asarray(loop(st0)[1])
    t0 = time.time()
    _ = np.asarray(loop(st0)[1])
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"compact={compact}: {per:.1f} ms/frame  acc={ref}", flush=True)
    return per, ref


off, acc_off = run(False)
on, acc_on = run(True)
print(f"delta: {off - on:+.1f} ms  acc diff {np.abs(acc_on-acc_off).max():.2e}",
      flush=True)
