"""Production GI frame: full 1080p vs one 135-row band (v5e-8 per-chip
proxy), both in-jit with chained temporal state."""
import sys; sys.path.insert(0, "/root/repo")
import time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.renderer import Renderer
from vri_tpu.passes import frame as frame_mod
from vri_tpu.usd import scenes

W = 1920
cfg = RenderConfig(width=W, height=1080, sdf=SDFConfig.preset("room"))
r = Renderer(cfg)
r.load_stage(scenes.kitchen_stress(num_objects=256))
cascades = r.ensure_cascades()
scene = r.scene
fp = frame_mod.FrameParams.from_camera(r.camera, 1080)
key = jax.random.PRNGKey(0)

def bench(h, band, label, iters=10):
    st0 = frame_mod.init_temporal(h, W, 2)
    def one(st, k):
        aovs, st2 = frame_mod.render_frame_gi_temporal(
            scene, fp, cascades, k, st, height=h, width=W,
            config=cfg.sdf, backend="raster", samples=1, use_cache=True,
            gi_scale=2, band=band)
        return st2, aovs["color"]
    @jax.jit
    def loop(st):
        def body(i, carry):
            st, acc = carry
            st2, color = one(st, jax.random.fold_in(key, i))
            return st2, acc + color[0, 0]
        return jax.lax.fori_loop(0, iters, body,
                                 (st, jnp.zeros(3)))
    _ = np.asarray(loop(st0)[1])
    t0 = time.time()
    _ = np.asarray(loop(st0)[1])
    per = (time.time() - t0 - 0.04) / iters * 1e3
    print(f"{label}: {per:.1f} ms/frame", flush=True)
    return per

full = bench(1080, None, "full 1080p production GI")
bandt = bench(136, (472, 1080), "135-row band (v5e-8 per-chip proxy)")
print(f"band x8 = {bandt:.1f} ms -> projected v5e-8 frame; "
      f"speedup vs full: {full/bandt:.2f}x of ideal 7.94x", flush=True)
