"""Dump the optimized HLO of the production GI frame and print the named
fusions that xprof flagged hot (pass names on argv)."""
import sys; sys.path.insert(0, "/root/repo")
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.renderer import Renderer
from vri_tpu.passes import frame as frame_mod
from vri_tpu.usd import scenes

W, H = 1920, 1080
cfg = RenderConfig(width=W, height=H, sdf=SDFConfig.preset("room"))
r = Renderer(cfg)
r.load_stage(scenes.kitchen_stress(num_objects=256))
cascades = r.ensure_cascades()
scene = r.scene
fp = frame_mod.FrameParams.from_camera(r.camera, H)
key = jax.random.PRNGKey(0)
st0 = frame_mod.init_temporal(H, W, 2)


@jax.jit
def one(st, k):
    aovs, st2 = frame_mod.render_frame_gi_temporal(
        scene, fp, cascades, k, st, height=H, width=W,
        config=cfg.sdf, backend="raster", samples=1, use_cache=True,
        gi_scale=2)
    return st2, aovs["color"][0, 0]


txt = one.lower(st0, key).compile().as_text()
open("/tmp/gi_hlo.txt", "w").write(txt)
names = sys.argv[1:] or ["fusion.42"]
lines = txt.splitlines()
for i, ln in enumerate(lines):
    for nm in names:
        if f"%{nm} " in ln or f"{nm} = " in ln:
            print(ln.strip()[:400])
print("total lines:", len(lines))
