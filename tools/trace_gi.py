"""Fine-grained xprof attribution of the 1080p production GI frame."""
import sys; sys.path.insert(0, "/root/repo")
import glob, gzip, json, os
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
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

st, c = one(st0, key)
_ = np.asarray(c)
os.system("rm -rf /tmp/xtrace_gi")
jax.profiler.start_trace("/tmp/xtrace_gi")
for i in range(3):
    st, c = one(st, jax.random.fold_in(key, i))
    _ = np.asarray(c)
jax.profiler.stop_trace()

files = glob.glob("/tmp/xtrace_gi/**/*.trace.json.gz", recursive=True)
from collections import defaultdict
agg = defaultdict(float)
for f in files:
    t = json.load(gzip.open(f))
    for e in t.get("traceEvents", []):
        name = e.get("name", "")
        if (e.get("ph") == "X" and e.get("dur", 0) > 15
                and not name.startswith("$")
                and "asarray" not in name and "jit_one" not in name
                and "PjitFunction" not in name):
            agg[name] += e["dur"]
tot = 0.0
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:45]:
    print(f"{dur/3/1000.0:9.3f} ms  {name[:110]}")
    tot += dur
print(f"--- sum of listed: {tot/3/1000.0:.2f} ms")
