"""Fine-grained xprof attribution of the 49k sorted-raster frame."""
import sys; sys.path.insert(0, "/root/repo")
import glob, gzip, json, os
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
TESS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=TESS))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)
CS = frame_mod._cull_sign(scene)

@jax.jit
def frame(v):
    hit, z = rasterize.rasterize_sorted(
        world, scene.tri_vertices, scene.num_faces, v, height=H, width=W,
        cull_sign=CS)
    return z[:4, :4] + 0.0 * hit.tri[0] + 0.0 * hit.u[0]

_ = np.asarray(frame(vp))
os.system("rm -rf /tmp/xtrace")
jax.profiler.start_trace("/tmp/xtrace")
for _ in range(3):
    _ = np.asarray(frame(vp))
jax.profiler.stop_trace()

files = glob.glob("/tmp/xtrace/**/*.trace.json.gz", recursive=True)
from collections import defaultdict
agg = defaultdict(float)
for f in files:
    t = json.load(gzip.open(f))
    for e in t.get("traceEvents", []):
        name = e.get("name", "")
        if (e.get("ph") == "X" and e.get("dur", 0) > 15
                and not name.startswith("$")
                and "asarray" not in name and "jit_frame" not in name
                and "PjitFunction" not in name):
            agg[name] += e["dur"]
tot = 0.0
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
    print(f"{dur/3/1000.0:9.3f} ms  {name[:110]}")
    tot += dur
print(f"--- sum of listed: {tot/3/1000.0:.2f} ms (frame ~24)")
