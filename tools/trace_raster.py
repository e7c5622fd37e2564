import sys; sys.path.insert(0, "/root/repo")
import glob, gzip, json, os, time
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import numpy as np, jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=4))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)

@jax.jit
def frame(v):
    hit, z = rasterize.rasterize_sorted(world, scene.tri_vertices, scene.num_faces, v, height=H, width=W)
    return z[:4,:4] + 0.0*hit.tri[0]

_ = np.asarray(frame(vp))
os.system("rm -rf /tmp/xtrace")
jax.profiler.start_trace("/tmp/xtrace")
for _ in range(3):
    _ = np.asarray(frame(vp))
jax.profiler.stop_trace()

# parse: find device-lane ops by duration
files = glob.glob("/tmp/xtrace/**/*.trace.json.gz", recursive=True)
ev = []
for f in files:
    t = json.load(gzip.open(f))
    for e in t.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 300:
            name = e.get("name", "")
            pid = e.get("pid", 0)
            ev.append((e["dur"], name))
from collections import defaultdict
agg = defaultdict(float)
for dur, name in ev:
    agg[name] += dur
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:25]:
    print(f"{dur/3/1000.0:9.2f} ms  {name[:120]}")
