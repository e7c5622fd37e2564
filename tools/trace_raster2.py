"""Trace rasterize_sorted @49k and attribute fusions to source lines."""
import sys; sys.path.insert(0, "/root/repo")
import glob, gzip, json, os
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
    hit, z = rasterize.rasterize_sorted(world, scene.tri_vertices,
                                        scene.num_faces, v, height=H, width=W)
    return z[:4, :4] + 0.0 * hit.tri[0]

_ = np.asarray(frame(vp))
os.system("rm -rf /tmp/xtrace2")
jax.profiler.start_trace("/tmp/xtrace2")
for _ in range(3):
    _ = np.asarray(frame(vp))
jax.profiler.stop_trace()

files = glob.glob("/tmp/xtrace2/**/*.trace.json.gz", recursive=True)
from collections import defaultdict
agg = defaultdict(float)
meta = {}
for f in files:
    t = json.load(gzip.open(f))
    for e in t.get("traceEvents", []):
        if e.get("ph") == "X" and e.get("dur", 0) > 200:
            name = e.get("name", "")
            args = e.get("args", {})
            agg[name] += e["dur"]
            if name not in meta and args:
                src = args.get("source_info") or args.get("tf_op") or ""
                ln = args.get("long_name", "")
                meta[name] = (src, ln[:160])
tot = 0.0
for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:28]:
    src, ln = meta.get(name, ("", ""))
    ms = dur / 3 / 1000.0
    if name.startswith(("$", "PjitFunction", "jit_frame")):
        continue
    tot += ms
    print(f"{ms:8.2f} ms  {name[:28]:28s} {src[:60]:60s} {ln[:90]}")
print(f"--- device op total {tot:.2f} ms/frame")
