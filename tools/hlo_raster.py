"""Dump named ops (copy.985 / fusion.30 style) from the optimized HLO of
the 49k sorted-raster frame to attribute trace costs to source ops."""
import sys; sys.path.insert(0, "/root/repo")
import re
import jax
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
import jax.numpy as jnp
from vri_tpu.config import RenderConfig
from vri_tpu.hydra.delegate import RenderDelegate
from vri_tpu.ops import rasterize
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

H, W = 1080, 1920
TESS = int(sys.argv[1]) if len(sys.argv) > 1 else 4
PATTERNS = sys.argv[2:] or ["copy.985", "fusion.30", "fusion.33",
                            "fusion.34", "fusion.32", "copy.919",
                            "fusion.23", "while.38"]
d = RenderDelegate(RenderConfig(width=W, height=H))
d.populate(scenes.kitchen_stress(num_objects=256, tess=TESS))
scene = d.sync()
world = bake_world(scene)
vp = jnp.asarray(d.camera.view_proj)
CS = frame_mod._cull_sign(scene)


def frame(v):
    hit, z = rasterize.rasterize_sorted(
        world, scene.tri_vertices, scene.num_faces, v, height=H, width=W,
        cull_sign=CS)
    return z[:4, :4] + 0.0 * hit.tri[0] + 0.0 * hit.u[0]


txt = jax.jit(frame).lower(vp).compile().as_text()
lines = txt.splitlines()
for pat in PATTERNS:
    rx = re.compile(r"%?" + re.escape(pat) + r"\b[ =]")
    for i, ln in enumerate(lines):
        if rx.search(ln) and "=" in ln:
            print(f"--- {pat}:")
            print(ln.strip()[:400])
            # for fusions, print the computation name so we can find it
            m = re.search(r"calls=(\S+)", ln)
            if m:
                cname = m.group(1).rstrip(",")
                # print the fused computation body (first 40 lines)
                for j, l2 in enumerate(lines):
                    if l2.strip().startswith(f"%{cname} ") or \
                       l2.strip().startswith(f"{cname} "):
                        for k in range(j, min(j + 45, len(lines))):
                            print("   ", lines[k].strip()[:240])
                            if lines[k].strip() == "}":
                                break
                        break
            break
