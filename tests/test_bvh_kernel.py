"""Pallas packet LBVH traversal (ops/bvh_kernel.py): parity with the
XLA traversal oracle (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from vri_tpu.config import RenderConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.ops import bvh as bvh_mod
from vri_tpu.ops import bvh_kernel, raygen
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes


def test_packet_matches_oracle():
    d = RenderDelegate(RenderConfig(width=32, height=32))
    d.populate(scenes.cornell_box())
    scene = d.sync()
    world = bake_world(scene)
    bvh = bvh_mod.build_bvh(world, scene.tri_vertices, scene.num_faces)
    cam = d.camera
    o, dirs = raygen.camera_rays(jnp.asarray(cam.inv_view_proj),
                                 jnp.asarray(cam.eye), 32, 32)
    o = o.reshape(-1, 3)
    dirs = dirs.reshape(-1, 3)
    ref = bvh_mod.traverse(bvh, o, dirs)
    got = bvh_kernel.trace_packet_hits(bvh, o, dirs)
    ta = np.asarray(ref.t)
    tb = np.asarray(got.t)
    same_hit = (np.asarray(ref.tri) >= 0) == (np.asarray(got.tri) >= 0)
    assert same_hit.mean() > 0.999, same_hit.mean()
    hits = (np.asarray(ref.tri) >= 0) & (np.asarray(got.tri) >= 0)
    np.testing.assert_allclose(tb[hits], ta[hits], rtol=1e-4, atol=1e-4)
    # winners may differ on exact depth ties; ids must match elsewhere
    tie = np.abs(ta - tb) < 1e-5
    agree = (np.asarray(ref.tri) == np.asarray(got.tri))[hits & tie]
    assert agree.mean() > 0.95, agree.mean()
