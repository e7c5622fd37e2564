"""Beyond-bench scale behavior (VERDICT r3 #6), CPU-sized versions.

The full measurement runs on TPU (tools/bench_scale.py, table in
BASELINE.md); these tests pin the *mechanisms* at small scale: prototype
pooling keeps stored geometry bounded, the instance count can exceed the
reference's 4096 bindless ceiling (Source/ResourceRegistry.cpp:25-34),
and capacity pressure (SDF atlas, raster lists) is counted, never silent.
"""

import dataclasses

import numpy as np
import pytest

from vri_tpu.config import RenderConfig, SceneLimits, SDFConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.usd import scenes


class TestCityScale:
    def test_proto_pooling_bounds_stored_geometry(self):
        st = scenes.city_stress(num_buildings=64, tess=4, num_protos=4)
        d = RenderDelegate(RenderConfig(width=64, height=64))
        d.populate(st)
        scene = d.sync()
        inst_faces = int(scene.num_faces)
        stored = int(scene.positions.shape[0])
        assert inst_faces > 12000          # 64 towers x 6*16*2 + ground
        # stored pool = 4 prototypes + ground, NOT 64 towers
        assert stored < inst_faces // 8
        assert scene.vertex_proto is not None

    def test_render_city_correct(self):
        """The instanced city renders: towers visible (instance ids of
        flattened PI instances), ground below, finite color."""
        st = scenes.city_stress(num_buildings=16, tess=2, num_protos=2)
        d = RenderDelegate(RenderConfig(width=96, height=64))
        d.populate(st)
        scene = d.sync()
        from vri_tpu.passes import FrameParams, render_frame

        fp = FrameParams.from_camera(d.camera, 64)
        aovs = render_frame(scene, fp, height=64, width=96,
                            backend="brute")
        inst = np.asarray(aovs["instance_id"])
        c = np.asarray(aovs["color"])
        assert np.isfinite(c).all()
        hit = inst >= 0
        assert hit.mean() > 0.3            # city + ground fill the view
        assert len(np.unique(inst[hit])) > 5   # many distinct instances

    def test_exceeds_reference_draw_item_ceiling(self):
        """>4096 instances sync and pack — the reference's bindless
        tables hard-cap at 4096 draw items."""
        st = scenes.city_stress(num_buildings=4200, tess=1, num_protos=4)
        lim = SceneLimits(max_instances=8192, max_vertices=1 << 21,
                          max_faces=1 << 21)
        d = RenderDelegate(RenderConfig(width=64, height=64, limits=lim))
        d.populate(st)
        scene = d.sync()
        assert int(scene.num_instances) > 4096
        assert int(scene.num_faces) > 4200 * 12

    def test_limits_overflow_is_structured(self):
        """Exceeding the scene caps raises a structured error naming the
        pool, not a silent truncation or a shape crash."""
        st = scenes.city_stress(num_buildings=96, tess=4, num_protos=4)
        lim = SceneLimits(max_faces=1 << 12, max_vertices=1 << 12)
        d = RenderDelegate(RenderConfig(width=64, height=64, limits=lim))
        d.populate(st)
        with pytest.raises(ValueError, match="exceeds limits"):
            d.sync()

    def test_sdf_build_past_atlas_capacity_counted(self):
        """A brick demand far above max_bricks degrades gracefully:
        overflow counted on the cascades, build still usable."""
        import jax.numpy as jnp

        from vri_tpu.ops import sdf, sdf_build
        from vri_tpu.registry import bake_world

        st = scenes.city_stress(num_buildings=64, tess=2, num_protos=4)
        d = RenderDelegate(RenderConfig(width=64, height=64))
        d.populate(st)
        scene = d.sync()
        world = bake_world(scene)
        cfg = SDFConfig(num_cascades=2, cascade_resolution=32,
                        base_voxel_size=0.5, max_bricks=256,
                        truncation_voxels=2.0, max_triangles_per_brick=8,
                        march_max_steps=32)
        centers = sdf.default_centers(cfg, jnp.zeros(3))
        cas, state = sdf_build.build_for_scene(scene, world, centers, cfg)
        assert int(cas.overflow) > 0       # demand > 256 bricks: counted
        assert int(cas.num_bricks) <= cfg.max_bricks
        assert np.isfinite(np.asarray(cas.brick_albedo)).all()
