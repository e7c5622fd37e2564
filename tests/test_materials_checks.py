"""MaterialX standard_surface network resolution + scene validation."""

import numpy as np
import pytest

from vri_tpu.config import RenderConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.runtime import checks
from vri_tpu.usd import Stage, scenes


MTLX_STAGE = '''#usda 1.0
def Xform "World" {
    def Mesh "Quad" {
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [0, 1, 2, 3]
        point3f[] points = [(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)]
        rel material:binding = </World/Mtlx>
    }
    def Material "Mtlx" {
        token outputs:mtlx:surface.connect = </World/Mtlx/SS.outputs:out>
        def Shader "SS" {
            uniform token info:id = "ND_standard_surface_surfaceshader"
            color3f inputs:base_color = (0.9, 0.1, 0.2)
            color3f inputs:emission_color = (1, 2, 3)
            float inputs:specular_roughness = 0.33
            float inputs:metalness = 0.6
        }
    }
    def Camera "Cam" {
        float3 vri:eye = (0, 0, 3)
        float3 vri:target = (0, 0, 0)
    }
}
'''


class TestMaterialX:
    def test_standard_surface_resolution(self):
        stage = Stage.from_string(MTLX_STAGE)
        from vri_tpu.hydra.material import sync_material

        mat = stage.prim_at_path("/World/Mtlx")
        desc = sync_material(stage, mat, 64)
        np.testing.assert_allclose(desc.base_color, [0.9, 0.1, 0.2])
        np.testing.assert_allclose(desc.emissive, [1, 2, 3])
        assert abs(desc.roughness - 0.33) < 1e-6
        assert abs(desc.metallic - 0.6) < 1e-6

    def test_renders_with_mtlx_binding(self):
        d = RenderDelegate(RenderConfig(width=32, height=32))
        d.populate(Stage.from_string(MTLX_STAGE))
        scene = d.sync()
        base = np.asarray(scene.mat_base_color)
        mat_id = int(scene.instance_material[0])
        np.testing.assert_allclose(base[mat_id], [0.9, 0.1, 0.2], atol=1e-6)


class TestValidation:
    def test_clean_scene_no_errors(self):
        d = RenderDelegate(RenderConfig(width=16, height=16))
        d.populate(scenes.cornell_box())
        scene = d.sync()
        findings = checks.validate_scene(scene)
        assert not [f for f in findings if f.severity == "error"]

    def test_detects_nan_positions(self):
        d = RenderDelegate(RenderConfig(width=16, height=16))
        d.populate(scenes.cornell_box())
        scene = d.sync()
        bad = scene.replace(positions=scene.positions.at[0, 0].set(
            float("nan")))
        findings = checks.validate_scene(bad)
        assert any("non-finite vertex" in f.message for f in findings)
        with pytest.raises(checks.SceneValidationError):
            checks.validate_scene(bad, raise_on_error=True)

    def test_detects_bad_indices(self):
        d = RenderDelegate(RenderConfig(width=16, height=16))
        d.populate(scenes.cornell_box())
        scene = d.sync()
        bad = scene.replace(
            tri_vertices=scene.tri_vertices.at[0, 0].set(10 ** 6))
        findings = checks.validate_scene(bad)
        assert any("out of range" in f.message for f in findings)

    def test_warns_no_lights(self):
        d = RenderDelegate(RenderConfig(width=16, height=16))
        d.populate(Stage.from_string(MTLX_STAGE))
        scene = d.sync()
        findings = checks.validate_scene(scene)
        assert any("no lights" in f.message for f in findings)
