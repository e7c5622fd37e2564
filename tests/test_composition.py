"""USD composition arcs (subLayers / references / payloads) + UsdLux
standard light placement.

The reference gets composition + UsdLux from full OpenUSD
(CMakeLists.txt:25-37); these tests pin the USD-lite equivalents on
externally-authored multi-file stages: opinion strength, defaultPrim
resolution, asset re-anchoring across layers, light xform placement and
DomeLight -> sky.
"""

import os

import numpy as np
import pytest

from vri_tpu.config import RenderConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.usd.stage import Stage

CHAIR = '''#usda 1.0
(
    defaultPrim = "Chair"
)
def Xform "Chair"
{
    def Mesh "Seat"
    {
        point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
        int[] faceVertexCounts = [3]
        int[] faceVertexIndices = [0,1,2]
        rel material:binding = </Chair/Mat>
    }
    def Material "Mat"
    {
        def Shader "s"
        {
            uniform token info:id = "UsdPreviewSurface"
            color3f inputs:diffuseColor = (0.2, 0.4, 0.6)
        }
    }
}
'''

LIGHTS = '''#usda 1.0
def SphereLight "Sun"
{
    float inputs:intensity = 5
    double3 xformOp:translate = (1, 8, 2)
    uniform token[] xformOpOrder = ["xformOp:translate"]
}
def DomeLight "Sky"
{
    color3f inputs:color = (0.1, 0.2, 0.4)
    float inputs:intensity = 2
}
over "World"
{
    over "Chair1"
    {
        double3 xformOp:translate = (9, 9, 9)
    }
}
'''

ROOT = '''#usda 1.0
(
    subLayers = [@lights.usda@]
    defaultPrim = "World"
)
def Xform "World"
{
    def Xform "Chair1" (
        references = @assets/chair.usda@
    )
    {
        double3 xformOp:translate = (2, 0, 0)
        uniform token[] xformOpOrder = ["xformOp:translate"]
    }
    def Xform "Chair2" (
        prepend references = @assets/chair.usda@</Chair>
    )
    {
    }
}
'''


@pytest.fixture(scope="module")
def composed(tmp_path_factory):
    d = tmp_path_factory.mktemp("stage")
    (d / "assets").mkdir()
    (d / "assets" / "chair.usda").write_text(CHAIR)
    (d / "lights.usda").write_text(LIGHTS)
    (d / "root.usda").write_text(ROOT)
    return Stage.open(str(d / "root.usda")), str(d)


class TestComposition:
    def test_reference_grafts_default_prim(self, composed):
        st, _ = composed
        seat = st.prim_at_path("/World/Chair1/Seat")
        assert seat is not None and seat.type_name == "Mesh"
        assert st.prim_at_path("/World/Chair2/Seat") is not None

    def test_local_opinion_beats_sublayer(self, composed):
        st, _ = composed
        c1 = st.prim_at_path("/World/Chair1")
        assert tuple(np.asarray(c1.get("xformOp:translate")).tolist()) \
            == (2.0, 0.0, 0.0)

    def test_sublayer_prims_compose_in(self, composed):
        st, _ = composed
        sun = st.prim_at_path("/Sun")
        assert sun is not None and sun.type_name == "SphereLight"

    def test_world_transform_through_graft(self, composed):
        st, _ = composed
        seat = st.prim_at_path("/World/Chair1/Seat")
        assert np.allclose(st.world_transform(seat)[:3, 3], [2, 0, 0])

    def test_full_pipeline_renders_composed_stage(self, composed):
        st, _ = composed
        d = RenderDelegate(RenderConfig(width=32, height=32))
        d.populate(st)
        scene = d.sync()
        assert int(scene.num_instances) == 2
        assert int(scene.num_faces) == 2
        # material flowed through the graft
        base = np.asarray(scene.mat_base_color)[
            np.asarray(scene.instance_material)[0]]
        assert np.allclose(base, (0.2, 0.4, 0.6), atol=1e-5)


class TestStandardLights:
    def test_spherelight_sits_at_xform_origin(self, composed):
        st, _ = composed
        d = RenderDelegate(RenderConfig(width=32, height=32))
        d.populate(st)
        scene = d.sync()
        n = int(scene.num_lights)
        pos = np.asarray(scene.light_position)[:n]
        assert any(np.allclose(p, (1, 8, 2)) for p in pos), pos

    def test_domelight_becomes_sky(self, composed):
        st, _ = composed
        d = RenderDelegate(RenderConfig(width=32, height=32))
        d.populate(st)
        scene = d.sync()
        assert np.allclose(np.asarray(scene.sky_color), (0.2, 0.4, 0.8),
                           atol=1e-5)   # color * intensity 2
        # the dome is not a shadow-marched light slot
        assert int(scene.num_lights) == 1


VARIANT_STAGE = '''#usda 1.0
def Xform "Robot" (
    variants = {
        string look = "red"
    }
)
{
    double3 xformOp:translate = (1, 0, 0)
    uniform token[] xformOpOrder = ["xformOp:translate"]
    variantSet "look" = {
        "red" {
            color3f primvars:displayColor = (1, 0, 0)
            def Mesh "Extra"
            {
                point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
                int[] faceVertexCounts = [3]
                int[] faceVertexIndices = [0,1,2]
            }
        }
        "blue" {
            color3f primvars:displayColor = (0, 0, 1)
        }
    }
}
def Xform "NoSelection"
{
    variantSet "look" = {
        "a" {
            color3f primvars:displayColor = (0, 1, 0)
        }
    }
}
'''


class TestVariants:
    def test_selected_variant_composes(self):
        from vri_tpu.usd.stage import Stage

        st = Stage.from_string(VARIANT_STAGE)
        robot = st.prim_at_path("/Robot")
        assert tuple(np.asarray(
            robot.get("primvars:displayColor")).tolist()) == (1.0, 0.0, 0.0)
        # variant-authored child prim grafts in
        assert st.prim_at_path("/Robot/Extra") is not None
        # local opinions stay stronger than variant opinions
        assert tuple(np.asarray(
            robot.get("xformOp:translate")).tolist()) == (1.0, 0.0, 0.0)

    def test_no_selection_no_opinions(self):
        from vri_tpu.usd.stage import Stage

        st = Stage.from_string(VARIANT_STAGE)
        ns = st.prim_at_path("/NoSelection")
        assert ns.get("primvars:displayColor") is None

    def test_roundtrip_preserves_variants(self):
        from vri_tpu.usd.stage import Stage
        from vri_tpu.usd import usda

        root, meta = usda.parse_usda(VARIANT_STAGE)
        text = usda.write_usda(root, meta)
        st = Stage.from_string(text)
        assert tuple(np.asarray(st.prim_at_path("/Robot")
                     .get("primvars:displayColor")).tolist()) == (1, 0, 0)


class TestCompositionRobustness:
    def test_cyclic_reference_hits_depth_limit(self, tmp_path):
        from vri_tpu.usd import usda

        (tmp_path / "a.usda").write_text(
            '#usda 1.0\ndef Xform "A" (references = @b.usda@</B>) {\n}\n')
        (tmp_path / "b.usda").write_text(
            '#usda 1.0\ndef Xform "B" (references = @a.usda@</A>) {\n}\n')
        with pytest.raises(usda.UsdaError, match="depth"):
            Stage.open(str(tmp_path / "a.usda"))

    def test_missing_referenced_asset_is_tolerated(self, tmp_path):
        (tmp_path / "root.usda").write_text(
            '#usda 1.0\ndef Xform "A" (references = @gone.usda@</X>) {\n'
            '    double3 xformOp:translate = (1, 2, 3)\n}\n')
        st = Stage.open(str(tmp_path / "root.usda"))
        a = st.prim_at_path("/A")
        assert a is not None            # local opinions survive
        assert tuple(np.asarray(a.get("xformOp:translate")).tolist()) \
            == (1.0, 2.0, 3.0)

    def test_self_reference_is_ignored(self):
        st = Stage.from_string(
            '#usda 1.0\ndef Xform "A" (references = </A>) {\n'
            '    double3 xformOp:translate = (1, 0, 0)\n}\n')
        assert st.prim_at_path("/A") is not None

    def test_internal_reference(self):
        st = Stage.from_string('''#usda 1.0
def Xform "Proto"
{
    def Mesh "M"
    {
        point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
        int[] faceVertexCounts = [3]
        int[] faceVertexIndices = [0,1,2]
    }
}
def Xform "Copy" (
    references = </Proto>
)
{
    double3 xformOp:translate = (5, 0, 0)
    uniform token[] xformOpOrder = ["xformOp:translate"]
}
''')
        m = st.prim_at_path("/Copy/M")
        assert m is not None and m.type_name == "Mesh"
        assert np.allclose(st.world_transform(m)[:3, 3], [5, 0, 0])


class TestClassArcs:
    """inherits / specializes (class-prim arcs; the I and S in LIVRPS)."""

    def test_inherits_from_class_prim(self):
        st = Stage.from_string('''#usda 1.0
class Xform "_base"
{
    double radius = 7
    def Mesh "Part"
    {
        int[] faceVertexCounts = [3]
    }
}
def Xform "A" (
    prepend inherits = </_base>
)
{
}
def Xform "B" (
    inherits = </_base>
)
{
    double radius = 2
}
''')
        a = st.prim_at_path("/A")
        assert float(a.get("radius")) == 7.0
        assert st.prim_at_path("/A/Part").type_name == "Mesh"
        # local opinion stays stronger than the inherit
        assert float(st.prim_at_path("/B").get("radius")) == 2.0

    def test_inherits_stronger_than_reference(self):
        st = Stage.from_string('''#usda 1.0
class "_cls"
{
    double v = 1
}
def Xform "Src"
{
    double v = 2
    double only_ref = 9
}
def Xform "A" (
    inherits = </_cls>
    references = </Src>
)
{
}
''')
        a = st.prim_at_path("/A")
        assert float(a.get("v")) == 1.0          # inherit beats reference
        assert float(a.get("only_ref")) == 9.0   # reference still fills gaps

    def test_specializes_is_weakest(self):
        st = Stage.from_string('''#usda 1.0
class "_spec"
{
    double v = 5
    double only_spec = 3
}
def Xform "Src"
{
    double v = 2
}
def Xform "A" (
    specializes = </_spec>
    references = </Src>
)
{
}
''')
        a = st.prim_at_path("/A")
        assert float(a.get("v")) == 2.0          # reference beats specialize
        assert float(a.get("only_spec")) == 3.0  # specialize fills the rest

    def test_abstract_prims_do_not_image(self):
        st = Stage.from_string('''#usda 1.0
class Mesh "_template"
{
    point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0,1,2]
}
def Mesh "real"
{
    point3f[] points = [(0,0,0), (1,0,0), (0,1,0)]
    int[] faceVertexCounts = [3]
    int[] faceVertexIndices = [0,1,2]
}
''')
        names = [p.name for p in st.prims_of_type("Mesh")]
        assert names == ["real"]
        # ... but the class prim is still addressable as an arc target
        assert st.prim_at_path("/_template") is not None
