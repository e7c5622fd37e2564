"""USDA parser/writer and Stage tests (reference behavior: stage open +
prim population, Source/Main.cpp:15-60)."""

import numpy as np

from vri_tpu.usd import parse_usda, write_usda, Stage
from vri_tpu.usd import scenes
from vri_tpu.usd.usda import AssetPath, PrimPathRef
from vri_tpu.usd import usda


SAMPLE = """#usda 1.0
(
    defaultPrim = "World"
    metersPerUnit = 0.01
)

def Xform "World" {
    def Mesh "Quad" (
        kind = "component"
    ) {
        float3[] extent = [(-1, -1, 0), (1, 1, 0)]
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [0, 1, 2, 3]
        point3f[] points = [(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)]
        texCoord2f[] primvars:st = [(0, 0), (1, 0), (1, 1), (0, 1)] (interpolation = "faceVarying")
        rel material:binding = </World/Looks/Mat>
        double3 xformOp:translate = (0, 2, 0)
        uniform token[] xformOpOrder = ["xformOp:translate"]
    }
    def Scope "Looks" {
        def Material "Mat" {
            token outputs:surface.connect = </World/Looks/Mat/S.outputs:surface>
            def Shader "S" {
                uniform token info:id = "UsdPreviewSurface"
                color3f inputs:diffuseColor = (0.2, 0.4, 0.6)
                asset inputs:file = @tex/wood.png@
            }
        }
    }
}
"""


def test_parse_roundtrip():
    root, meta = parse_usda(SAMPLE)
    assert meta["defaultPrim"] == "World"
    assert meta["metersPerUnit"] == 0.01
    world = root.child("World")
    assert world.type_name == "Xform"
    quad = world.child("Quad")
    assert quad.metadata["kind"] == "component"
    pts = quad.get("points")
    assert pts.shape == (4, 3) and pts.dtype == np.float32
    st = quad.attributes["primvars:st"]
    assert st.interpolation == "faceVarying"
    assert st.value.shape == (4, 2)
    rel = quad.attributes["material:binding"].value
    assert isinstance(rel, PrimPathRef) and rel.path == "/World/Looks/Mat"

    # writer round-trips to an equivalent parse
    text2 = write_usda(root, meta)
    root2, meta2 = parse_usda(text2)
    quad2 = root2.child("World").child("Quad")
    np.testing.assert_allclose(quad2.get("points"), pts)
    assert meta2["metersPerUnit"] == 0.01


def test_connections_and_assets():
    root, _ = parse_usda(SAMPLE)
    mat = root.child("World").child("Looks").child("Mat")
    assert mat.attributes["outputs:surface"].connect == \
        "/World/Looks/Mat/S.outputs:surface"
    shader = mat.child("S")
    f = shader.get("inputs:file")
    assert isinstance(f, AssetPath) and f.path == "tex/wood.png"


def test_stage_queries():
    stage = Stage.from_string(SAMPLE)
    quad = stage.prim_at_path("/World/Quad")
    assert quad is not None
    m = stage.world_transform(quad)
    np.testing.assert_allclose(m[:3, 3], [0, 2, 0], atol=1e-6)
    mat = stage.bound_material(quad)
    assert mat is not None and mat.path == "/World/Looks/Mat"


def test_cornell_builder_roundtrip():
    stage = scenes.cornell_box()
    meshes = stage.prims_of_type("Mesh")
    assert len(meshes) == 8  # 5 walls + light + 2 boxes
    # export -> reparse preserves mesh data
    text = stage.export()
    stage2 = Stage.from_string(text)
    for m in meshes:
        m2 = stage2.prim_at_path(m.path)
        assert m2 is not None
        np.testing.assert_allclose(m2.get("points"), m.get("points"), atol=1e-6)
        np.testing.assert_allclose(stage2.world_transform(m2),
                                   stage.world_transform(m), atol=1e-5)
    # left wall is red
    red = stage.bound_material(stage.prim_at_path("/World/LeftWall"))
    assert red.path.endswith("Red")


def test_kitchen_stress_deterministic():
    s1 = scenes.kitchen_stress(num_objects=16)
    s2 = scenes.kitchen_stress(num_objects=16)
    p1 = s1.prim_at_path("/World/Props/Prop0005")
    p2 = s2.prim_at_path("/World/Props/Prop0005")
    np.testing.assert_allclose(s1.world_transform(p1), s2.world_transform(p2))
    assert len(s1.prims_of_type("Mesh")) == 17


def test_animate_marks_changes():
    stage = scenes.animated_stage(num_objects=4)
    before = {p.path: stage.world_transform(p).copy()
              for p in stage.prims_of_type("Mesh")}
    changed = scenes.animate(stage, time=1.0)
    assert changed
    for path in changed:
        after = stage.world_transform(stage.prim_at_path(path))
        assert not np.allclose(before[path], after)


class TestTimeSamples:
    """Authored timeSamples: parse, write, resolve (the reference resolves
    these through UsdImagingDelegate, Source/Main.cpp:41-46)."""

    TEXT = '''#usda 1.0
def Xform "A" {
    float3 xformOp:translate = (0, 0, 0)
    float3 xformOp:translate.timeSamples = {
        0: (0, 0, 0),
        10: (1, 2, 0),
    }
    uniform token[] xformOpOrder = ["xformOp:translate"]
}
'''

    def test_parse_and_resolve(self):
        import numpy as np

        root, _ = usda.parse_usda(self.TEXT)
        a = root.children[0].attributes["xformOp:translate"]
        ts = a.metadata["timeSamples"]
        assert set(ts) == {0.0, 10.0}
        # default (no time): the authored default wins
        np.testing.assert_allclose(np.asarray(a.value_at(None)), 0.0)
        # linear interpolation mid-span, clamped at the ends
        np.testing.assert_allclose(np.asarray(a.value_at(5.0)),
                                   [0.5, 1.0, 0.0])
        np.testing.assert_allclose(np.asarray(a.value_at(99.0)),
                                   [1.0, 2.0, 0.0])

    def test_write_roundtrip(self):
        import numpy as np

        root, meta = usda.parse_usda(self.TEXT)
        text2 = usda.write_usda(root, meta)
        root2, _ = usda.parse_usda(text2)
        a = root2.children[0].attributes["xformOp:translate"]
        ts = a.metadata["timeSamples"]
        assert set(ts) == {0.0, 10.0}
        np.testing.assert_allclose(np.asarray(ts[10.0]), [1, 2, 0])

    def test_world_transform_at_time(self):
        import numpy as np

        from vri_tpu.usd.stage import Stage

        st = Stage.from_string(self.TEXT)
        p = st.prim_at_path("/A")
        np.testing.assert_allclose(st.world_transform(p)[:3, 3], 0.0)
        st.set_time(10.0)
        np.testing.assert_allclose(st.world_transform(p)[:3, 3],
                                   [1, 2, 0])
