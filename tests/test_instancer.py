"""PointInstancer flattening (UsdImagingDelegate-style instance expansion)."""

import numpy as np

from vri_tpu.config import RenderConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.passes import FrameParams, render_frame
from vri_tpu.usd import Stage

PI_STAGE = '''#usda 1.0
def Xform "World" {
    def PointInstancer "PI" {
        rel prototypes = [</World/PI/Protos/Cube>, </World/PI/Protos/Tri>]
        point3f[] positions = [(-2, 0, 0), (0, 0, 0), (2, 0, 0)]
        int[] protoIndices = [0, 1, 0]
        float3[] scales = [(1, 1, 1), (2, 2, 2), (1, 3, 1)]
        quatf[] orientations = [(1, 0, 0, 0), (1, 0, 0, 0), (0.7071, 0, 0.7071, 0)]
        def Scope "Protos" {
            def Mesh "Cube" {
                int[] faceVertexCounts = [4]
                int[] faceVertexIndices = [0, 1, 2, 3]
                point3f[] points = [(-0.5, -0.5, 0), (0.5, -0.5, 0), (0.5, 0.5, 0), (-0.5, 0.5, 0)]
                rel material:binding = </World/Red>
            }
            def Mesh "Tri" {
                int[] faceVertexCounts = [3]
                int[] faceVertexIndices = [0, 1, 2]
                point3f[] points = [(-0.5, -0.5, 0), (0.5, -0.5, 0), (0, 0.5, 0)]
            }
        }
    }
    def Material "Red" {
        token outputs:surface.connect = </World/Red/S.outputs:surface>
        def Shader "S" {
            uniform token info:id = "UsdPreviewSurface"
            color3f inputs:diffuseColor = (1, 0, 0)
        }
    }
    def Camera "Cam" {
        float3 vri:eye = (0, 0, 8)
        float3 vri:target = (0, 0, 0)
        float vri:fovDegrees = 45
    }
}
'''


def test_instancer_expands_to_instances():
    d = RenderDelegate(RenderConfig(width=64, height=64))
    d.populate(Stage.from_string(PI_STAGE))
    scene = d.sync()
    # 3 instances; prototype meshes themselves are not drawn
    assert int(scene.num_instances) == 3
    # quad prototype = 2 tris x2 instances + tri prototype = 1 tri x1
    assert int(scene.num_faces) == 2 + 1 + 2
    # material binding flows from the prototype
    mats = np.asarray(scene.instance_material)[:3]
    assert (mats > 0).sum() == 2  # two cube instances bound to Red


def test_instancer_renders_at_positions():
    d = RenderDelegate(RenderConfig(width=96, height=96))
    d.populate(Stage.from_string(PI_STAGE))
    scene = d.sync()
    aovs = render_frame(scene, FrameParams.from_camera(d.camera),
                        height=96, width=96, shadows=False, backend="brute")
    inst = np.asarray(aovs["instance_id"])
    hit_cols = np.unique(np.where(inst >= 0)[1])
    # three separated blobs: left, center, right thirds all covered
    assert (hit_cols < 32).any() and ((hit_cols >= 32) & (hit_cols < 64)).any() \
        and (hit_cols >= 64).any()
    # scaled center instance (2x tri) is taller than 1 px
    rows_center = np.where(inst[:, 44:52] >= 0)[0]
    assert np.ptp(rows_center) > 10


def test_instancer_transform_scale_rotation():
    d = RenderDelegate(RenderConfig(width=64, height=64))
    d.populate(Stage.from_string(PI_STAGE))
    d.sync()
    rec = d.registry._meshes["/World/PI.inst00002"]
    m = rec.transform
    # 90-degree Y rotation: local +x maps to world -z; scale (1,3,1)
    v = m[:3, :3] @ np.array([1.0, 0, 0])
    np.testing.assert_allclose(v, [0, 0, -1], atol=1e-3)
    v = m[:3, :3] @ np.array([0.0, 1, 0])
    np.testing.assert_allclose(v, [0, 3, 0], atol=1e-3)
    np.testing.assert_allclose(m[:3, 3], [2, 0, 0], atol=1e-6)
