"""CPU-reference render path (BASELINE config 1): primary rays + direct
shading on the Cornell box, golden + structural checks."""

import os

import numpy as np
import pytest

from vri_tpu.config import DebugMode, RenderConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.passes import FrameParams, render_frame
from vri_tpu.usd import Stage, scenes

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")


def render_cornell(res=64, mode=DebugMode.NONE, shadows=True):
    d = RenderDelegate(RenderConfig(width=res, height=res))
    d.populate(scenes.cornell_box())
    scene = d.sync()
    aovs = render_frame(scene, FrameParams.from_camera(d.camera),
                        height=res, width=res, mode=mode, shadows=shadows)
    return {k: np.asarray(v) for k, v in aovs.items()}


@pytest.fixture(scope="module")
def cornell_aovs():
    return render_cornell(64)


class TestCornellStructure:
    def test_full_coverage(self, cornell_aovs):
        # closed box: every primary ray hits something
        assert (cornell_aovs["instance_id"] >= 0).mean() > 0.999

    def test_wall_colors(self, cornell_aovs):
        c = cornell_aovs["color"]
        left, right = c[32, 2], c[32, 61]
        assert left[0] > 2.5 * left[1], left      # red dominates
        assert right[1] > 2.0 * right[0], right   # green dominates

    def test_emissive_light_brightest(self, cornell_aovs):
        c = cornell_aovs["color"]
        lum = c.sum(-1)
        ly, lx = np.unravel_index(lum.argmax(), lum.shape)
        # brightest pixel is on the ceiling light quad
        assert ly < 12, (ly, lx)

    def test_depth_monotonic_into_scene(self, cornell_aovs):
        z = cornell_aovs["depth"]
        # back wall farther than the short box front
        assert z[32, 32] > 2.0
        assert np.isfinite(z[(cornell_aovs["instance_id"] >= 0)]).all()

    def test_shadowing_darkens(self):
        lit = render_cornell(48, shadows=False)["color"]
        shd = render_cornell(48, shadows=True)["color"]
        assert shd.sum() < lit.sum() * 0.98
        # no pixel got brighter from shadowing
        assert (shd <= lit + 1e-5).all()

    def test_normals_unit_and_facing(self, cornell_aovs):
        n = cornell_aovs["normal"]
        valid = cornell_aovs["instance_id"] >= 0
        norms = np.linalg.norm(n[valid], axis=-1)
        np.testing.assert_allclose(norms, 1.0, atol=1e-4)
        # floor pixels have +y normals
        assert n[60, 32, 1] > 0.9


class TestDebugModes:
    @pytest.mark.parametrize("mode", [DebugMode.MESH_ID, DebugMode.PRIM_ID,
                                      DebugMode.DEPTH, DebugMode.ALBEDO,
                                      DebugMode.NORMAL,
                                      DebugMode.BARYCENTRIC])
    def test_modes_render(self, mode):
        aovs = render_cornell(32, mode=mode)
        c = aovs["color"]
        assert np.isfinite(c).all()
        assert c.max() > 0.0

    def test_mesh_id_distinct_walls(self):
        aovs = render_cornell(48, mode=DebugMode.MESH_ID)
        c = aovs["color"]
        assert not np.allclose(c[24, 2], c[24, 45])  # left vs right wall


class TestGolden:
    def test_cornell_golden(self, cornell_aovs):
        """Bitwise-stable-ish golden: committed from the CPU path; compared
        with loose tolerance so TPU float differences pass."""
        path = os.path.join(GOLDEN_DIR, "cornell_64.npz")
        if not os.path.exists(path):
            os.makedirs(GOLDEN_DIR, exist_ok=True)
            np.savez_compressed(path, color=cornell_aovs["color"],
                                depth=cornell_aovs["depth"],
                                instance_id=cornell_aovs["instance_id"])
            pytest.skip("golden written; rerun to compare")
        g = np.load(path)
        np.testing.assert_allclose(cornell_aovs["color"], g["color"],
                                   atol=2e-2, rtol=1e-2)
        assert (cornell_aovs["instance_id"] == g["instance_id"]).mean() > 0.995


class TestTextureSampling:
    def test_textured_quad(self, tmp_path):
        # author a quad with a 4-quadrant texture and check uv orientation
        from PIL import Image

        tex = np.zeros((64, 64, 3), np.uint8)
        tex[:32, :32] = (255, 0, 0)      # top-left (v=1, u=0)
        tex[:32, 32:] = (0, 255, 0)      # top-right (v=1, u=1)
        tex[32:, :32] = (0, 0, 255)      # bottom-left (v=0, u=0)
        tex[32:, 32:] = (255, 255, 0)    # bottom-right
        tex_path = tmp_path / "quad.png"
        Image.fromarray(tex).save(tex_path)

        text = f'''#usda 1.0
(
    defaultPrim = "World"
)
def Xform "World" {{
    def Mesh "Quad" {{
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [0, 1, 2, 3]
        point3f[] points = [(-1, -1, 0), (1, -1, 0), (1, 1, 0), (-1, 1, 0)]
        texCoord2f[] primvars:st = [(0, 0), (1, 0), (1, 1), (0, 1)] (interpolation = "faceVarying")
        rel material:binding = </World/Mat>
    }}
    def Material "Mat" {{
        token outputs:surface.connect = </World/Mat/S.outputs:surface>
        def Shader "S" {{
            uniform token info:id = "UsdPreviewSurface"
            color3f inputs:diffuseColor.connect = </World/Mat/T.outputs:rgb>
            color3f inputs:diffuseColor = (1, 1, 1)
        }}
        def Shader "T" {{
            uniform token info:id = "UsdUVTexture"
            asset inputs:file = @{tex_path}@
        }}
    }}
    def Camera "Cam" {{
        float3 vri:eye = (0, 0, 3)
        float3 vri:target = (0, 0, 0)
        float vri:fovDegrees = 45
    }}
}}
'''
        stage = Stage.from_string(text)
        d = RenderDelegate(RenderConfig(width=64, height=64))
        d.populate(stage)
        scene = d.sync()
        aovs = render_frame(scene, FrameParams.from_camera(d.camera),
                            height=64, width=64, mode=DebugMode.ALBEDO)
        c = np.asarray(aovs["color"])
        # screen top-left of the quad has uv ~ (0,1) -> texture top-left = red
        assert c[16, 16, 0] > 0.5 and c[16, 16, 1] < 0.3, c[16, 16]
        # screen bottom-left -> uv (0,0) -> texture bottom-left = blue
        assert c[48, 16, 2] > 0.5 and c[48, 16, 0] < 0.3, c[48, 16]
        # screen top-right -> uv (1,1) -> green
        assert c[16, 48, 1] > 0.5 and c[16, 48, 2] < 0.3, c[16, 48]


class TestOrthographic:
    def test_ortho_camera_renders(self):
        """Orthographic projection: parallel rays, no perspective scaling."""
        from vri_tpu.hydra.camera import make_ortho_camera

        d = RenderDelegate(RenderConfig(width=64, height=64))
        d.populate(scenes.cornell_box())
        scene = d.sync()
        cam = make_ortho_camera(eye=(0, 0, 3.6), target=(0, 0, 0),
                                half_height=1.0, aspect=1.0)
        aovs = render_frame(scene, FrameParams.from_camera(cam), height=64,
                            width=64, shadows=False, backend="brute")
        inst = np.asarray(aovs["instance_id"])
        assert (inst >= 0).mean() > 0.95   # box fills the ortho frustum
        # ortho: the back wall occupies the full frame edge-to-edge (no
        # vanishing-point shrink): left/right columns are the side walls
        z = np.asarray(aovs["depth"])
        # depth varies across the frame (walls nearer at edges? no — rays
        # parallel: side walls and back wall hits differ)
        assert np.isfinite(z[inst >= 0]).all()

    def test_ortho_rays_are_parallel(self):
        from vri_tpu.hydra.camera import make_ortho_camera
        from vri_tpu.ops import raygen
        import jax.numpy as jnp

        cam = make_ortho_camera(eye=(0, 0, 5), target=(0, 0, 0),
                                half_height=2.0, aspect=1.0)
        o, dd = raygen.camera_rays(jnp.asarray(cam.inv_view_proj),
                                   jnp.asarray(cam.eye), 16, 16)
        dn = np.asarray(dd).reshape(-1, 3)
        np.testing.assert_allclose(dn, np.broadcast_to(dn[0], dn.shape), atol=1e-4)
        on = np.asarray(o).reshape(-1, 3)
        # origins spread across the near plane, not collapsed at the eye
        assert np.ptp(on[:, 0]) > 3.0
