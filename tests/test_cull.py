"""USD doubleSided semantics: backface culling in every visibility path.

The reference renders everything two-sided (VK_CULL_MODE_NONE,
Source/Common.cpp:333) and ignores the authored ``doubleSided`` attribute;
we follow the USD spec instead — meshes default to single-sided and
backfaces cull.  These tests pin:
  * authored doubleSided / orientation parse + sync (delegate)
  * front/back visibility agreement across raster kernels and brute
  * mirrored (negative-determinant) instance transforms flip the test
  * two-sided meshes render from both sides
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vri_tpu.config import RenderConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.ops import intersect, rasterize, raygen
from vri_tpu.passes import frame as frame_mod
from vri_tpu.registry import bake_world
from vri_tpu.hydra import camera as camera_mod
from vri_tpu.usd.stage import Stage


def _quad_stage(double_sided=None, orientation=None, transform=None):
    """One unit quad at z=-5 facing +z (CCW seen from origin), camera
    at the origin looking down -z."""
    ds = "" if double_sided is None else \
        f"    bool doubleSided = {'true' if double_sided else 'false'}\n"
    orient = "" if orientation is None else \
        f'    uniform token orientation = "{orientation}"\n'
    xf = ""
    if transform is not None:
        rows = ", ".join(
            "(" + ", ".join(str(float(v)) for v in row) + ")"
            for row in np.asarray(transform).T)  # row-vector convention
        xf = (f"    matrix4d xformOp:transform = ( {rows} )\n"
              '    uniform token[] xformOpOrder = ["xformOp:transform"]\n')
    # CCW as seen from +z (the camera side)
    idx = "[0, 1, 2, 3]" if orientation != "leftHanded" else "[0, 3, 2, 1]"
    txt = f"""#usda 1.0
def Mesh "quad" {{
{ds}{orient}{xf}    point3f[] points = [(-1, -1, -5), (1, -1, -5), (1, 1, -5), (-1, 1, -5)]
    int[] faceVertexCounts = [4]
    int[] faceVertexIndices = {idx}
    float3[] extent = [(-1, -1, -5), (1, 1, -5)]
}}
def Camera "cam" {{
    float focalLength = 35
}}
"""
    return Stage.from_string(txt)


def _scene(stage, res=32, **cfg):
    d = RenderDelegate(RenderConfig(width=res, height=res, **cfg))
    d.populate(stage)
    return d.sync()


def _coverage(stage, res, backend, eye, target):
    scene = _scene(stage, res)
    cam = camera_mod.make_camera(eye, target, 60.0, 1.0)
    world = bake_world(scene)
    cs = frame_mod._cull_sign(scene)
    vp = jnp.asarray(cam.view_proj)
    if backend == "brute":
        o, dirs = raygen.camera_rays(jnp.asarray(cam.inv_view_proj),
                                     jnp.asarray(cam.eye), res, res)
        v0, e1, e2 = intersect.gather_triangles(world, scene.tri_vertices)
        hit = intersect.trace_brute(o.reshape(-1, 3), dirs.reshape(-1, 3),
                                    v0, e1, e2, scene.num_faces,
                                    cull_sign=cs)
        return int(np.sum(np.asarray(hit.tri) >= 0))
    fn = {"ranged": rasterize.rasterize,
          "binned": rasterize.rasterize_binned,
          "sorted": rasterize.rasterize_sorted}[backend]
    hit, _ = fn(world, scene.tri_vertices, scene.num_faces, vp,
                height=res, width=res, cull_sign=cs)
    return int(np.sum(np.asarray(hit.tri) >= 0))


BACKENDS = ["ranged", "binned", "sorted", "brute"]
FRONT = ([0.0, 0.0, 0.0], [0.0, 0.0, -5.0])     # camera side of the quad
BACK = ([0.0, 0.0, -10.0], [0.0, 0.0, -5.0])    # behind the quad


class TestSingleSided:
    @pytest.mark.parametrize("backend", BACKENDS)
    def test_front_visible_back_culled(self, backend):
        stage = _quad_stage()                    # default: single-sided
        front = _coverage(stage, 32, backend, *FRONT)
        back = _coverage(stage, 32, backend, *BACK)
        assert front > 50
        assert back == 0

    @pytest.mark.parametrize("backend", BACKENDS)
    def test_double_sided_visible_both(self, backend):
        stage = _quad_stage(double_sided=True)
        assert _coverage(stage, 32, backend, *FRONT) > 50
        assert _coverage(stage, 32, backend, *BACK) > 50

    def test_left_handed_orientation_flips_winding(self):
        # leftHanded + reversed index order = the same front face
        stage = _quad_stage(orientation="leftHanded")
        assert _coverage(stage, 32, "sorted", *FRONT) > 50
        assert _coverage(stage, 32, "sorted", *BACK) == 0

    def test_mirrored_transform_flips_cull(self):
        # x-mirror (det < 0) turns the CCW front into a CW front; the
        # cull sign must follow or the quad vanishes from the front
        mir = np.diag([-1.0, 1.0, 1.0, 1.0]).astype(np.float32)
        stage = _quad_stage(transform=mir)
        assert _coverage(stage, 32, "sorted", *FRONT) > 50
        assert _coverage(stage, 32, "sorted", *BACK) == 0

    def test_force_double_sided_config(self):
        scene = _scene(_quad_stage(), force_double_sided=True)
        assert scene.instance_double_sided is not None
        assert bool(np.asarray(scene.instance_double_sided)[0])

    def test_cull_sign_values(self):
        scene = _scene(_quad_stage())
        cs = np.asarray(frame_mod._cull_sign(scene))
        nf = int(np.asarray(scene.num_faces))
        assert np.all(cs[:nf] == 1.0)
        scene_ds = _scene(_quad_stage(double_sided=True))
        cs = np.asarray(frame_mod._cull_sign(scene_ds))
        assert np.all(cs[:nf] == 0.0)


class TestCullParity:
    """Culled raster and culled brute agree on a scene mixing facing."""

    def test_mixed_scene_raster_vs_brute(self):
        from vri_tpu.usd import scenes as sc
        stage = sc.cornell_box()
        res = 48
        d = RenderDelegate(RenderConfig(width=res, height=res))
        d.populate(stage)
        scene = d.sync()
        world = bake_world(scene)
        cs = frame_mod._cull_sign(scene)
        vp = jnp.asarray(d.camera.view_proj)
        hit_r, _ = rasterize.rasterize(world, scene.tri_vertices,
                                       scene.num_faces, vp,
                                       height=res, width=res, cull_sign=cs)
        o, dirs = raygen.camera_rays(jnp.asarray(d.camera.inv_view_proj),
                                     jnp.asarray(d.camera.eye), res, res)
        v0, e1, e2 = intersect.gather_triangles(world, scene.tri_vertices)
        hit_b = intersect.trace_brute(o.reshape(-1, 3), dirs.reshape(-1, 3),
                                      v0, e1, e2, scene.num_faces,
                                      cull_sign=cs)
        tr, tb = np.asarray(hit_r.tri), np.asarray(hit_b.tri)
        assert ((tr >= 0) == (tb >= 0)).mean() > 0.995
        both = (tr >= 0) & (tb >= 0)
        assert (tr[both] == tb[both]).mean() > 0.97


def _multi_instance_scene(res=64):
    """Three small meshes: two in front of the camera, one far behind
    (frustum-culled).  Camera at origin looking down -z."""
    from vri_tpu.registry import ResourceRegistry, MeshRecord

    def tri_mesh(path, center, n=4):
        pts, tris = [], []
        for i in range(n):
            base = len(pts)
            o = np.array(center) + np.array([i * 0.3, 0, 0])
            pts += [o + [0, 0, 0], o + [0.2, 0, 0], o + [0, 0.2, 0]]
            tris.append([base, base + 1, base + 2])
        pts = np.array(pts, np.float32)
        tris = np.array(tris, np.int32)
        ext = np.stack([pts.min(0), pts.max(0)])
        return MeshRecord(path=path, points=pts, tris=tris,
                          tri_face=np.arange(len(tris), dtype=np.int32),
                          uvs=np.zeros((len(tris), 3, 2), np.float32),
                          transform=np.eye(4, dtype=np.float32),
                          material_path=None, extent=ext)

    reg = ResourceRegistry(RenderConfig(width=res, height=res))
    reg.push_mesh(tri_mesh("/a", [-0.5, -0.1, -3]))
    reg.push_mesh(tri_mesh("/b", [0, 0, 50]))      # behind the camera
    reg.push_mesh(tri_mesh("/c", [0.2, 0.1, -2.5]))
    scene = reg.commit()
    cam = camera_mod.make_camera(np.array([0, 0, 0.]),
                                 np.array([0, 0, -1.]), 60.0, 1.0)
    return scene, cam


class TestInstanceFrustumCompaction:
    """Per-instance frustum culling + slot compaction before raster prep
    (the pool-proportional-prep fix; reference analog: off-frustum draw
    items die in hardware clipping after the per-draw loop,
    Source/RenderPass.cpp:642-664)."""

    def test_compacted_matches_full_exactly(self):
        res = 64
        scene, cam = _multi_instance_scene(res)
        fp = frame_mod.FrameParams.from_camera(cam, height=res)
        world = bake_world(scene)
        h_full = frame_mod._visibility_raster(scene, world, fp, res, res,
                                              cull_instances=False)
        h_cull = frame_mod._visibility_raster(scene, world, fp, res, res,
                                              cull_instances=True)
        # the culled path must be EXACT vs the same (sorted) tier on the
        # full pool: original ids, depths, barycentrics
        cs = frame_mod._cull_sign(scene)
        h_sorted, _ = rasterize.rasterize_sorted(
            world, scene.tri_vertices, scene.num_faces,
            jnp.asarray(cam.view_proj), height=res, width=res,
            cull_sign=cs)
        np.testing.assert_array_equal(np.asarray(h_cull.tri),
                                      np.asarray(h_sorted.tri))
        np.testing.assert_array_equal(np.asarray(h_cull.u),
                                      np.asarray(h_sorted.u))
        assert int(h_cull.overflow) == 0
        # and hits must exist (the visible instances survived the cull)
        assert (np.asarray(h_cull.tri) >= 0).sum() > 0
        del h_full

    def test_compaction_drops_culled_instances(self):
        res = 64
        scene, cam = _multi_instance_scene(res)
        fp = frame_mod.FrameParams.from_camera(cam, height=res)
        ids, live, sid, over = frame_mod._compact_visible_faces(
            scene, fp.view_proj, scene.tri_vertices.shape[0])
        # instance /b (4 faces) is behind the camera: live < total pool
        assert int(live) == 8            # 2 visible instances x 4 faces
        assert int(over) == 0
        # surviving face ids map to instances 0 and 2 only
        inst = np.asarray(scene.tri_instance)[np.asarray(ids)[:int(live)]]
        assert set(inst.tolist()) == {0, 2}

    def test_compaction_overflow_counted(self):
        res = 64
        scene, cam = _multi_instance_scene(res)
        fp = frame_mod.FrameParams.from_camera(cam, height=res)
        ids, live, sid, over = frame_mod._compact_visible_faces(
            scene, fp.view_proj, 4)      # cap below the 8 live faces
        assert int(over) == 4
        assert int(live) == 4


class TestBf16CascadeSplit:
    """The XLA-side hi/mid/lo cascade split must survive jit: XLA's
    simplifier folds f32->bf16->f32 convert pairs to identity, which
    zeroes the residual terms and silently degrades the raster kernels
    to plain-bf16 edge precision (round-5 regression; fixed with
    lax.reduce_precision)."""

    def test_residuals_survive_jit(self):
        rng = np.random.default_rng(0)
        chunks = jnp.asarray(rng.standard_normal((2, 8, 24)), jnp.float32)
        eager = np.asarray(rasterize._bf16_split_rows(chunks), np.float32)
        jitted = np.asarray(jax.jit(rasterize._bf16_split_rows)(chunks),
                            np.float32)
        np.testing.assert_array_equal(eager, jitted)
        # mid rows (2:4) must be nonzero for generic f32 inputs
        assert np.abs(jitted[:, 2:4]).max() > 0

    def test_cascade_reconstructs_f32(self):
        rng = np.random.default_rng(1)
        x = jnp.asarray(rng.standard_normal((4, 2, 16)) * 100, jnp.float32)

        def recon(x):
            hi, mid, lo = rasterize._bf16_cascade_terms(x)
            return hi + mid + lo

        err = np.abs(np.asarray(jax.jit(recon)(x)) - np.asarray(x))
        rel = err / np.maximum(np.abs(np.asarray(x)), 1e-6)
        assert rel.max() < 2 ** -22
