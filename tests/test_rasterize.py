"""Pallas tiled rasterizer vs brute-force ray tracer: same visibility.

(Reference equivalence: raster visibility pass Visibility.hlsl must agree
with ray-traced primary visibility for pinhole cameras.)
"""

import jax.numpy as jnp
import pytest
import numpy as np

from vri_tpu.config import RenderConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.ops import intersect, raygen, rasterize
from vri_tpu.passes import FrameParams, render_frame
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes


def _setup(stage, res=48):
    d = RenderDelegate(RenderConfig(width=res, height=res))
    d.populate(stage)
    return d.sync(), d.camera


def _raster_vs_brute(scene, cam, res, fn=None):
    world = bake_world(scene)
    vp = jnp.asarray(cam.view_proj)
    fn = fn or rasterize.rasterize
    hit_r, zimg = fn(
        world, scene.tri_vertices, scene.num_faces, vp,
        height=res, width=res)
    o, dirs = raygen.camera_rays(jnp.asarray(cam.inv_view_proj),
                                 jnp.asarray(cam.eye), res, res)
    v0, e1, e2 = intersect.gather_triangles(world, scene.tri_vertices)
    hit_b = intersect.trace_brute(o.reshape(-1, 3), dirs.reshape(-1, 3),
                                  v0, e1, e2, scene.num_faces)
    return hit_r, hit_b


RASTER_FNS = [rasterize.rasterize, rasterize.rasterize_binned]


class TestRasterVsTrace:
    @pytest.mark.parametrize("fn", RASTER_FNS)
    def test_cornell_same_triangles(self, cornell, fn):
        res = 48
        scene, cam = _setup(cornell, res)
        hit_r, hit_b = _raster_vs_brute(scene, cam, res, fn)
        tr = np.asarray(hit_r.tri)
        tb = np.asarray(hit_b.tri)
        assert ((tr >= 0) == (tb >= 0)).mean() > 0.995
        both = (tr >= 0) & (tb >= 0)
        assert (tr[both] == tb[both]).mean() > 0.97  # edge ties differ

    def test_cornell_barycentrics_match(self, cornell):
        res = 48
        scene, cam = _setup(cornell, res)
        hit_r, hit_b = _raster_vs_brute(scene, cam, res)
        tr, tb = np.asarray(hit_r.tri), np.asarray(hit_b.tri)
        same = (tr == tb) & (tr >= 0)
        np.testing.assert_allclose(np.asarray(hit_r.u)[same],
                                   np.asarray(hit_b.u)[same], atol=2e-3)
        np.testing.assert_allclose(np.asarray(hit_r.v)[same],
                                   np.asarray(hit_b.v)[same], atol=2e-3)

    @pytest.mark.parametrize("fn", RASTER_FNS)
    def test_kitchen_scene(self, fn):
        res = 64
        scene, cam = _setup(scenes.kitchen_stress(num_objects=24), res)
        hit_r, hit_b = _raster_vs_brute(scene, cam, res, fn)
        tr, tb = np.asarray(hit_r.tri), np.asarray(hit_b.tri)
        assert ((tr >= 0) == (tb >= 0)).mean() > 0.99
        both = (tr >= 0) & (tb >= 0)
        assert (tr[both] == tb[both]).mean() > 0.97

    def test_nonsquare_resolution(self, cornell):
        h, w = 40, 72
        d = RenderDelegate(RenderConfig(width=w, height=h))
        d.populate(cornell)
        scene = d.sync()
        cam = d.camera
        world = bake_world(scene)
        hit_r, z = rasterize.rasterize(
            world, scene.tri_vertices, scene.num_faces,
            jnp.asarray(cam.view_proj), height=h, width=w)
        assert z.shape == (h, w)
        # wide aspect: edge rays exit past the open box front — compare
        # coverage against the ray tracer rather than assuming full hit
        o, dirs = raygen.camera_rays(jnp.asarray(cam.inv_view_proj),
                                     jnp.asarray(cam.eye), h, w)
        v0, e1, e2 = intersect.gather_triangles(world, scene.tri_vertices)
        hit_b = intersect.trace_brute(o.reshape(-1, 3), dirs.reshape(-1, 3),
                                      v0, e1, e2, scene.num_faces)
        cov_r = np.asarray(hit_r.tri) >= 0
        cov_b = np.asarray(hit_b.tri) >= 0
        assert (cov_r == cov_b).mean() > 0.99

    def test_depth_ordering(self, cornell):
        """Short box must occlude the floor behind it."""
        res = 64
        scene, cam = _setup(cornell, res)
        world = bake_world(scene)
        hit_r, z = rasterize.rasterize(
            world, scene.tri_vertices, scene.num_faces,
            jnp.asarray(cam.view_proj), height=res, width=res)
        zi = np.asarray(z)
        # tall-box pixel (32,32) is nearer than the back wall at (40,40)
        assert zi[32, 32] < zi[40, 40]


class TestNearClip:
    def test_camera_inside_scene(self):
        """Camera inside the kitchen room: wall triangles cross the near
        plane and must be clipped, not dropped (the hardware raster the
        reference relies on does this implicitly)."""
        from vri_tpu.hydra.camera import make_camera

        res = 64
        d = RenderDelegate(RenderConfig(width=res, height=res))
        d.populate(scenes.kitchen_stress(num_objects=9))
        scene = d.sync()
        world = bake_world(scene)
        # camera inside the room, near a wall, looking across
        cam = make_camera(eye=(3.0, 1.2, 0.0), target=(-3, 1.0, 0),
                          fov_y_deg=70, aspect=1.0, near=0.05, far=100.0)
        hit_r, z = rasterize.rasterize(
            world, scene.tri_vertices, scene.num_faces,
            jnp.asarray(cam.view_proj), height=res, width=res)
        o, dirs = raygen.camera_rays(jnp.asarray(cam.inv_view_proj),
                                     jnp.asarray(cam.eye), res, res)
        v0, e1, e2 = intersect.gather_triangles(world, scene.tri_vertices)
        hit_b = intersect.trace_brute(o.reshape(-1, 3), dirs.reshape(-1, 3),
                                      v0, e1, e2, scene.num_faces)
        cov_r = np.asarray(hit_r.tri) >= 0
        cov_b = np.asarray(hit_b.tri) >= 0
        assert cov_b.mean() > 0.99          # enclosed: rays must hit
        assert (cov_r == cov_b).mean() > 0.99, (cov_r.mean(), cov_b.mean())
        both = cov_r & cov_b
        same = (np.asarray(hit_r.tri) == np.asarray(hit_b.tri))[both]
        assert same.mean() > 0.95
        # barycentrics of clipped triangles still reference the source tri
        tr = np.asarray(hit_r.tri)
        tb = np.asarray(hit_b.tri)
        match = both & (tr == tb)
        np.testing.assert_allclose(np.asarray(hit_r.u)[match],
                                   np.asarray(hit_b.u)[match], atol=5e-3)
        np.testing.assert_allclose(np.asarray(hit_r.v)[match],
                                   np.asarray(hit_b.v)[match], atol=5e-3)


class TestRasterBackend:
    def test_render_frame_raster_parity(self, cornell):
        res = 48
        d = RenderDelegate(RenderConfig(width=res, height=res))
        d.populate(cornell)
        scene = d.sync()
        fp = FrameParams.from_camera(d.camera)
        a = render_frame(scene, fp, height=res, width=res, shadows=False,
                         backend="brute")
        b = render_frame(scene, fp, height=res, width=res, shadows=False,
                         backend="raster")
        ia, ib = np.asarray(a["instance_id"]), np.asarray(b["instance_id"])
        same = ia == ib
        assert same.mean() > 0.97
        np.testing.assert_allclose(np.asarray(a["color"])[same],
                                   np.asarray(b["color"])[same], atol=2e-2,
                                   rtol=1e-3)
        # world-space depth agrees on matching pixels
        np.testing.assert_allclose(np.asarray(a["depth"])[same & (ia >= 0)],
                                   np.asarray(b["depth"])[same & (ia >= 0)],
                                   rtol=5e-3)


class TestBinnedOverflow:
    def test_overflow_surfaced(self):
        """Geometry concentrated in one tile past cap_groups must be
        reported via HitRecord.overflow (ADVICE r1: silent truncation)."""
        import jax

        # many triangles stacked in the same few pixels: every group lands
        # in one tile, far beyond cap_groups * 8 slots
        n = 1200
        rng = np.random.default_rng(1)
        base = rng.uniform(-0.05, 0.05, size=(n, 3, 3)).astype(np.float32)
        base[..., 2] = rng.uniform(2.0, 3.0, size=(n, 3)).astype(np.float32)
        verts = base.reshape(-1, 3)
        tris = np.arange(n * 3, dtype=np.int32).reshape(n, 3)
        vp = np.eye(4, dtype=np.float32)  # identity projection, z in view
        vp[2, 2] = 0.25  # squash z into [0, 1]
        hit, _ = rasterize.rasterize_binned(
            jnp.asarray(verts), jnp.asarray(tris), jnp.int32(n),
            jnp.asarray(vp), height=16, width=128, cap_groups=16)
        assert hit.overflow is not None
        assert int(hit.overflow) > 0

    def test_no_overflow_on_cornell(self, cornell):
        scene, cam = _setup(cornell, 48)
        world = bake_world(scene)
        hit, _ = rasterize.rasterize_binned(
            world, scene.tri_vertices, scene.num_faces,
            jnp.asarray(cam.view_proj), height=48, width=48)
        assert int(hit.overflow) == 0

    def test_ranged_backend_dispatch(self, cornell):
        """backend='raster_ranged' must force the chunk-range kernel and
        produce the same visibility as the binned default."""
        res = 48
        scene, cam = _setup(cornell, res)
        fp = FrameParams.from_camera(cam)
        a = render_frame(scene, fp, height=res, width=res,
                         backend="raster")
        b = render_frame(scene, fp, height=res, width=res,
                         backend="raster_ranged")
        ia = np.asarray(a["instance_id"])
        ib = np.asarray(b["instance_id"])
        assert (ia == ib).mean() > 0.99


class TestSortedRaster:
    """Sort-binned rasterizer (the O(F log F) scale path)."""

    def test_matches_binned(self, cornell):
        res = 64
        scene, cam = _setup(cornell, res)
        world = bake_world(scene)
        vp = jnp.asarray(cam.view_proj)
        hb, zb = rasterize.rasterize_binned(
            world, scene.tri_vertices, scene.num_faces, vp,
            height=res, width=res)
        hs, zs = rasterize.rasterize_sorted(
            world, scene.tri_vertices, scene.num_faces, vp,
            height=res, width=res)
        same = np.asarray(hb.tri) == np.asarray(hs.tri)
        assert same.mean() > 0.99          # depth ties may flip winners
        # z carries pos_bits of winner-id in the low mantissa; the two
        # kernels truncate at different widths (9 vs 10 bits)
        np.testing.assert_allclose(np.asarray(hs.t)[same],
                                   np.asarray(hb.t)[same], atol=1e-4)
        assert int(hs.overflow) == 0

    def test_tier_overflow_reported(self, cornell):
        res = 48
        scene, cam = _setup(cornell, res)
        world = bake_world(scene)
        hit, _ = rasterize.rasterize_sorted(
            world, scene.tri_vertices, scene.num_faces,
            jnp.asarray(cam.view_proj), height=res, width=res,
            tile_h=1, pairs_cap=128)  # 1-px tile rows: emission outruns
                                      # the tiny pair-stream capacity
        assert int(hit.overflow) > 0


class TestGroupedTier:
    """Grouped-singleton tier: tiles whose whole list fits in W lanes
    run G = 128/W per kernel step (ops/rasterize.py _GROUP_CLASSES).
    A grouped tile walks exactly its own emitted list while the dense
    walk's chunk-aligned stream can include foreign DUPLICATE copies of
    the same slots (emitted for the neighboring tile), so quantized-z
    TIES between different triangles may resolve differently — but the
    hit MASK must agree exactly (bbox emission covers all coverage in
    both paths), ids must agree away from ties, and depths must agree
    to the shared 2^-16 key quantization."""

    def _ab(self, stage, res_h, res_w):
        d = RenderDelegate(RenderConfig(width=res_w, height=res_h))
        d.populate(stage)
        scene, cam = d.sync(), d.camera
        world = bake_world(scene)
        vp = jnp.asarray(cam.view_proj)
        outs = []
        for grouped in (True, False):
            hit, z = rasterize.rasterize_sorted(
                world, scene.tri_vertices, scene.num_faces, vp,
                height=res_h, width=res_w, grouped=grouped)
            assert int(hit.overflow) == 0
            outs.append((hit, z))
        return outs

    def _assert_parity(self, hg, zg, hd, zd):
        tg, td = np.asarray(hg.tri), np.asarray(hd.tri)
        np.testing.assert_array_equal(tg >= 0, td >= 0)   # exact mask
        assert (tg == td).mean() > 0.999                  # ties only
        hitm = (tg >= 0).reshape(np.asarray(zg).shape)
        np.testing.assert_allclose(np.asarray(zg)[hitm],
                                   np.asarray(zd)[hitm], atol=2e-4)
        same = tg == td
        np.testing.assert_array_equal(np.asarray(hg.u)[same],
                                      np.asarray(hd.u)[same])

    def test_parity_cornell(self, cornell):
        # 64x256 -> 8x2 tiles; cornell walls give a mix of sparse and
        # mid-density tiles covering several classes
        (hg, zg), (hd, zd) = self._ab(cornell, 64, 256)
        self._assert_parity(hg, zg, hd, zd)

    def test_parity_kitchen(self):
        # denser scene: exercises class boundaries and the dense tier
        # side by side (tiles above 64 pairs next to tiles below 8)
        (hg, zg), (hd, zd) = self._ab(
            scenes.kitchen_stress(num_objects=48), 96, 384)
        self._assert_parity(hg, zg, hd, zd)

    def test_empty_tiles_miss(self, cornell):
        # camera panned so part of the framebuffer sees nothing: empty
        # tiles flow through the W=8 class and must write clean misses
        d = RenderDelegate(RenderConfig(width=256, height=64))
        d.populate(cornell)
        scene, cam = d.sync(), d.camera
        world = bake_world(scene)
        vp = jnp.asarray(cam.view_proj)
        from vri_tpu.utils import math3d as m3
        eye = np.asarray(cam.eye) + np.array([6.0, 0.0, 0.0])
        view = m3.look_at(eye, eye + np.array([1.0, 0.0, 0.0]))
        vp = jnp.asarray((np.asarray(cam.proj) @ view).astype(np.float32))
        hit, z = rasterize.rasterize_sorted(
            world, scene.tri_vertices, scene.num_faces, vp,
            height=64, width=256)
        ho, zo = rasterize.rasterize_sorted(
            world, scene.tri_vertices, scene.num_faces, vp,
            height=64, width=256, grouped=False)
        np.testing.assert_array_equal(np.asarray(hit.tri),
                                      np.asarray(ho.tri))


class TestResolveModes:
    """FUSED in-kernel resolve vs XLA row-gather resolve (static switch
    on slot count, ops/rasterize.py _FUSED_MAX_SLOTS).  Both modes share
    the walk's key packing and tie rules, so winner ids and the hit mask
    must agree EXACTLY; z to the shared 2^-16 key quantization; (u, v)
    to f32 evaluation tolerance (rational-affine in-kernel vs
    edge-function gather resolve — same math, different factoring)."""

    def _ab(self, stage, res_h, res_w):
        d = RenderDelegate(RenderConfig(width=res_w, height=res_h))
        d.populate(stage)
        scene, cam = d.sync(), d.camera
        world = bake_world(scene)
        vp = jnp.asarray(cam.view_proj)
        outs = []
        for fused in (True, False):
            hit, z = rasterize.rasterize_sorted(
                world, scene.tri_vertices, scene.num_faces, vp,
                height=res_h, width=res_w, pairs_cap=8192, fused=fused)
            assert int(hit.overflow) == 0
            outs.append((hit, z))
        return outs

    def _assert_parity(self, hf, zf, hg, zg):
        tf_, tg_ = np.asarray(hf.tri), np.asarray(hg.tri)
        np.testing.assert_array_equal(tf_, tg_)
        np.testing.assert_allclose(np.asarray(zf), np.asarray(zg),
                                   atol=2e-4)
        # (u, v) cross-mode tolerance 2e-3: both paths are ~1e-3-level
        # f32 evaluations (verified against an fp64 reference: equal
        # mean error, neither systematically worse); their mutual
        # difference is f32 factoring noise, not a defect
        m = tf_ >= 0
        np.testing.assert_allclose(np.asarray(hf.u)[m],
                                   np.asarray(hg.u)[m], atol=2e-3)
        np.testing.assert_allclose(np.asarray(hf.v)[m],
                                   np.asarray(hg.v)[m], atol=2e-3)

    def test_parity_cornell(self, cornell):
        res = 64
        scene, cam = _setup(cornell, res)
        world = bake_world(scene)
        vp = jnp.asarray(cam.view_proj)
        outs = []
        for fused in (True, False):
            hit, z = rasterize.rasterize_sorted(
                world, scene.tri_vertices, scene.num_faces, vp,
                height=res, width=res, pairs_cap=8192, fused=fused)
            assert int(hit.overflow) == 0
            outs.append((hit, z))
        self._assert_parity(*outs[0], *outs[1])

    def test_parity_kitchen_grouped_mix(self):
        # denser scene at a wide framebuffer: covers grouped classes and
        # the dense tier in BOTH resolve modes side by side
        (hf, zf), (hg, zg) = self._ab(
            scenes.kitchen_stress(num_objects=48), 96, 384)
        self._assert_parity(hf, zf, hg, zg)


class TestOverflowEscalation:
    """Renderer caps ladder: overflow -> 2x -> 4x lists -> ranged kernel
    (the graceful middle path before the ~20x capacity-free cliff)."""

    def test_caps_scale_resolves_overflow(self, cornell):
        res = 48
        scene, cam = _setup(cornell, res)
        world = bake_world(scene)
        vp = jnp.asarray(cam.view_proj)
        # 1-px tile rows + a deliberately tiny pair-stream budget
        # overflow at scale 1 ...
        h1, _ = rasterize.rasterize_sorted(
            world, scene.tri_vertices, scene.num_faces, vp,
            height=res, width=res, tile_h=1, pairs_cap=256)
        assert int(h1.overflow) > 0
        # ... and the SAME caps at 4x absorb the scene, matching the
        # capacity-free oracle
        h4, _ = rasterize.rasterize_sorted(
            world, scene.tri_vertices, scene.num_faces, vp,
            height=res, width=res, tile_h=1, pairs_cap=256, caps_scale=4)
        ho, _ = rasterize.rasterize(
            world, scene.tri_vertices, scene.num_faces, vp,
            height=res, width=res)
        assert int(h4.overflow) == 0
        same = np.asarray(h4.tri) == np.asarray(ho.tri)
        # depth ties may flip winners (the interior-wound Cornell corners
        # put coincident wall edges on shared pixels at 48^2 / 1-px tiles)
        assert same.mean() > 0.98

    def test_renderer_escalates_on_overflow(self, cornell, monkeypatch):
        from vri_tpu.config import RenderConfig
        from vri_tpu.renderer import Renderer
        import vri_tpu.renderer as renderer_mod

        r = Renderer(RenderConfig(width=32, height=32))
        r.load_stage(cornell)

        seen = []

        def fake_render_frame(scene, fp, *, height, width, mode=0,
                              shadows=True, backend="raster",
                              lod_tau=0.75):
            seen.append(backend)
            # report overflow until the ranged kernel takes over
            over = 0 if backend == "raster_ranged" else 1
            return {"color": jnp.zeros((height, width, 3)),
                    "depth": jnp.zeros((height, width)),
                    "raster_overflow_tiles": jnp.int32(over)}

        monkeypatch.setattr(renderer_mod.frame_mod, "render_frame",
                            fake_render_frame)
        for _ in range(4):
            r.render(gi=False, backend="raster")
        assert seen == ["raster", "raster2x", "raster4x", "raster_ranged"]


class TestSplitWordEmission:
    """Big-pool split-word carry emission (round 5: replaces the
    searchsorted path that cost ~200 ms/frame at the 1M-slot city pool)
    must reproduce the single-word carry path exactly."""

    def test_matches_single_word_path(self, cornell):
        res = 64
        scene, cam = _setup(cornell, res)
        world = bake_world(scene)
        vp = jnp.asarray(cam.view_proj)
        h0, _ = rasterize.rasterize_sorted(
            world, scene.tri_vertices, scene.num_faces, vp,
            height=res, width=res)
        for path in ("split", "search"):
            h1, _ = rasterize.rasterize_sorted(
                world, scene.tri_vertices, scene.num_faces, vp,
                height=res, width=res, emit_path=path)
            np.testing.assert_array_equal(np.asarray(h0.tri),
                                          np.asarray(h1.tri), err_msg=path)
            np.testing.assert_array_equal(np.asarray(h0.t),
                                          np.asarray(h1.t), err_msg=path)
            np.testing.assert_array_equal(np.asarray(h0.u),
                                          np.asarray(h1.u), err_msg=path)
