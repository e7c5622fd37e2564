"""GI lightloop + renderer facade tests (BASELINE config 4 behavior)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vri_tpu.config import DebugMode, RenderConfig, SDFConfig
from vri_tpu.ops import gi
from vri_tpu.renderer import Renderer
from vri_tpu.usd import scenes

TINY = SDFConfig(num_cascades=2, cascade_resolution=16, brick_size=8,
                 max_bricks=8192, base_voxel_size=0.15,
                 truncation_voxels=3.0, max_triangles_per_brick=16,
                 march_max_steps=96)


def make_renderer(res=64):
    r = Renderer(RenderConfig(width=res, height=res, sdf=TINY))
    r.load_stage(scenes.cornell_box())
    return r


@pytest.fixture(scope="module")
def renderer():
    return make_renderer()


class TestSampling:
    def test_cosine_hemisphere_distribution(self):
        key = jax.random.PRNGKey(1)
        n = jnp.tile(jnp.asarray([[0.0, 1.0, 0.0]]), (4096, 1))
        u = jax.random.uniform(key, (4096, 2))
        d = gi.cosine_sample_hemisphere(n, u[:, 0], u[:, 1])
        d = np.asarray(d)
        np.testing.assert_allclose(np.linalg.norm(d, axis=-1), 1.0, atol=1e-5)
        cos = d[:, 1]
        assert (cos >= -1e-6).all()
        # E[cos] = 2/3 for pdf = cos/pi
        assert abs(cos.mean() - 2.0 / 3.0) < 0.02

    def test_hemisphere_any_normal(self):
        key = jax.random.PRNGKey(2)
        nrm = jax.random.normal(key, (256, 3))
        nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
        u = jax.random.uniform(key, (256, 2))
        d = gi.cosine_sample_hemisphere(nrm, u[:, 0], u[:, 1])
        dots = np.asarray(jnp.sum(d * nrm, axis=-1))
        assert (dots >= -1e-5).all()


class TestLightloop:
    def test_indirect_is_nonnegative_addition(self, renderer):
        """lightloop = emissive + albedo*(direct + indirect); indirect >= 0,
        so the lightloop can never be darker than its own direct part."""
        import jax.numpy as jnp
        from vri_tpu.ops import raygen, shading
        from vri_tpu.ops.intersect import gather_triangles, trace_brute
        from vri_tpu.registry import bake_world

        scene = renderer.scene
        cas = renderer.ensure_cascades()
        cam = renderer.camera
        world = bake_world(scene)
        o, d = raygen.camera_rays(jnp.asarray(cam.inv_view_proj),
                                  jnp.asarray(cam.eye), 32, 32)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        v0, e1, e2 = gather_triangles(world, scene.tri_vertices)
        hit = trace_brute(o, d, v0, e1, e2, scene.num_faces)
        gb = shading.resolve_gbuffer(scene, world, hit, o, d)
        full = gi.lightloop(gb, scene, cas, jax.random.PRNGKey(3),
                            config=TINY, samples=1)
        direct = gi.direct_radiance(gb.position, gb.normal, scene, cas, TINY)
        base = gb.emissive + gb.albedo * direct
        base = jnp.where(gb.valid[:, None], base, 0.0)
        assert (np.asarray(full) >= np.asarray(base) - 1e-5).all()
        assert np.asarray(full).sum() > np.asarray(base).sum()

    def test_color_bleed_from_walls(self, renderer):
        img = renderer.render_progressive(6, samples=1, backend="brute")
        res = img.shape[0]
        # white floor pixels adjacent to the red (left) vs green (right) wall
        left = img[int(res * 0.88), int(res * 0.2)]
        right = img[int(res * 0.88), int(res * 0.8)]
        assert left[0] / max(left[1], 1e-6) > right[0] / max(right[1], 1e-6)

    def test_sdf_shadowed_direct(self, renderer):
        """Direct radiance via SDF occlusion: floor under the tall box is
        dark, open floor is lit (same check as the reference's intent for
        its shadowed lighting pass)."""
        import jax.numpy as jnp

        cas = renderer.ensure_cascades()
        pts = jnp.asarray([[-0.35, -0.97, -0.35],   # under the tall box
                           [0.0, -0.97, 0.8]],       # open floor
                          jnp.float32)
        nrm = jnp.asarray([[0, 1, 0], [0, 1, 0]], jnp.float32)
        rad = np.asarray(gi.direct_radiance(pts, nrm, renderer.scene, cas,
                                            TINY))
        assert rad[1].sum() > 4.0 * rad[0].sum() + 1e-6


class TestDebugModes:
    @pytest.mark.parametrize("mode", [
        DebugMode.SDF_DISTANCE, DebugMode.SDF_UVW, DebugMode.SDF_ITERATIONS,
        DebugMode.SDF_GRAD, DebugMode.SDF_BRICK_ID, DebugMode.SDF_CASCADE_ID])
    def test_sdf_debug_modes_render(self, renderer, mode):
        aovs = renderer.render(mode=mode)
        c = aovs["color"]
        assert np.isfinite(c).all()
        assert c.max() > 0.0


class TestRendererFacade:
    def test_accumulate_is_running_mean(self):
        from vri_tpu.passes.frame import accumulate

        xs = [jnp.full((2, 2, 3), v) for v in (1.0, 2.0, 6.0)]
        color = jnp.zeros((2, 2, 3))
        count = jnp.zeros(())
        for x in xs:
            color, count = accumulate(color, count, x)
        np.testing.assert_allclose(np.asarray(color), 3.0, rtol=1e-6)

    def test_cascade_rebuild_policy(self):
        r = make_renderer(32)
        r.render(gi=True)
        c1 = r.cascades
        r.render(gi=True)  # same camera: no rebuild
        assert r.cascades is c1
        # geometry edit -> rebuild
        stage = r.delegate.stage
        changed = scenes.animate(stage, 2.0)
        if not changed:  # cornell has no animated props; move a box instead
            prim = stage.prim_at_path("/World/ShortBox")
            a = prim.attributes["xformOp:translate"]
            a.value = np.asarray(a.value) + np.asarray([0.2, 0, 0],
                                                       np.float32)
            r.delegate.tracker.mark_transform(prim.path)
        else:
            r.delegate.apply_animation(changed)
        r.sync()
        r.render(gi=True)
        assert r.cascades is not c1

    def test_flythrough_runs(self):
        from vri_tpu.hydra.camera import FreeCamera

        r = make_renderer(32)
        frames = r.render_flythrough(2, FreeCamera(radius=3.5), gi=False)
        assert len(frames) == 2
        assert frames[0]["color"].shape == (32, 32, 3)


class TestRadianceCache:
    def test_cache_approximates_marched_bounce(self, renderer):
        """lightloop(use_cache=True) with baked brick irradiance stays close
        to the per-hit-marched bounce (same scene, same rays)."""
        import jax.numpy as jnp
        from vri_tpu.ops import raygen, shading, sdf as sdf_mod
        from vri_tpu.ops.intersect import gather_triangles, trace_brute
        from vri_tpu.registry import bake_world

        scene = renderer.scene
        cas = sdf_mod.bake_brick_lighting(renderer.ensure_cascades(), scene,
                                          config=TINY)
        assert float(jnp.abs(cas.brick_irradiance).sum()) > 0
        cam = renderer.camera
        world = bake_world(scene)
        o, d = raygen.camera_rays(jnp.asarray(cam.inv_view_proj),
                                  jnp.asarray(cam.eye), 24, 24)
        o, d = o.reshape(-1, 3), d.reshape(-1, 3)
        v0, e1, e2 = gather_triangles(world, scene.tri_vertices)
        hit = trace_brute(o, d, v0, e1, e2, scene.num_faces)
        gb = shading.resolve_gbuffer(scene, world, hit, o, d)
        key = jax.random.PRNGKey(5)
        marched = gi.lightloop(gb, scene, cas, key, config=TINY, samples=1,
                               use_cache=False)
        cached = gi.lightloop(gb, scene, cas, key, config=TINY, samples=1,
                              use_cache=True)
        m, c = np.asarray(marched), np.asarray(cached)
        # same direct term; indirect differs only by the cache approximation
        assert np.isfinite(c).all()
        assert abs(c.sum() - m.sum()) / max(m.sum(), 1e-6) < 0.35


class TestAnimatedEndToEnd:
    def test_animated_flythrough_with_rebuilds(self):
        """BASELINE config 3+5 shape: animated stage, per-frame sync +
        cascade rebuild + GI render over a scripted camera."""
        from vri_tpu.hydra.camera import FreeCamera

        r = Renderer(RenderConfig(width=24, height=24, sdf=TINY))
        stage = scenes.animated_stage(num_objects=4)
        r.load_stage(stage)
        cam = FreeCamera(center=(0, 0.5, 0), radius=4.0, height=2.0)
        builds = []
        for i in range(3):
            changed = scenes.animate(stage, i * 0.7)
            r.delegate.apply_animation(changed)
            r.sync()
            aovs = r.render(camera=cam.at_time(i / 8.0, 1.0), gi=True,
                            samples=1, backend="brute")
            builds.append(r.cascades)
            assert np.isfinite(aovs["color"]).all()
        # animation dirtied geometry every frame -> cascades rebuilt
        assert builds[0] is not builds[1] and builds[1] is not builds[2]


class TestHalfResGI:
    def test_gi_scale_matches_full_res_statistically(self, renderer):
        a = renderer.render(gi=True, samples=1, backend="brute")
        b = renderer.render(gi=True, samples=1, backend="brute", gi_scale=2)
        ca, cb = a["color"], b["color"]
        assert np.isfinite(cb).all()
        assert abs(ca.mean() - cb.mean()) / max(ca.mean(), 1e-6) < 0.1


class TestDistantLight:
    def test_distant_light_lights_and_shadows(self):
        """DistantLight: constant irradiance, direction-based shadows."""
        from vri_tpu.usd import Stage

        text = '''#usda 1.0
def Xform "W" {
    def Mesh "Floor" {
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [3, 2, 1, 0]
        point3f[] points = [(-2, 0, -2), (2, 0, -2), (2, 0, 2), (-2, 0, 2)]
    }
    def Mesh "Blocker" {
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [3, 2, 1, 0]
        point3f[] points = [(-0.5, 1, -0.5), (0.5, 1, -0.5), (0.5, 1, 0.5), (-0.5, 1, 0.5)]
    }
    def DistantLight "Sun" {
        float3 vri:direction = (0, -1, 0)
        float inputs:intensity = 2.0
    }
    def Camera "Cam" {
        float3 vri:eye = (0, 3, 4)
        float3 vri:target = (0, 0, 0)
    }
}
'''
        r = Renderer(RenderConfig(width=48, height=48, sdf=TINY))
        r.load_stage(Stage.from_string(text))
        scene = r.scene
        assert int(scene.num_lights) == 1
        assert int(scene.light_type[0]) == 1
        np.testing.assert_allclose(np.asarray(scene.light_position[0]),
                                   [0, 1, 0], atol=1e-6)
        aovs = r.render(gi=True, samples=0, backend="brute")
        img = aovs["color"]
        inst = aovs["instance_id"]
        # floor pixels directly under the blocker are shadowed; open floor
        # is lit with constant irradiance (no falloff)
        lit = img[(inst == 0)].sum(-1)
        assert lit.max() > 0.5
        assert lit.min() < 0.25 * lit.max()   # shadowed region exists


class TestEmissiveGI:
    def test_emissive_quad_illuminates_via_bounce(self):
        """An emissive surface (the Cornell light quad) contributes to the
        GI gather even with no point lights."""
        from vri_tpu.usd import Stage

        text = '''#usda 1.0
def Xform "W" {
    def Mesh "Floor" {
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [3, 2, 1, 0]
        point3f[] points = [(-1, 0, -1), (1, 0, -1), (1, 0, 1), (-1, 0, 1)]
    }
    def Mesh "Glow" {
        int[] faceVertexCounts = [4]
        int[] faceVertexIndices = [0, 1, 2, 3]
        point3f[] points = [(-0.4, 1, 0.4), (0.4, 1, 0.4), (0.4, 1, -0.4), (-0.4, 1, -0.4)]
        rel material:binding = </W/Lamp>
    }
    def Material "Lamp" {
        token outputs:surface.connect = </W/Lamp/S.outputs:surface>
        def Shader "S" {
            uniform token info:id = "UsdPreviewSurface"
            color3f inputs:emissiveColor = (8, 6, 2)
        }
    }
    def Camera "Cam" {
        float3 vri:eye = (0, 1.2, 2.5)
        float3 vri:target = (0, 0.3, 0)
    }
}
'''
        r = Renderer(RenderConfig(width=48, height=48, sdf=TINY))
        r.load_stage(Stage.from_string(text))
        assert int(r.scene.num_lights) == 0
        gi_img = r.render_progressive(4, samples=1, backend="brute")
        direct = r.render(gi=True, samples=0, backend="brute")["color"]
        inst = r.render(gi=False, backend="brute")["instance_id"]
        floor = inst == 0
        # no lights: direct is ~ambient only; GI adds emissive bounce energy
        assert gi_img[floor].sum() > direct[floor].sum() * 1.3


class TestCachedShadows:
    def test_cached_shadow_direct_approximates_marched(self, renderer):
        """direct_radiance_cached (baked per-brick visibility) agrees with
        the marched direct term up to voxel-quantized shadow edges."""
        import dataclasses

        import jax.numpy as jnp
        from vri_tpu.ops import sdf as sdf_mod

        scene = renderer.scene
        cas = sdf_mod.bake_brick_lighting(renderer.ensure_cascades(), scene,
                                          config=TINY)
        pts = jnp.asarray([[-0.35, -0.97, -0.35],   # under the tall box
                           [0.0, -0.97, 0.8]], jnp.float32)
        nrm = jnp.asarray([[0, 1, 0], [0, 1, 0]], jnp.float32)
        marched = np.asarray(gi.direct_radiance(pts, nrm, scene, cas, TINY))
        cached = np.asarray(gi.direct_radiance_cached(pts, nrm, scene, cas,
                                                      TINY))
        # shadowed point stays much darker than the open point in both
        assert marched[1].sum() > 4 * marched[0].sum()
        assert cached[1].sum() > 2 * cached[0].sum()
        # lit point magnitudes agree closely (same analytic N.L/falloff)
        np.testing.assert_allclose(cached[1], marched[1], rtol=0.3)
