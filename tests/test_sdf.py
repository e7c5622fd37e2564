"""Sparse-brick SDF cascade build + sphere-march tests (vs exact
point-triangle distances and the brute-force ray tracer).

Reference behavior being mirrored: Brixelizer cascade data model
(ffx_brixelizer_host_gpu_shared.h), trace (ffx_brixelizer_trace_ops.h).
Tiny configs keep CPU runtime sane.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.ops import geometry, intersect, sdf, sdf_trace
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

TINY = SDFConfig(num_cascades=2, cascade_resolution=16, brick_size=8,
                 max_bricks=8192, base_voxel_size=0.15,
                 truncation_voxels=3.0, max_triangles_per_brick=16,
                 march_max_steps=128)


@pytest.fixture(scope="module")
def cornell_sdf():
    d = RenderDelegate(RenderConfig(width=32, height=32))
    d.populate(scenes.cornell_box())
    scene = d.sync()
    world = bake_world(scene)
    cascades = sdf.build_for_scene(scene, world, focus=(0.0, 0.0, 0.0),
                                   config=TINY, chunk=32, brick_block=128)
    return scene, world, cascades


class TestGeometry:
    def test_point_above_interior(self):
        a = jnp.asarray([0.0, 0, 0])
        b = jnp.asarray([1.0, 0, 0])
        c = jnp.asarray([0.0, 1, 0])
        p = jnp.asarray([0.25, 0.25, 0.7])
        d = geometry.point_triangle_distance(p, a, b, c)
        np.testing.assert_allclose(float(d), 0.7, atol=1e-6)

    def test_point_near_vertex(self):
        a = jnp.asarray([0.0, 0, 0])
        b = jnp.asarray([1.0, 0, 0])
        c = jnp.asarray([0.0, 1, 0])
        p = jnp.asarray([-1.0, -1.0, 0.0])
        d = geometry.point_triangle_distance(p, a, b, c)
        np.testing.assert_allclose(float(d), np.sqrt(2.0), atol=1e-6)

    def test_point_near_edge(self):
        a = jnp.asarray([0.0, 0, 0])
        b = jnp.asarray([2.0, 0, 0])
        c = jnp.asarray([0.0, 2, 0])
        p = jnp.asarray([1.0, -1.0, 0.0])
        d = geometry.point_triangle_distance(p, a, b, c)
        np.testing.assert_allclose(float(d), 1.0, atol=1e-6)

    def test_matches_dense_sampling(self, rng):
        a, b, c = jnp.asarray(rng.normal(size=(3, 3)), jnp.float32)
        p = jnp.asarray(rng.normal(size=(64, 3)) * 2, jnp.float32)
        d = geometry.point_triangle_distance(p, a, b, c)
        # dense barycentric sampling ground truth
        u = np.linspace(0, 1, 120)
        uu, vv = np.meshgrid(u, u)
        mask = uu + vv <= 1
        uu, vv = uu[mask], vv[mask]
        pts = (np.asarray(a)[None] * (1 - uu - vv)[:, None]
               + np.asarray(b)[None] * uu[:, None]
               + np.asarray(c)[None] * vv[:, None])
        gt = np.min(np.linalg.norm(np.asarray(p)[:, None] - pts[None], axis=-1),
                    axis=1)
        np.testing.assert_allclose(np.asarray(d), gt, atol=2e-2)


class TestBuild:
    def test_bricks_allocated_near_surfaces(self, cornell_sdf):
        scene, world, cas = cornell_sdf
        assert int(cas.num_bricks) > 0
        assert int(cas.overflow) == 0
        bm = np.asarray(cas.brick_map)
        r = TINY.cascade_resolution
        # voxel on the floor (y=-1) in cascade 0 must have a brick
        vs = float(cas.voxel_size[0])
        org = np.asarray(sdf.cascade_origin(cas.center[0], cas.voxel_size[0],
                                            r))
        vox = np.floor((np.array([0.0, -1.0 + 0.01, 0.0]) - org) / vs).astype(int)
        assert bm[0, vox[2], vox[1], vox[0]] >= 0
        # voxel in the empty interior (origin is ~0.65 from nearest surface,
        # beyond truncation 3*0.15=0.45) must be empty
        vox0 = np.floor((np.array([0.0, 0.1, 0.9]) - org) / vs).astype(int)
        # point near the open front center, far from walls/boxes: empty
        # voxels store -esd (negative chebyshev skip distance)
        assert bm[0, vox0[2], vox0[1], vox0[0]] < 0

    def test_atlas_distances_match_exact(self, cornell_sdf):
        scene, world, cas = cornell_sdf
        # sample the SDF at points slightly above the floor; compare to
        # exact min distance over all triangles
        pts = np.stack([np.linspace(-0.8, 0.8, 9),
                        np.full(9, -1.0 + 0.2),
                        np.full(9, 0.0)], axis=1).astype(np.float32)
        d, cidx, brick, uvw, inside, _ = sdf_trace._sample(
            cas, jnp.asarray(pts), TINY)
        v0 = np.asarray(world[np.asarray(scene.tri_vertices)])
        nf = int(scene.num_faces)
        exact = np.min(np.asarray(geometry.point_triangle_distance(
            jnp.asarray(pts)[:, None, :], jnp.asarray(v0[:nf, 0])[None],
            jnp.asarray(v0[:nf, 1])[None], jnp.asarray(v0[:nf, 2])[None])),
            axis=1)
        got = np.asarray(d)
        assert inside.all()
        # where a brick exists, distance approximates the exact one
        has = np.asarray(brick) >= 0
        assert has.any()
        np.testing.assert_allclose(got[has], exact[has], atol=0.08)

    def test_overflow_counted(self):
        d = RenderDelegate(RenderConfig(width=16, height=16))
        d.populate(scenes.cornell_box())
        scene = d.sync()
        world = bake_world(scene)
        cfg = SDFConfig(num_cascades=1, cascade_resolution=16, brick_size=8,
                        max_bricks=64, base_voxel_size=0.15,
                        truncation_voxels=3.0, max_triangles_per_brick=8)
        cas = sdf.build_for_scene(scene, world, focus=(0, 0, 0), config=cfg,
                                  chunk=32, brick_block=64)
        assert int(cas.overflow) > 0
        assert int(cas.num_bricks) == 64


class TestMarch:
    def test_primary_hits_match_raytrace(self, cornell_sdf):
        scene, world, cas = cornell_sdf
        # rays from just inside the box front, into the scene
        o = np.tile(np.array([[0.0, 0.0, 0.9]], np.float32), (5, 1))
        dirs = np.array([[0, 0, -1], [0.7, 0, -0.714], [-0.7, 0, -0.714],
                         [0, 0.7, -0.714], [0, -0.7, -0.714]], np.float32)
        dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)
        rec = sdf_trace.march(cas, jnp.asarray(o), jnp.asarray(dirs),
                              t_max=10.0, config=TINY)
        v0, e1, e2 = intersect.gather_triangles(world, scene.tri_vertices)
        gt = intersect.trace_brute(jnp.asarray(o), jnp.asarray(dirs),
                                   v0, e1, e2, scene.num_faces)
        assert np.asarray(rec.hit).all()
        np.testing.assert_allclose(np.asarray(rec.t), np.asarray(gt.t),
                                   atol=0.12)

    def test_miss_outside(self, cornell_sdf):
        _, _, cas = cornell_sdf
        o = jnp.asarray([[0.0, 0.0, 5.0]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, 1.0]], jnp.float32)  # away from scene
        rec = sdf_trace.march(cas, o, d, t_max=10.0, config=TINY)
        assert not bool(rec.hit[0])

    def test_occlusion_shadows(self, cornell_sdf):
        scene, world, cas = cornell_sdf
        light = np.array([0.0, 0.93, 0.0], np.float32)
        # point on floor under the tall box -> blocked
        p_shadowed = np.array([-0.35, -0.98, -0.35], np.float32)
        # point on floor in the open -> visible
        p_open = np.array([0.0, -0.98, 0.8], np.float32)
        o = np.stack([p_shadowed, p_open]) + np.array([0, 0.05, 0])
        to_l = light[None] - o
        dist = np.linalg.norm(to_l, axis=-1, keepdims=True)
        rays = to_l / dist
        occ = sdf_trace.occlusion(cas, jnp.asarray(o), jnp.asarray(rays),
                                  t_max=jnp.asarray(dist[:, 0] - 0.1),
                                  config=TINY)
        occ = np.asarray(occ)
        assert occ[0] < 0.5          # blocked
        assert occ[1] > 0.5          # visible

    def test_iterations_bounded(self, cornell_sdf):
        _, _, cas = cornell_sdf
        o = jnp.asarray([[0.0, 0.0, 0.9]], jnp.float32)
        d = jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32)
        rec = sdf_trace.march(cas, o, d, t_max=10.0, config=TINY)
        assert int(rec.iterations[0]) <= TINY.march_max_steps

    def test_normal_points_up_on_floor(self, cornell_sdf):
        _, _, cas = cornell_sdf
        p = jnp.asarray([[0.3, -0.97, 0.2]], jnp.float32)
        n = np.asarray(sdf_trace.normal(cas, p, config=TINY))[0]
        assert abs(np.linalg.norm(n) - 1.0) < 1e-3
        assert n[1] > 0.8, n


class TestAtlasU8:
    def test_u8_atlas_march_parity(self, cornell_sdf):
        """uint8 atlas (the reference's R8 format) marches within
        quantization error of the f32 atlas."""
        import dataclasses

        import jax.numpy as jnp

        scene, world, cas32 = cornell_sdf
        cfg8 = dataclasses.replace(TINY, atlas_u8=True)
        cas8 = sdf.build_for_scene(scene, world, focus=(0.0, 0.0, 0.0),
                                   config=cfg8, chunk=32, brick_block=128)
        assert cas8.atlas.dtype == jnp.uint8
        o = np.tile(np.array([[0.0, 0.0, 0.9]], np.float32), (4, 1))
        dirs = np.array([[0, 0, -1], [0.6, 0, -0.8], [0, 0.6, -0.8],
                         [0, -0.6, -0.8]], np.float32)
        r32 = sdf_trace.march(cas32, jnp.asarray(o), jnp.asarray(dirs),
                              t_max=10.0, config=TINY)
        r8 = sdf_trace.march(cas8, jnp.asarray(o), jnp.asarray(dirs),
                             t_max=10.0, config=cfg8)
        np.testing.assert_array_equal(np.asarray(r32.hit), np.asarray(r8.hit))
        np.testing.assert_allclose(np.asarray(r32.t), np.asarray(r8.t),
                                   atol=5e-3)


class TestCompactMarch:
    def test_compacted_matches_plain(self, cornell_sdf):
        """Two-stage compaction is an exact restructuring of the march."""
        scene, world, cas = cornell_sdf
        rng = np.random.default_rng(3)
        o = rng.uniform(-0.9, 0.9, (1024, 3)).astype(np.float32)
        d = rng.normal(size=(1024, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        a = sdf_trace.march(cas, jnp.asarray(o), jnp.asarray(d), t_max=10.0,
                            config=TINY, compact=False)
        b = sdf_trace.march(cas, jnp.asarray(o), jnp.asarray(d), t_max=10.0,
                            config=TINY, compact=True)
        np.testing.assert_array_equal(np.asarray(a.hit), np.asarray(b.hit))
        np.testing.assert_allclose(np.asarray(a.t)[np.asarray(a.hit)],
                                   np.asarray(b.t)[np.asarray(b.hit)],
                                   rtol=1e-5)
