"""Temporal reprojection for progressive GI under camera motion.

The reference renders one raster frame with no temporal pass; progressive
GI needs history reuse to keep per-frame ray budgets small (ROADMAP P0
lever 3).  These tests validate the reprojection math (history survives a
camera step, disocclusions reset) and that a moving-camera accumulation
converges toward the many-sample reference image.
"""

import numpy as np
import pytest

from vri_tpu.config import RenderConfig, SDFConfig
from vri_tpu.hydra.camera import FreeCamera
from vri_tpu.renderer import Renderer
from vri_tpu.usd import scenes

TINY = SDFConfig(num_cascades=2, cascade_resolution=16, brick_size=8,
                 max_bricks=8192, base_voxel_size=0.15,
                 truncation_voxels=3.0, max_triangles_per_brick=16,
                 march_max_steps=64)


@pytest.fixture(scope="module")
def renderer():
    r = Renderer(RenderConfig(width=48, height=32, sdf=TINY))
    r.load_stage(scenes.cornell_box())
    return r


class TestTemporal:
    def test_history_accumulates_under_motion(self, renderer):
        cam = FreeCamera(radius=3.2, height=0.3)
        frames = renderer.render_flythrough(
            4, cam, dt=1.0 / 60.0, temporal=True, gi_scale=1)
        h1 = frames[0]["gi_history"]
        h4 = frames[3]["gi_history"]
        assert np.all(h1 == 1.0)                      # no history yet
        # most pixels keep reprojected history through a slow orbit
        frac = (h4 >= 3.0).mean()
        assert frac > 0.5, f"history survival too low: {frac:.2f}"
        assert np.isfinite(frames[3]["color"]).all()

    def test_teleport_resets_history(self, renderer):
        import jax
        from vri_tpu.passes import frame as frame_mod

        h, w = renderer.config.height, renderer.config.width

        def reset_fraction(t_second):
            cam_a = FreeCamera(radius=3.2).at_time(0.0, w / h)
            cam_b = FreeCamera(radius=3.2).at_time(t_second, w / h)
            cascades = renderer.ensure_cascades(eye=cam_a.eye)
            state = frame_mod.init_temporal(h, w)
            key = jax.random.PRNGKey(0)
            _, state = frame_mod.render_frame_gi_temporal(
                renderer.scene, frame_mod.FrameParams.from_camera(cam_a, h),
                cascades, key, state, height=h, width=w,
                config=renderer.config.sdf, use_cache=True)
            aovs, _ = frame_mod.render_frame_gi_temporal(
                renderer.scene, frame_mod.FrameParams.from_camera(cam_b, h),
                cascades, key, state, height=h, width=w,
                config=renderer.config.sdf, use_cache=True)
            hitpix = np.asarray(aovs["depth"]) < 1e9   # sky never has history
            return (np.asarray(aovs["gi_history"])[hitpix] == 1.0).mean()

        small = reset_fraction(0.05)       # tiny orbit step
        jump = reset_fraction(4.0)         # teleport to the opposite side
        # a teleport disoccludes far more pixels than a small step (surfaces
        # visible from both sides legitimately keep their history)
        assert jump > 0.3
        assert jump > 2.0 * small, (small, jump)

    def test_converges_toward_static_accumulation(self, renderer):
        # a (nearly) static "flythrough" must reduce GI noise like the
        # fixed-camera progressive accumulation does
        renderer.frame_index = 0       # pin the noise sequence
        cam = FreeCamera(radius=3.2, height=0.3)
        one = renderer.render_flythrough(1, cam, dt=0.0, temporal=True,
                                         samples=1)[0]["color"]
        many = renderer.render_flythrough(8, cam, dt=0.0, temporal=True,
                                          samples=1)[-1]["color"]
        ref = renderer.render_progressive(16, camera=cam.at_time(
            0.0, renderer.config.width / renderer.config.height), samples=1)
        err_one = np.abs(one - ref).mean()
        err_many = np.abs(many - ref).mean()
        assert err_many < err_one * 0.7, (err_one, err_many)

    def test_subpixel_pan_matches_static_quality(self, renderer):
        """Bilinear history (VERDICT r2 weak #4): under a sub-pixel-per-
        frame pan the accumulated GI must converge about as well as a
        static accumulation at the same sample count — a nearest-tap
        history resamples off-grid every frame and decoheres."""
        import jax
        from vri_tpu.hydra.camera import make_camera
        from vri_tpu.passes import frame as frame_mod

        h, w = renderer.config.height, renderer.config.width
        n_frames = 6
        cascades = renderer.ensure_cascades(
            eye=np.asarray([0.0, 0.0, 3.2], np.float32))

        def run(pan_per_frame):
            """Accumulate n frames ENDING at the same pose (x = 0), so the
            final views are identical and only the history path differs."""
            state = frame_mod.init_temporal(h, w)
            aovs = None
            for i in range(n_frames):
                # slow sideways pan, ~0.4 px/frame at 48 px width
                x = pan_per_frame * (i - (n_frames - 1))
                eye = np.asarray([x, 0.0, 3.2], np.float32)
                tgt = np.asarray([x, 0.0, 0.0], np.float32)
                cam = make_camera(eye, tgt, 45.0, w / h, 0.05, 100.0)
                aovs, state = frame_mod.render_frame_gi_temporal(
                    renderer.scene,
                    frame_mod.FrameParams.from_camera(cam, h), cascades,
                    jax.random.fold_in(jax.random.PRNGKey(7), i), state,
                    height=h, width=w, config=renderer.config.sdf,
                    use_cache=True)
            return aovs

        static = run(0.0)
        panned = run(0.02)
        hs = np.asarray(static["gi_history"])
        hp = np.asarray(panned["gi_history"])
        hit = np.asarray(static["depth"]) < 1e9
        # the pan keeps (nearly) as much history as the static accumulation
        assert hp[hit].mean() >= 0.8 * hs[hit].mean(), \
            (hp[hit].mean(), hs[hit].mean())
        # and the panned result stays close to the static one (no smear /
        # decoherence): compare where both have full history
        cs = np.asarray(static["color"])
        cp = np.asarray(panned["color"])
        both = hit & (hp >= n_frames - 1) & (hs >= n_frames - 1)
        assert both.mean() > 0.3
        rmse = float(np.sqrt(((cs - cp) ** 2)[both].mean()))
        assert rmse < 0.12, rmse


class TestDynamicFrame:
    """Animated-stage production frame (VERDICT r3 #4): the bounded SDF
    update + radiance re-bake run INSIDE the frame step, as the reference
    runs ffxBrixelizerBakeUpdate in every frame's command buffer
    (Source/RenderPass.cpp:919-1010)."""

    def test_dynamic_step_matches_full_rebuild(self, renderer):
        import dataclasses

        import jax
        import jax.numpy as jnp
        from vri_tpu.ops import sdf, sdf_build
        from vri_tpu.passes import frame as frame_mod
        from vri_tpu.registry import bake_world

        scene = renderer.scene
        cfg = dataclasses.replace(renderer.config.sdf, update_cell_cap=4096,
                                  update_brick_cap=8192,
                                  update_tri_cap=4096)
        h, w = renderer.config.height, renderer.config.width
        world0 = bake_world(scene)
        centers = sdf.default_centers(cfg, jnp.zeros(3))
        cas0, st0 = sdf_build.build_for_scene(scene, world0, centers, cfg)

        # move the smallest instance by a translation
        ni = int(scene.num_instances)
        ext = (np.asarray(scene.instance_aabb_hi)
               - np.asarray(scene.instance_aabb_lo))[:ni].max(-1)
        k = int(np.argmin(ext))
        off = np.asarray([0.15, 0.0, 0.1], np.float32)
        tf = np.asarray(scene.instance_transform).copy()
        tf[k, :3, 3] += off
        scene1 = scene.replace(instance_transform=jnp.asarray(tf))
        dirty_tri = jnp.asarray(np.asarray(scene.tri_instance) == k)
        lo = np.asarray(scene.instance_aabb_lo[k])
        hi = np.asarray(scene.instance_aabb_hi[k])
        dlo = np.full((4, 3), 3.0e38, np.float32)
        dhi = np.full((4, 3), -3.0e38, np.float32)
        dlo[0], dhi[0] = lo, hi
        dlo[1], dhi[1] = lo + off, hi + off

        fp = frame_mod.FrameParams.from_camera(renderer.camera, h)
        key = jax.random.PRNGKey(3)
        ts = frame_mod.init_temporal(h, w, 1)

        aovs_d, _, cas_d, st_d, needs_full = frame_mod.render_frame_gi_dynamic(
            scene1, fp, cas0, st0, key, ts, dirty_tri,
            jnp.asarray(dlo), jnp.asarray(dhi), height=h, width=w,
            config=cfg, backend="brute", samples=1, use_cache=True)
        assert int(needs_full) == 0

        # reference: full rebuild at the new transforms + bake + frame
        world1 = bake_world(scene1)
        cas_ref, st_ref = sdf_build.build_for_scene(scene1, world1,
                                                    centers, cfg)
        cas_ref = sdf.bake_brick_lighting(cas_ref, scene1, config=cfg,
                                          alive=st_ref.alive)
        aovs_r, _ = frame_mod.render_frame_gi_temporal(
            scene1, fp, cas_ref, key, ts, height=h, width=w, config=cfg,
            backend="brute", samples=1, use_cache=True)
        cd = np.asarray(aovs_d["color"])
        cr = np.asarray(aovs_r["color"])
        assert np.isfinite(cd).all()
        np.testing.assert_allclose(cd, cr, rtol=1e-3, atol=2e-3)

    def test_dynamic_loop_runs(self, renderer):
        """Three animated frames through the jitted step (stable shapes,
        history carried, zero capacity fallbacks)."""
        import dataclasses

        import jax
        import jax.numpy as jnp
        from vri_tpu.ops import sdf, sdf_build
        from vri_tpu.passes import frame as frame_mod
        from vri_tpu.registry import bake_world

        scene = renderer.scene
        cfg = dataclasses.replace(renderer.config.sdf, update_cell_cap=4096,
                                  update_brick_cap=8192,
                                  update_tri_cap=4096)
        h, w = renderer.config.height, renderer.config.width
        centers = sdf.default_centers(cfg, jnp.zeros(3))
        cas, st = sdf_build.build_for_scene(scene, bake_world(scene),
                                            centers, cfg)
        ni = int(scene.num_instances)
        ext = (np.asarray(scene.instance_aabb_hi)
               - np.asarray(scene.instance_aabb_lo))[:ni].max(-1)
        k = int(np.argmin(ext))
        tf0 = np.asarray(scene.instance_transform).copy()
        lo = np.asarray(scene.instance_aabb_lo[k])
        hi = np.asarray(scene.instance_aabb_hi[k])
        dirty_tri = jnp.asarray(np.asarray(scene.tri_instance) == k)
        fp = frame_mod.FrameParams.from_camera(renderer.camera, h)
        ts = frame_mod.init_temporal(h, w, 1)
        prev_off = np.zeros(3, np.float32)
        for i in range(3):
            off = np.asarray([0.05 * (i + 1), 0.0, 0.0], np.float32)
            tf = tf0.copy()
            tf[k, :3, 3] += off
            scene_i = scene.replace(instance_transform=jnp.asarray(tf))
            dlo = np.full((4, 3), 3.0e38, np.float32)
            dhi = np.full((4, 3), -3.0e38, np.float32)
            dlo[0], dhi[0] = lo + prev_off, hi + prev_off
            dlo[1], dhi[1] = lo + off, hi + off
            aovs, ts, cas, st, nf = frame_mod.render_frame_gi_dynamic(
                scene_i, fp, cas, st, jax.random.PRNGKey(i), ts,
                dirty_tri, jnp.asarray(dlo), jnp.asarray(dhi),
                height=h, width=w, config=cfg, backend="brute",
                samples=1, use_cache=True)
            assert int(nf) == 0
            prev_off = off
        hist = np.asarray(aovs["gi_history"])
        hit = np.asarray(aovs["depth"]) < 1e9
        # static camera: history accumulates everywhere except around the
        # moving box (disocclusion resets are correct behavior there)
        assert (hist[hit] >= 2.0).mean() > 0.5


def test_paired_tap_reproject_matches_reference():
    """The paired-gather bilinear history fetch (round 4) must equal a
    plain 4-gather implementation everywhere, including both screen
    edges (window-slot semantics)."""
    import jax
    import jax.numpy as jnp
    from vri_tpu.passes import frame as frame_mod

    rng = np.random.default_rng(5)
    h, w = 12, 16
    n = h * w
    data = jnp.asarray(rng.normal(size=(n, 8)).astype(np.float32))
    data = data.at[:, 7].set(jnp.asarray(
        (rng.random(n) > 0.3).astype(np.float32) * 5.0))  # counts
    # plausible normals in the history
    nrm = rng.normal(size=(n, 3)).astype(np.float32)
    nrm /= np.linalg.norm(nrm, axis=1, keepdims=True)
    data = data.at[:, 4:7].set(jnp.asarray(nrm))
    vp = jnp.eye(4, dtype=jnp.float32)
    state = frame_mod.TemporalState(data=data, view_proj=vp,
                                    eye=jnp.zeros(3, jnp.float32))
    # positions whose reprojection sweeps across and past both edges
    pos = jnp.asarray(rng.uniform(-1.4, 1.4, size=(n, 3)).astype(np.float32))
    normal = jnp.asarray(nrm[rng.integers(0, n, n)])
    valid = jnp.asarray(rng.random(n) > 0.2)

    got = frame_mod._reproject(state, pos, normal, valid, h, w)

    def reference(state, position, normal, valid, height, width,
                  depth_tol=0.02):
        clip = jnp.concatenate(
            [position, jnp.ones_like(position[:, :1])],
            axis=1) @ state.view_proj.T
        wc = clip[:, 3]
        ndc = clip[:, :3] / jnp.maximum(wc, 1e-6)[:, None]
        px = (ndc[:, 0] * 0.5 + 0.5) * width - 0.5
        py = (0.5 - ndc[:, 1] * 0.5) * height - 0.5
        x0 = jnp.floor(px).astype(jnp.int32)
        y0i = jnp.floor(py).astype(jnp.int32)
        fx = (px - x0.astype(jnp.float32))[:, None]
        fy = (py - y0i.astype(jnp.float32))[:, None]
        nq = position.shape[0]
        own_x = (jnp.arange(nq, dtype=jnp.float32) % width)
        own_y = jnp.floor(jnp.arange(nq, dtype=jnp.float32) / width)
        vel = jnp.sqrt((px - own_x) ** 2 + (py - own_y) ** 2)
        tol = depth_tol * (1.0 + 0.25 * jnp.minimum(vel, 8.0))
        t_prev = jnp.linalg.norm(position - state.eye[None, :], axis=-1)

        def tap(dy, dx):
            xi = x0 + dx
            yi = y0i + dy
            inside = ((wc > 1e-6) & (xi >= 0) & (xi < width)
                      & (yi >= 0) & (yi < height))
            idx = (jnp.clip(yi, 0, height - 1) * width
                   + jnp.clip(xi, 0, width - 1))
            hrow = state.data[idx]
            depth_ok = jnp.abs(hrow[:, 3] - t_prev) <= tol * t_prev + 1e-3
            normal_ok = jnp.sum(hrow[:, 4:7] * normal, -1) > 0.5
            ok = inside & depth_ok & normal_ok & (hrow[:, 7] > 0.0)
            wgt = ((fy if dy else 1.0 - fy)
                   * (fx if dx else 1.0 - fx))[:, 0]
            return hrow[:, 0:3], hrow[:, 7], jnp.where(ok, wgt, 0.0)

        taps = [tap(0, 0), tap(0, 1), tap(1, 0), tap(1, 1)]
        wsum = sum(t[2] for t in taps)
        scale = 1.0 / jnp.maximum(wsum, 1e-6)
        h_ind = sum(t[0] * t[2][:, None] for t in taps) * scale[:, None]
        h_count = sum(t[1] * t[2] for t in taps) * scale
        ok = valid & (wsum > 0.05)
        return (jnp.where(ok[:, None], h_ind, 0.0),
                jnp.where(ok, h_count, 0.0))

    ref = reference(state, pos, normal, valid, h, w)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(ref[0]),
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(got[1]), np.asarray(ref[1]),
                               rtol=1e-6, atol=1e-6)
